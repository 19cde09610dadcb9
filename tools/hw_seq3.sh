#!/bin/bash
# Round-5 third hardware sequence. Waits for hw_seq2 (if running), then:
#   1. prof_e2e    — end-to-end pathtrace_spp sweep over the perf levers
#                    (streams / TAIL_C / Q_DIV) on the bench arealights1
#                    config — picks the defaults bench.py will ride
#   2. repro_inst  — 100k-instance sort-leg after the packed pair-kernel
#                    SMEM fix (VERDICT r4 #2 / weak #4)
# Same tunnel-flap-proof pattern as hw_autorun.sh: tee into out_hw/ and
# commit after each step.
set -u
cd /root/repo
mkdir -p out_hw

if [ -f /tmp/seq2.pid ]; then
  while kill -0 "$(cat /tmp/seq2.pid)" 2>/dev/null; do sleep 20; done
fi

step() {
  local name=$1; shift
  echo "=== seq3 $name start $(date -u +%FT%TZ) ===" | tee -a out_hw/seq3.log
  local t0=$(date +%s)
  "$@" > "out_hw/${name}.log" 2>&1
  local rc=$?
  echo "=== seq3 $name rc=$rc dt=$(( $(date +%s) - t0 ))s ===" | tee -a out_hw/seq3.log
  git add -A out_hw 2>/dev/null
  git commit -q -m "out_hw: ${name} hardware evidence (rc=$rc)" || true
}

step prof_e2e timeout 3600 python tools/prof_e2e.py
step repro_inst2 timeout 1800 python tools/repro_inst.py

echo "=== seq3 complete $(date -u +%FT%TZ) ===" | tee -a out_hw/seq3.log
