#!/bin/bash
# Round-5 fourth hardware sequence. Waits for hw_seq3, then:
#   1. prof_iter — per-iteration replay of the REAL bench render: which
#      iterations cost 2x the isolated closest_hit (prof_glue: 52.8 ms
#      in-loop vs 26.7 isolated) + WF knob sweep on the worst state.
set -u
cd /root/repo
mkdir -p out_hw

if [ -f /tmp/seq3.pid ]; then
  while kill -0 "$(cat /tmp/seq3.pid)" 2>/dev/null; do sleep 20; done
fi

step() {
  local name=$1; shift
  echo "=== seq4 $name start $(date -u +%FT%TZ) ===" | tee -a out_hw/seq4.log
  local t0=$(date +%s)
  "$@" > "out_hw/${name}.log" 2>&1
  local rc=$?
  echo "=== seq4 $name rc=$rc dt=$(( $(date +%s) - t0 ))s ===" | tee -a out_hw/seq4.log
  git add -A out_hw 2>/dev/null
  git commit -q -m "out_hw: ${name} hardware evidence (rc=$rc)" || true
}

step prof_iter2 timeout 3600 python tools/prof_iter.py

echo "=== seq4 complete $(date -u +%FT%TZ) ===" | tee -a out_hw/seq4.log
