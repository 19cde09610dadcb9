#!/bin/bash
# Round-5 fifth hardware sequence. Waits for hw_seq4, then:
#   1. terrain_render3 — the committed 2M-tri HDR artifact (VERDICT r4
#      #3/#4). The 20:22 run produced a black frame; at current HEAD the
#      exact 960x540 dispatch renders correctly (out_hw/repro_960.log
#      mean=0.775), so re-produce the artifact.
#   2. bench2 — full bench.py with the packed pair kernel: instanced_100k
#      now passes its repro on hardware (out_hw/repro_inst2.log), so this
#      should populate all five configs.
set -u
cd /root/repo
mkdir -p out_hw

if [ -f /tmp/seq4.pid ]; then
  while kill -0 "$(cat /tmp/seq4.pid)" 2>/dev/null; do sleep 20; done
fi

step() {
  local name=$1; shift
  echo "=== seq5 $name start $(date -u +%FT%TZ) ===" | tee -a out_hw/seq5.log
  local t0=$(date +%s)
  "$@" > "out_hw/${name}.log" 2>&1
  local rc=$?
  echo "=== seq5 $name rc=$rc dt=$(( $(date +%s) - t0 ))s ===" | tee -a out_hw/seq5.log
  git add -A out_hw 2>/dev/null
  git commit -q -m "out_hw: ${name} hardware evidence (rc=$rc)" || true
}

step terrain_render3 timeout 3600 python tools/render_terrain.py
step bench2 env LUPIN_BENCH_BUDGET_S=3300 timeout 3900 python bench.py

echo "=== seq5 complete $(date -u +%FT%TZ) ===" | tee -a out_hw/seq5.log
