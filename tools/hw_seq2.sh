#!/bin/bash
# Round-5 second hardware-validation sequence. Waits for prof_iter (if
# running), then validates this session's fixes on the chip, tees into
# out_hw/ and commits after each step (tunnel-flap-proof, same pattern as
# hw_autorun.sh):
#   1. repro_inst    — instanced-100k top-kernel vmem_limit raise
#   2. prof_stream   — TL_STREAM after the 1-D refs SMEM fix
#   3. render_terrain— 2M-tri full-res render after light-pdf chunking +
#                      renderer auto-tiling (the 34 GB OOM fix)
#   4. noise_floor   — arealights1 cam1 seed-pair self-ds4 (VERDICT r4 #5)
set -u
cd /root/repo
mkdir -p out_hw

if [ -f /tmp/prof_iter.pid ]; then
  while kill -0 "$(cat /tmp/prof_iter.pid)" 2>/dev/null; do sleep 20; done
fi

step() {
  local name=$1; shift
  echo "=== seq2 $name start $(date -u +%FT%TZ) ===" | tee -a out_hw/seq2.log
  local t0=$(date +%s)
  "$@" > "out_hw/${name}.log" 2>&1
  local rc=$?
  echo "=== seq2 $name rc=$rc dt=$(( $(date +%s) - t0 ))s ===" | tee -a out_hw/seq2.log
  git add -A out_hw 2>/dev/null
  git commit -q -m "out_hw: ${name} hardware evidence (rc=$rc)" || true
}

step repro_inst timeout 1800 python tools/repro_inst.py
step prof_stream2 timeout 3000 python tools/prof_stream.py
step terrain_render2 timeout 3600 python tools/render_terrain.py
step noise_floor timeout 5400 python tools/noise_floor.py arealights1 1 1000

echo "=== seq2 complete $(date -u +%FT%TZ) ===" | tee -a out_hw/seq2.log
