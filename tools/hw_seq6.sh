#!/bin/bash
# Round-5 sixth hardware sequence. Waits for hw_seq5, then:
#   1. prof_iter — per-iteration traversal replay of the real bench render
#      (the 2x in-loop-vs-isolated gap, ROADMAP round-5). Died twice on
#      tunnel flaps (out_hw/prof_iter.log rc=143, prof_iter2.log rc=1);
#      retry up to 2x.
#   2. full_arealights1_cam2 — fresh full-workload gate render of the
#      camera that FAILed as a Franken blend (40 accums of pre-hybrid code
#      + 60 of current; out_hw/full_arealights1.log). The new ckpt
#      provenance guard discards the stale checkpoint automatically, so a
#      clean single-code render answers noise-vs-bias for cam2.
set -u
cd /root/repo
mkdir -p out_hw

if [ -f /tmp/seq5.pid ]; then
  while kill -0 "$(cat /tmp/seq5.pid)" 2>/dev/null; do sleep 20; done
fi

step() {
  local name=$1; shift
  echo "=== seq6 $name start $(date -u +%FT%TZ) ===" | tee -a out_hw/seq6.log
  local t0=$(date +%s)
  "$@" > "out_hw/${name}.log" 2>&1
  local rc=$?
  echo "=== seq6 $name rc=$rc dt=$(( $(date +%s) - t0 ))s ===" | tee -a out_hw/seq6.log
  git add -A out_hw out_golden 2>/dev/null
  git commit -q -m "out_hw: ${name} hardware evidence (rc=$rc)" || true
  return $rc
}

step prof_iter3 timeout 2400 python tools/prof_iter.py \
  || step prof_iter4 timeout 2400 python tools/prof_iter.py

step full_arealights1_cam2 timeout 5400 \
  python -m lupinpathtracer_tpu.apps.golden_test \
  --scene arealights1 --cameras 2 --ckpt

echo "=== seq6 complete $(date -u +%FT%TZ) ===" | tee -a out_hw/seq6.log
