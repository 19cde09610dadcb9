#!/bin/bash
# Hardware-evidence autorun (round 4 TPU-gated queue, VERDICT r3 #1/#3/#4).
#
# Run as soon as the axon TPU tunnel is up. Every step tees into out_hw/
# and commits immediately, so a tunnel flap or session death mid-pipeline
# can never erase the evidence gathered so far (the round-3 failure mode).
#
# Steps, in evidence-priority order (ADVICE r4 #4: keep in sync with the
# step calls below):
#   1. bench.py     — the driver's metric set (A/B + 5 configs)
#   2. materials2-5 — 64 spp 1/4-scale epsilon-gate (golden rows w/o evidence)
#   3. prof_packet  — packet vs sort traversal timings + hit agreement
#   4. prof_stream  — TL_STREAM mode timings
#   5. terrain2M    — scale-envelope sanity render (committed .hdr)
#   6. full-workload goldens — furnace1/arealights1/instances1/environments1
#                     at full res / 1000 samples with --ckpt resume,
#                     3 bounded passes so one scene can't starve the queue
set -u
cd /root/repo
mkdir -p out_hw

step() {
  local name=$1; shift
  if [ -e "out_hw/${name}.done" ]; then
    echo "=== step $name already done, skipping ===" | tee -a out_hw/autorun.log
    return 0
  fi
  echo "=== step $name start $(date -u +%FT%TZ): $* ===" | tee -a out_hw/autorun.log
  local t0=$(date +%s)
  "$@" > "out_hw/${name}.log" 2>&1
  local rc=$?
  echo "=== step $name rc=$rc dt=$(( $(date +%s) - t0 ))s ===" | tee -a out_hw/autorun.log
  [ $rc -eq 0 ] && touch "out_hw/${name}.done"
  git add -A out_hw out_golden GOLDENS.md 2>/dev/null
  git commit -q -m "out_hw: ${name} hardware evidence (rc=$rc)" || true
  return $rc
}

G="python -m lupinpathtracer_tpu.apps.golden_test"

# bench FIRST: BENCH_r04's numbers are the round's central deliverable
# and the tunnel flaps — harvest the highest-value artifact before the
# longer profiling/golden steps.
step bench env LUPIN_BENCH_BUDGET_S=3300 timeout 3900 python bench.py

for s in materials2 materials3 materials4 materials5; do
  step "eps_${s}" timeout 5400 $G --scene "$s" --scale 0.25 --samples 64
done

step prof_packet timeout 3000 python tools/prof_packet.py

step prof_stream timeout 3000 python tools/prof_stream.py

step terrain_render timeout 3600 python tools/render_terrain.py

# Full reference workload (1000 samples, full res). --ckpt checkpoints the
# accumulation buffer so an interrupted run resumes instead of restarting
# — so a per-step wall bound loses nothing: re-running the step continues
# from the checkpoint. Bound each pass so one scene can never starve the
# rest of the queue; loop the whole block so bounded steps resume.
for round in 1 2 3; do
  for s in furnace1 arealights1 instances1 environments1; do
    # No .done -> the prior pass timed out mid-scene; retry resumes from
    # the checkpoint. Completed scenes skip via their .done marker.
    step "full_${s}" timeout 7200 $G --scene "$s" --ckpt
  done
done

echo "=== autorun complete $(date -u +%FT%TZ) ===" | tee -a out_hw/autorun.log
git add -A out_hw out_golden 2>/dev/null
git commit -q -m "out_hw: autorun complete" || true
