#!/bin/bash
# Round-5 second golden autorun: the remaining full-workload ledger rows
# (VERDICT r4 #4) with the round-5 hygiene fixes (VERDICT r4 #6):
#   - per-camera wall budget (--cam_budget_secs): a slow camera defers
#     (exit 2) instead of starving the queue; the retry loop resumes it
#     from its checkpoint.
#   - gate-bearing cameras only (--cameras 1,2): cam0/3+ goldens are
#     pruned upstream (.MISSING_LARGE_BLOBS) — bootstrapping self-goldens
#     burned hours of the round-4 passes without testing anything.
#   - checkpoints carry a code hash; stale ones restart (no Franken
#     blends across commits).
# Waits for the round-3 autorun pass and seq6 to finish first.
set -u
cd /root/repo
mkdir -p out_hw

for p in /tmp/r4b_autorun.pid /tmp/seq6.pid; do
  [ -f "$p" ] || continue
  while kill -0 "$(cat "$p")" 2>/dev/null; do sleep 30; done
done

# Hard deadline (epoch seconds): no NEW step starts after it, so the
# chip is free for the driver's own end-of-round bench run.
DEADLINE=${LUPIN_AUTORUN_DEADLINE:-$(( $(date +%s) + 14400 ))}

step() {
  local name=$1; shift
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "=== step $name SKIPPED (deadline) ===" | tee -a out_hw/autorun2.log
    return 0
  fi
  if [ -e "out_hw/${name}.done" ]; then
    echo "=== step $name already done, skipping ===" | tee -a out_hw/autorun2.log
    return 0
  fi
  echo "=== step $name start $(date -u +%FT%TZ): $* ===" | tee -a out_hw/autorun2.log
  local t0=$(date +%s)
  "$@" > "out_hw/${name}.log" 2>&1
  local rc=$?
  echo "=== step $name rc=$rc dt=$(( $(date +%s) - t0 ))s ===" | tee -a out_hw/autorun2.log
  [ $rc -eq 0 ] && touch "out_hw/${name}.done"
  git add -A out_hw out_golden 2>/dev/null
  git commit -q -m "out_hw: ${name} hardware evidence (rc=$rc)" || true
  return $rc
}

G="python -m lupinpathtracer_tpu.apps.golden_test"
B="--ckpt --cam_budget_secs 2400"

# The per-iteration traversal profile first: it's short and it is the
# round's top perf lead (the 2x in-loop-vs-isolated closest-hit gap).
step prof_iter5 timeout 2400 python tools/prof_iter.py

# Validate the instanced-100k SMEM/VMEM fixes, then re-bench for the
# round artifact (the driver runs bench.py itself at round end; this run
# is the committed evidence).
step repro_inst3 timeout 2400 python tools/repro_inst.py
step bench3 env LUPIN_BENCH_BUDGET_S=3300 timeout 3900 python bench.py

# Remaining full-workload rows. Two passes so deferred cameras resume.
# environments1 allows a STALE-code resume deliberately: its pre-guard
# checkpoints (cam0/cam1 complete, cam2 at 44/100) were all rendered
# after the 18:26 light-pdf fix, and every package commit since is
# winner-preserving (SMEM/VMEM layout packing, Q-round partitioning, the
# top-tree collapse — traversal pruning never drops a potential winner),
# so blending is sound; discarding them would re-render ~2 h of frames.
for round in 1 2; do
  step "full_environments1_r${round}" timeout 7200 \
    env LUPIN_CKPT_ALLOW_STALE=1 $G --scene environments1 $B
  step "full_environments2_r${round}" timeout 5400 $G --scene environments2 --cameras 1,2 $B
  step "full_shapes1_r${round}" timeout 5400 $G --scene shapes1 --cameras 1,2 $B
  step "full_features1_r${round}" timeout 5400 $G --scene features1 --cameras 1,2 $B
  step "full_materials1_r${round}" timeout 7200 $G --scene materials1 --cameras 1,2 $B
done

echo "=== autorun2 complete $(date -u +%FT%TZ) ===" | tee -a out_hw/autorun2.log
git add -A out_hw out_golden 2>/dev/null
git commit -q -m "out_hw: autorun2 complete" || true
