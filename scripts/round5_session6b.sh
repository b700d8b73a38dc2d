#!/bin/bash
# Round-5 session-6 orchestrator, part 2 (after the anchor_t landing —
# commit f52a294).  Single TPU client; order is evidence-first:
#
# Phase D — the anchor's measurement record:
#   D1 zero-shot NOCS mAP clean+clutter re-run (anchor is default-on in the
#      zero-shot path; the pre-anchor rows were IoU@25 2.8/0.0 with pose
#      AP@15 100 — the anchor targets exactly that gap)
#   D2 per-category anchor_t=true eval arms against the committed f32
#      record rows (same protocol/seed) — decides which category yamls
#      enable the flag
# Phase B — buffer seed re-rolls (sofa resumes where the pause left it)
# Phase C — head-to-head arms of the re-rolls at eval seeds 0 and 1
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1
OUT=/tmp/r5_s6
mkdir -p $OUT

echo "=== PHASE D1: zero-shot mAP with anchor, clean [$(date +%H:%M:%S)] ==="
timeout 3000 python scripts/zero_shot_benchmark.py --n_frames 8 --instances 2 \
  --out_dir /tmp/zs_bench_anchor_clean > $OUT/zs_anchor_clean.log 2>&1
tail -3 $OUT/zs_anchor_clean.log

echo "=== PHASE D1: zero-shot mAP with anchor, clutter [$(date +%H:%M:%S)] ==="
timeout 3000 python scripts/zero_shot_benchmark.py --n_frames 8 --instances 2 \
  --clutter 1 --out_dir /tmp/zs_bench_anchor_clutter > $OUT/zs_anchor_clutter.log 2>&1
tail -3 $OUT/zs_anchor_clutter.log

ev () { # name, extra args...
  local name=$1; shift
  echo "=== $name [$(date +%H:%M:%S)] ==="
  timeout 2400 python scripts/eval_checkpoints.py --n_poses 12 "$@" \
    2> $OUT/$name.err | tee $OUT/$name.json | tail -3
}

echo "=== PHASE D2: anchor_t eval arms [$(date +%H:%M:%S)] ==="
for cat in table bed sofa chair bookshelf bathtub mug camera bottle; do
  ev anchor_${cat} --categories $cat --set anchor_t=true
done

echo "=== PHASE B: buffer re-rolls [$(date +%H:%M:%S)] ==="
RUN_TIMEOUT_S=8400 bash scripts/round5_buffer.sh 2>&1 | tee $OUT/buffer.log

echo "=== PHASE C: head-to-head arms [$(date +%H:%M:%S)] ==="
P=/tmp/r5b_promote
rm -rf $P && mkdir -p $P
ln -sfn /root/repo/checkpoints/sofa_r5 $P/sofa
ln -sfn /root/repo/checkpoints/table_r5desk2 $P/table
ln -sfn /root/repo/checkpoints/bookshelf_r5b $P/bookshelf

for cat in sofa table bookshelf; do
  d=$(readlink $P/$cat)
  [ -d "$d/params_best" ] || { echo "--- $cat: no params_best, skip"; continue; }
  ev h2h_${cat}_r5b_s0 --categories $cat --ckpt_path $P --seed 0
  ev h2h_${cat}_r5b_s1 --categories $cat --ckpt_path $P --seed 1
  ev prod_${cat}_s1 --categories $cat --seed 1
done

echo R5_S6B_DONE
