#!/bin/bash
# Round-5 end sequence, phase 1b: the REAL loss-vs-decode head-to-head.
# Phase 1 (round5_end.sh) compared params_best vs best_decode — but under
# decode-val selection the train loop saves params_best ON the decode score
# (train/loop.py:246-249), so those two arms are the same weights.  The
# loss-selected state is the `best/` train state: load it with --name best.
# Also runs the phase-1 items the session boundary cut off (prod rows,
# pair_sep A/B).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1
OUT=/tmp/r5_end
mkdir -p $OUT

P=/tmp/r5_promote
mkdir -p $P
ln -sfn /root/repo/checkpoints/bookshelf_r5 $P/bookshelf
ln -sfn /root/repo/checkpoints/bathtub_r5 $P/bathtub
ln -sfn /root/repo/checkpoints/table_r5desk $P/table
ln -sfn /root/repo/checkpoints/mug_r5boost $P/mug
ln -sfn /root/repo/checkpoints/camera_r5boost $P/camera

ev () { # name, extra args...
  local name=$1; shift
  echo "=== $name [$(date +%H:%M:%S)] ==="
  timeout 2400 python scripts/eval_checkpoints.py --n_poses 12 "$@" \
    2> $OUT/$name.err | tee $OUT/$name.json | tail -3
}

# 1. the loss-selected arm of every r5 experiment run (decode arm =
#    the already-captured h2h_<cat>_loss/decode files, which both loaded
#    the decode-selected params_best)
for cat in bookshelf bathtub table mug camera; do
  d=$(readlink $P/$cat)
  [ -d "$d/best" ] || { echo "--- $cat: no best state, skip"; continue; }
  ev h2h_${cat}_lossTRUE --categories $cat --ckpt_path $P --name best
done

# 2. missing production rows of the f32 record
ev prod_bookshelf --categories bookshelf
ev prod_bathtub   --categories bathtub

# 3. pair_sep_power A/B on the furniture categories
for a in 1 2; do
  ev ab_pair_sep${a} --categories table bed sofa --set pair_sep_power=$a
done

echo R5_END_PHASE1B_DONE
