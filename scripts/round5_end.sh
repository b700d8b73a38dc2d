#!/bin/bash
# Round-5 end sequence, phase 1 (run AFTER round5_queue.sh prints
# R5_QUEUE_DONE — one TPU client at a time).  Produces the evidence for the
# promotion decisions:
#   /tmp/r5_end/h2h_<cat>_<arm>.json   head-to-head eval arms of the new
#                                      experiment checkpoints: best-loss
#                                      (params_best) vs decode-selected
#                                      (best_decode) — the VERDICT item-2
#                                      done-criterion measurement
#   /tmp/r5_end/prod_<cat>.json        production rows that were missing
#                                      from the r5 f32 record (bookshelf
#                                      fallback, bathtub)
#   /tmp/r5_end/ab_pair_sep_*.json     pair_sep_power A/B on the meter-scale
#                                      furniture (VERDICT item 5)
# Promotion + MANIFEST/BENCH updates + phase-2 mAP re-runs are manual.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1
OUT=/tmp/r5_end
mkdir -p $OUT

# symlink tree so CategoryRunner sees experiment dirs under the category name
P=/tmp/r5_promote
rm -rf $P && mkdir -p $P
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

# 1. head-to-head arms of every finished experiment checkpoint
for cat in bookshelf bathtub table mug camera; do
  d=$(readlink $P/$cat)
  [ -d "$d/params_best" ] || { echo "--- $cat: no params_best, skip"; continue; }
  ev h2h_${cat}_loss   --categories $cat --ckpt_path $P
  [ -d "$d/best_decode" ] && \
    ev h2h_${cat}_decode --categories $cat --ckpt_path $P --name best_decode
done

# 2. missing production rows of the f32 record (same protocol/seed as the
#    committed MANIFEST rows)
ev prod_bookshelf --categories bookshelf
ev prod_bathtub   --categories bathtub

# 3. pair_sep_power A/B on the furniture categories (base rows already in
#    BENCH.md r5 record; arm values 1 and 2)
for a in 1 2; do
  ev ab_pair_sep${a} --categories table bed sofa --set pair_sep_power=$a
done

echo R5_END_PHASE1_DONE
