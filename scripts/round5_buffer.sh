#!/bin/bash
# Round-5 buffer retrains (launch only if the wall clock allows AFTER
# round5_end.sh phase 1 — one TPU client at a time).  Seed re-rolls of the
# two weakest up-axis categories, enabled by cfg.seed: fresh independent
# training trajectories under decode-val selection, promoted only on a
# head-to-head win (same rules as round5_queue.sh — production dirs are
# never touched here).
#
# Skip either run by exporting SKIP_SOFA=1 / SKIP_BOOKSHELF=1.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1
OUT=/tmp/r5_queue
mkdir -p $OUT

run () {
  local name=$1; shift
  echo "=== $name: $* [$(date +%H:%M:%S)] ==="
  timeout ${RUN_TIMEOUT_S:-6000} python -m cppf_tpu.train.loop "$@" \
    > $OUT/$name.log 2>&1
  local rc=$?
  tail -3 $OUT/$name.log
  echo "=== $name done rc=$rc [$(date +%H:%M:%S)] ==="
}

# All re-rolls run decode-val on 10 held-out poses instead of the default
# 6: the camera h2h showed a 6-draw median is unstable for sign-sensitive
# scores (same state scored 13 deg on one draw set, 174 on another).

# sofa: up 23.8 deg is the weakest non-overridden up axis in the f32 record
# (other furniture sits at ~5 deg); T 208 mm.  An independent draw under
# decode-val selection is the only untried lever (r4 taught that draw
# variance dominates at this margin).
[ -z "$SKIP_SOFA" ] && \
  run sofa_r5 category=sofa out_dir=checkpoints/sofa_r5 seed=1 resume=true \
      decode_val_poses=10

# table: the promoted desk-variant retrain took T 315->155 mm; the VERDICT
# bar is <120.  A second independent draw is the cheapest shot at it.
# (Ordered before bookshelf: if the wall clock cuts the tail, the <120 mm
# chase matters more than a second bookshelf draw.)
[ -z "$SKIP_TABLE" ] && \
  run table_r5desk2 category=table out_dir=checkpoints/table_r5desk2 \
      right_aux_boost=5 seed=2 resume=true decode_val_poses=10

# bookshelf: the r5 retrain decodes up at 25-40 deg with large swings
# between adjacent checkpoints (decode_metrics.jsonl) — another draw may
# land a stable-up state.
[ -z "$SKIP_BOOKSHELF" ] && \
  run bookshelf_r5b category=bookshelf out_dir=checkpoints/bookshelf_r5b \
      seed=1 resume=true decode_val_poses=10

# laptop (tail slot, may be cut by the clock): voting-only up is 50.7°
# and r4's up_rot_base retrain didn't move it — but decode-val selection
# (which picks the best-decoding checkpoint along the trajectory, exactly
# what bookshelf's 8↔164° up swings needed) has never been tried on
# laptop.  Production overrides up via segmenter+RANSAC either way;
# promotion only on a head-to-head win.
[ -z "$SKIP_LAPTOP" ] && \
  run laptop_r5 category=laptop out_dir=checkpoints/laptop_r5 \
      seed=1 resume=true decode_val_poses=10

echo R5_BUFFER_DONE
