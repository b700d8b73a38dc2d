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

# sofa: up 23.8 deg is the weakest non-overridden up axis in the f32 record
# (other furniture sits at ~5 deg); T 208 mm.  An independent draw under
# decode-val selection is the only untried lever (r4 taught that draw
# variance dominates at this margin).
[ -z "$SKIP_SOFA" ] && \
  run sofa_r5 category=sofa out_dir=checkpoints/sofa_r5 seed=1 resume=true

# bookshelf: the r5 retrain decodes up at 25-40 deg with large swings
# between adjacent checkpoints (decode_metrics.jsonl) — another draw may
# land a stable-up state.
[ -z "$SKIP_BOOKSHELF" ] && \
  run bookshelf_r5b category=bookshelf out_dir=checkpoints/bookshelf_r5b \
      seed=1 resume=true

echo R5_BUFFER_DONE
