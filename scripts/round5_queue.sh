#!/bin/bash
# Round-5 training queue (run while holding the TPU tunnel; launch AFTER the
# f32 eval record — VERDICT r4 item 1 gates).  Every run trains with the
# decode-quality validation selection (decode_val_every=10 via
# configs/default.yaml) — the r4 guardrail.
#
# SAFETY (ADVICE r4 medium #1): this script NEVER deletes a production
# checkpoint directory.  Fresh retrains land in *_r5* experiment dirs and
# are promoted manually after head-to-head eval against the committed
# production weights; only bookshelf resumes in place (params-only warm
# start from its committed ep18 params_best).
#
# Order (VERDICT r4 items 3+4): bookshelf resume -> bathtub 64-bin ->
# table desk-variant -> mug boost=5 -> camera boost=5.
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

# 1. bookshelf: FRESH retrain at the repo 64-bin config -> experiment dir.
#    (The interrupted r3 ep18 params_best turned out to have no array
#    payload in git — unreadable; the complete r2-era 200-epoch 32-bin
#    checkpoint is restored as the production fallback meanwhile.)
run bookshelf_r5 category=bookshelf out_dir=checkpoints/bookshelf_r5 resume=true

# 2. bathtub at the repo config's 64 tr bins (production is a stale 32-bin
#    head) -> experiment dir, promote after eval.
run bathtub_r5 category=bathtub out_dir=checkpoints/bathtub_r5 resume=true

# 3. table desk-variant fresh retrain (production is the restored r3
#    pre-desk-variant fallback).  right_aux_boost=5: desks carry a
#    geometric sign cue and r4 showed the 0.7-of-9.0 BCE starves.
run table_r5desk category=table out_dir=checkpoints/table_r5desk \
    right_aux_boost=5 resume=true

# 4+5. mug/camera right-axis sign campaign (VERDICT item 4) under decode
#      selection.
run mug_r5boost category=mug out_dir=checkpoints/mug_r5boost \
    right_aux_boost=5 resume=true
run camera_r5boost category=camera out_dir=checkpoints/camera_r5boost \
    right_aux_boost=5 resume=true

echo R5_QUEUE_DONE
