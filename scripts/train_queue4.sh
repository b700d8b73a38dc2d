#!/bin/bash
# Round 3, queue 2: SUN RGB-D retrains on the compositional families
# (cppf_tpu/data/compose.py) with the regenerated per-family stats
# (configs/category/*.yaml vote_range/scale_mean) and 64 tr bins.
# Waits for queue3 (NOCS) to finish so the TPU tunnel is free.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1

until grep -q QUEUE3_DONE /tmp/queue3.log 2>/dev/null; do
  # if queue3's process died without the marker, proceed anyway
  kill -0 "$(cat /tmp/queue3.pid 2>/dev/null)" 2>/dev/null || break
  sleep 60
done

run_item () {
  local tries=0
  until "$@"; do
    tries=$((tries+1))
    echo "[queue] item failed (try $tries): $*" >&2
    [ $tries -ge 3 ] && { echo "[queue] giving up: $*" >&2; return 1; }
    sleep 20
  done
}

fresh () {  # clear a round-2 checkpoint dir exactly once per round
  local dir=$1
  if [ ! -f "$dir/.r3_fresh" ]; then
    rm -rf "$dir"
    mkdir -p "$dir"
    touch "$dir/.r3_fresh"
  fi
}

T="python -m cppf_tpu.train.loop batch_size=2 npoint_pad=4096 resume=true"

for c in table chair bed sofa bookshelf bathtub; do fresh checkpoints/$c; done

run_item $T category=table     max_epoch=200 out_dir=checkpoints/table
run_item $T category=chair     max_epoch=200 out_dir=checkpoints/chair
run_item $T category=bed       max_epoch=200 out_dir=checkpoints/bed
run_item $T category=sofa      max_epoch=200 out_dir=checkpoints/sofa
run_item $T category=bookshelf max_epoch=200 out_dir=checkpoints/bookshelf
run_item $T category=bathtub   max_epoch=200 out_dir=checkpoints/bathtub
echo QUEUE4_DONE
