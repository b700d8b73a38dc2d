#!/bin/bash
# Sequential training queue with per-item retry (transient TPU-client errors).
# Round 2: parameter-randomised primitive families; all six NOCS categories
# to the reference 200-epoch budget (resumed models extend past their round-1
# epoch count), plus the regression model for zero-shot.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1

run_item () {
  local tries=0
  until "$@"; do
    tries=$((tries+1))
    echo "[queue] item failed (try $tries): $*" >&2
    [ $tries -ge 3 ] && { echo "[queue] giving up: $*" >&2; return 1; }
    sleep 20
  done
}

T="python -m cppf_tpu.train.loop batch_size=2 npoint_pad=4096 resume=true"
run_item $T category=bottle max_epoch=200 out_dir=checkpoints/bottle
run_item $T category=bowl   max_epoch=220 cls_bins=false out_dir=checkpoints/bowl_reg
run_item $T category=camera max_epoch=200 out_dir=checkpoints/camera
run_item $T category=laptop max_epoch=200 out_dir=checkpoints/laptop
run_item $T category=mug    max_epoch=200 out_dir=checkpoints/mug
run_item $T category=can    max_epoch=200 out_dir=checkpoints/can
run_item $T category=bowl   max_epoch=280 out_dir=checkpoints/bowl
echo QUEUE_DONE
