#!/bin/bash
# Sequential training queue with per-item retry (transient TPU-client errors).
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

run_item python -m cppf_tpu.train.loop category=bowl max_epoch=200 batch_size=2 npoint_pad=4096 out_dir=checkpoints/bowl resume=true
run_item python -m cppf_tpu.train.loop category=bowl max_epoch=100 batch_size=2 npoint_pad=4096 cls_bins=false out_dir=checkpoints/bowl_reg resume=true
run_item python -m cppf_tpu.train.loop category=bottle max_epoch=120 batch_size=2 npoint_pad=4096 out_dir=checkpoints/bottle resume=true
run_item python -m cppf_tpu.train.loop category=can max_epoch=120 batch_size=2 npoint_pad=4096 out_dir=checkpoints/can resume=true
run_item python -m cppf_tpu.train.loop category=mug max_epoch=120 batch_size=2 npoint_pad=4096 out_dir=checkpoints/mug resume=true
echo QUEUE_DONE
