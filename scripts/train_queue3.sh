#!/bin/bash
# Round 3: fresh 200-epoch retrains on the compositional families
# (cppf_tpu/data/compose.py) with the informativeness-weighted aux loss.
# Fresh because round-2 states are incompatible (bottle/SUN bin counts
# changed) or trained on the superseded single-template families; the dirs
# are cleared once (CLEAR_ONCE marker) so mid-queue retries resume normally.
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

fresh () {  # clear a round-2 checkpoint dir exactly once per round
  local dir=$1
  if [ ! -f "$dir/.r3_fresh" ]; then
    rm -rf "$dir"
    mkdir -p "$dir"
    touch "$dir/.r3_fresh"
  fi
}

T="python -m cppf_tpu.train.loop batch_size=2 npoint_pad=4096 resume=true"

for c in mug camera bottle laptop can bowl; do fresh checkpoints/$c; done
fresh checkpoints/bowl_reg

run_item $T category=mug    max_epoch=200 out_dir=checkpoints/mug
run_item $T category=camera max_epoch=200 out_dir=checkpoints/camera
# zero-shot regression model: depth noise + proposal-contrast checkpoint
# selection (params_zs) — the round-2 postmortem combination
run_item $T category=bowl max_epoch=220 cls_bins=false depth_noise=1.0 \
  contrast_val_every=10 out_dir=checkpoints/bowl_reg
run_item $T category=bottle max_epoch=200 out_dir=checkpoints/bottle
run_item $T category=laptop max_epoch=200 out_dir=checkpoints/laptop
run_item $T category=can    max_epoch=200 out_dir=checkpoints/can
run_item $T category=bowl   max_epoch=200 out_dir=checkpoints/bowl
echo QUEUE3_DONE
