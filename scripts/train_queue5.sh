#!/bin/bash
# Round 3, queue 3: accuracy fixes found after the queue3 evals.
# - bottle: retrain on the de-ellipticised family (compose.py flask squash
#   0.45-0.85 -> 0.9-0.98): up_sym training on strongly elliptic bodies makes
#   the tr/scale targets azimuth-ambiguous from SE(3)-invariant features
#   (measured: 43 mm T / 45 % scale on the first compositional family).
# - mug: retrain with the radial-asymmetry-weighted right aux bit
#   (cfg.aux_asym; core/targets.py::radial_asymmetry) so only
#   symmetry-breaking handle geometry teaches the bit.
# Waits for queue4 (SUN) so the TPU tunnel stays single-client.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1

until grep -q QUEUE4_DONE /tmp/queue4.log 2>/dev/null; do
  kill -0 "$(cat /tmp/queue4.pid 2>/dev/null)" 2>/dev/null || break
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

fresh () {  # clear a checkpoint dir exactly once per queue
  local dir=$1
  if [ ! -f "$dir/.r3q5_fresh" ]; then
    rm -rf "$dir"
    mkdir -p "$dir"
    touch "$dir/.r3q5_fresh"
  fi
}

T="python -m cppf_tpu.train.loop batch_size=2 npoint_pad=4096 resume=true"

fresh checkpoints/bottle
fresh checkpoints/mug
fresh checkpoints/camera
fresh checkpoints/laptop

run_item $T category=bottle max_epoch=200 out_dir=checkpoints/bottle
run_item $T category=mug    max_epoch=200 aux_asym=true out_dir=checkpoints/mug
run_item $T category=camera max_epoch=200 aux_asym=true out_dir=checkpoints/camera
# up-angle KL weighted by base membership (hinge-ambiguous lid pairs muted)
run_item $T category=laptop max_epoch=200 up_rot_base=true out_dir=checkpoints/laptop
echo QUEUE5_DONE
