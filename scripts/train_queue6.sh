#!/bin/bash
# Round 3, recovery queue: replaces queue4+queue5 after the axon relay
# (127.0.0.1:8082) died mid-bookshelf and the hung/erroring attempts burned
# their retries.  Before EVERY item, wait until the relay accepts TCP, so a
# dead tunnel parks the queue instead of consuming tries.
# Remaining items: bookshelf (resume from ep18 `last`), bathtub, then the
# queue5 accuracy retrains (bottle de-ellipticised family, mug+camera with
# aux_asym, laptop with up_rot_base).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1

wait_relay () {
  until timeout 3 bash -c 'exec 3<>/dev/tcp/127.0.0.1/8082' 2>/dev/null; do
    sleep 60
  done
  echo "[queue6] relay up at $(date +%H:%M:%S)"
}

run_item () {
  local tries=0
  wait_relay
  until "$@"; do
    tries=$((tries+1))
    echo "[queue6] item failed (try $tries): $*" >&2
    [ $tries -ge 5 ] && { echo "[queue6] giving up: $*" >&2; return 1; }
    sleep 20
    wait_relay
  done
}

fresh () {  # clear a checkpoint dir exactly once per queue
  local dir=$1
  if [ ! -f "$dir/.r3q6_fresh" ]; then
    rm -rf "$dir"
    mkdir -p "$dir"
    touch "$dir/.r3q6_fresh"
  fi
}

T="python -m cppf_tpu.train.loop batch_size=2 npoint_pad=4096 resume=true"

# NOCS accuracy retrains first (the VERDICT targets): with the tunnel out
# for 5+ h the queue may not finish, and bookshelf/bathtub have committed
# r2 fallbacks while bottle/mug/camera fixes have none.
fresh checkpoints/bottle
run_item $T category=bottle max_epoch=200 out_dir=checkpoints/bottle
fresh checkpoints/mug
run_item $T category=mug    max_epoch=200 aux_asym=true out_dir=checkpoints/mug
fresh checkpoints/camera
run_item $T category=camera max_epoch=200 aux_asym=true out_dir=checkpoints/camera
echo QUEUE6_NOCS_DONE

run_item $T category=bookshelf max_epoch=200 out_dir=checkpoints/bookshelf
# bathtub's r2 checkpoint was restored into the working tree as a fallback;
# clear it only once the relay is actually up and the item is starting
# (the 64-bin retrain can't warm start from the 32-bin r2 head) — a bare
# `fresh` before run_item would delete the fallback even while parked
bathtub_item () {
  fresh checkpoints/bathtub
  $T category=bathtub max_epoch=200 out_dir=checkpoints/bathtub
}
run_item bathtub_item
fresh checkpoints/laptop
run_item $T category=laptop max_epoch=200 up_rot_base=true out_dir=checkpoints/laptop
echo QUEUE6_DONE
