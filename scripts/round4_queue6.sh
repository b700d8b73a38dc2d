#!/bin/bash
# Round 4, final training leg v3.  The v2 leg (round4_queue5.sh) died with
# its session before starting (VM restart wiped /tmp and the local `last`
# states).  mug finishes its last 16 epochs first (params-only warm start
# from the committed ep184 snapshot — quick win), then camera/laptop/table
# retrain fresh with their r4 fix flags at a 120-epoch budget sized so the
# end-of-round eval window survives; round 5 extends to 200 via
# resume=true warm starts.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1
OUT=/tmp/round4
mkdir -p $OUT

wait_relay () {
  until timeout 3 bash -c 'exec 3<>/dev/tcp/127.0.0.1/8082' 2>/dev/null; do
    sleep 60
  done
}

run_item () {
  local tries=0
  wait_relay
  until "$@"; do
    tries=$((tries+1))
    echo "[queue] item failed (try $tries): $*" >&2
    [ $tries -ge 3 ] && { echo "[queue] giving up: $*" >&2; return 1; }
    sleep 20
    wait_relay
  done
}

fresh () {
  local dir=$1
  if [ ! -f "$dir/.r4q6_fresh" ]; then
    rm -rf "$dir"
    mkdir -p "$dir"
    touch "$dir/.r4q6_fresh"
  fi
}

TRAIN="python -m cppf_tpu.train.loop batch_size=2 npoint_pad=4096 resume=true"
item () {  # item <category> <max_epoch> [fresh]
  local cat=$1 me=$2 mode=$3
  [ "$mode" = fresh ] && fresh "checkpoints/$cat"
  $TRAIN category="$cat" max_epoch=$me out_dir="checkpoints/$cat" \
    >> $OUT/train_$cat.log 2>&1
  local rc=$?
  tail -2 $OUT/train_$cat.log
  return $rc
}

echo "[queue6] start $(date +%H:%M:%S)"
run_item item mug 200          ; echo "QUEUE mug done $(date +%H:%M)"
run_item item camera 120 fresh ; echo "QUEUE camera done $(date +%H:%M)"
run_item item laptop 120 fresh ; echo "QUEUE laptop done $(date +%H:%M)"
run_item item table 120 fresh  ; echo "QUEUE table done $(date +%H:%M)"
echo "QUEUE_TRAIN_DONE $(date +%H:%M)"
