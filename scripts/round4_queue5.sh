#!/bin/bash
# Round 4, final training leg (v2 — after a 9-minute tunnel stall ate the
# schedule margin).  camera/laptop/table train to a 140-epoch budget so all
# three criteria-gating retrains land AND the eval window survives; round 5
# extends them to the full 200 via resume=true warm starts.  mug finishes
# its last 16 epochs (a tunnel stall killed it at ep184 and the old queue's
# exit-status bug — `grep || true` swallowing the trainer's code — marked it
# done).  Trainer output now goes straight to the log file so the exit
# status is the trainer's own.
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
  if [ ! -f "$dir/.r4q8_fresh" ]; then
    rm -rf "$dir"
    mkdir -p "$dir"
    touch "$dir/.r4q8_fresh"
  fi
}

TRAIN="python -m cppf_tpu.train.loop batch_size=2 npoint_pad=4096 resume=true"
item () {  # item <category> <max_epoch> [fresh]
  local cat=$1 me=$2 mode=$3
  [ "$mode" = fresh ] && fresh "checkpoints/$cat"
  $TRAIN category="$cat" max_epoch=$me out_dir="checkpoints/$cat" \
    >> $OUT/train_$cat.log 2>&1
  local rc=$?
  grep -E "epoch (139|199)\b" $OUT/train_$cat.log | tail -1
  return $rc
}

echo "[queue5] start $(date +%H:%M:%S)"
run_item item camera 140 fresh ; echo "QUEUE camera done $(date +%H:%M)"
run_item item laptop 140 fresh ; echo "QUEUE laptop done $(date +%H:%M)"
run_item item table 140 fresh  ; echo "QUEUE table done $(date +%H:%M)"
run_item item mug 200          ; echo "QUEUE mug done $(date +%H:%M)"
echo "QUEUE_TRAIN_DONE $(date +%H:%M)"

echo "=== round_end evals ==="
bash scripts/round_end_r4.sh 2>&1 | tee $OUT/round_end.log
echo "ROUND4_QUEUE5_DONE"
