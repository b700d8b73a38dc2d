#!/bin/bash
# Round 4, final training leg: exactly camera -> laptop -> table (the three
# remaining retrains that gate round-4 criteria), then the round-end evals.
# No deadline logic: the item list IS the budget (bookshelf/bathtub are
# deliberately absent — they resume in round 5; an honest PARTIAL row beats
# losing the eval window, and a deadline check could mis-skip table if an
# earlier item ran slow).
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
item () {
  local cat=$1 mode=$2
  [ "$mode" = fresh ] && fresh "checkpoints/$cat"
  $TRAIN category="$cat" max_epoch=200 out_dir="checkpoints/$cat" \
    2>&1 | tee -a $OUT/train_$cat.log | grep -E "epoch (0|19|39|59|79|99|119|139|159|179|199)\b|resumed|warm|ERROR|Error" || true
}

echo "[queue4] start $(date +%H:%M:%S)"
run_item item camera fresh   ; echo "QUEUE camera done $(date +%H:%M)"
run_item item laptop fresh   ; echo "QUEUE laptop done $(date +%H:%M)"
run_item item table fresh    ; echo "QUEUE table done $(date +%H:%M)"
echo "QUEUE_TRAIN_DONE $(date +%H:%M)"

echo "=== round_end evals ==="
bash scripts/round_end_r4.sh 2>&1 | tee $OUT/round_end.log
echo "ROUND4_QUEUE4_DONE"
