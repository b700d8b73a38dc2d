#!/bin/bash
# Round 4, queue 8: lands everything queue6/queue7 parked when the axon
# relay died in round 3 (VERDICT.md "Next round" item 1).  All category
# yamls now carry the fix flags (bottle de-ellipticised family + 64 tr
# bins, mug/camera aux_asym, laptop up_rot_base, table desk-variant family
# + aux_asym + geo_right_dir=direct, bookshelf/bathtub 64-bin wide-range),
# so every item is a plain `category=X` run.  Before EVERY item, wait for
# the relay to accept TCP so a dead tunnel parks the queue instead of
# burning retries.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1

wait_relay () {
  until timeout 3 bash -c 'exec 3<>/dev/tcp/127.0.0.1/8082' 2>/dev/null; do
    sleep 60
  done
  echo "[queue8] relay up at $(date +%H:%M:%S)"
}

run_item () {
  local tries=0
  wait_relay
  until "$@"; do
    tries=$((tries+1))
    echo "[queue8] item failed (try $tries): $*" >&2
    [ $tries -ge 5 ] && { echo "[queue8] giving up: $*" >&2; return 1; }
    sleep 20
    wait_relay
  done
}

# clear a checkpoint dir exactly once per queue, and only when the relay is
# up (run inside run_item) so a parked queue never deletes a committed
# fallback state
fresh () {
  local dir=$1
  if [ ! -f "$dir/.r4q8_fresh" ]; then
    rm -rf "$dir"
    mkdir -p "$dir"
    touch "$dir/.r4q8_fresh"
  fi
}

T="python -m cppf_tpu.train.loop batch_size=2 npoint_pad=4096 resume=true"

item () {  # item <category> [fresh]
  local cat=$1 mode=$2
  [ "$mode" = fresh ] && fresh "checkpoints/$cat"
  $T category="$cat" max_epoch=200 out_dir="checkpoints/$cat"
}

# NOCS accuracy retrains first (worst models, no committed fix at all)
run_item item bottle fresh   ; echo "QUEUE8 bottle done $(date +%H:%M)"
run_item item mug fresh      ; echo "QUEUE8 mug done $(date +%H:%M)"
run_item item camera fresh   ; echo "QUEUE8 camera done $(date +%H:%M)"
run_item item laptop fresh   ; echo "QUEUE8 laptop done $(date +%H:%M)"
# table: desk-variant family for the right sign (queue7's one item)
run_item item table fresh    ; echo "QUEUE8 table done $(date +%H:%M)"
# bookshelf: resume from the ep18 `last` state (same 64-bin config)
run_item item bookshelf      ; echo "QUEUE8 bookshelf done $(date +%H:%M)"
# bathtub: committed state is the 32-bin r2 fallback; 64-bin head can't
# warm start from it -> fresh
run_item item bathtub fresh  ; echo "QUEUE8 bathtub done $(date +%H:%M)"
echo QUEUE8_DONE
