#!/bin/bash
# Round 3, queue 7: retrains that depend on this session's family fixes.
# Waits for queue6 (whose pid is in /tmp/queue6.pid) to exit before touching
# the TPU — only one tunnel client at a time — and for the axon relay before
# every item (dead tunnel parks the queue instead of burning retries).
#   - table: desk-variant family (+x drawer pedestal sign cue) + aux_asym;
#     r3 diagnosis: right LINE 27.9 deg but signed 78 deg (sign at chance on
#     the all-symmetric old family).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1

QPID=$(cat /tmp/queue6.pid 2>/dev/null)
if [ -n "$QPID" ]; then
  while kill -0 "$QPID" 2>/dev/null; do sleep 60; done
fi
echo "[queue7] queue6 gone at $(date +%H:%M:%S)"

wait_relay () {
  until timeout 3 bash -c 'exec 3<>/dev/tcp/127.0.0.1/8082' 2>/dev/null; do
    sleep 60
  done
  echo "[queue7] relay up at $(date +%H:%M:%S)"
}

run_item () {
  local tries=0
  wait_relay
  until "$@"; do
    tries=$((tries+1))
    echo "[queue7] item failed (try $tries): $*" >&2
    [ $tries -ge 5 ] && { echo "[queue7] giving up: $*" >&2; return 1; }
    sleep 20
    wait_relay
  done
}

fresh () {
  local dir=$1
  if [ ! -f "$dir/.r3q7_fresh" ]; then
    rm -rf "$dir"
    mkdir -p "$dir"
    touch "$dir/.r3q7_fresh"
  fi
}

T="python -m cppf_tpu.train.loop batch_size=2 npoint_pad=4096 resume=true"

table_item () {
  fresh checkpoints/table
  $T category=table max_epoch=200 out_dir=checkpoints/table
}
run_item table_item
echo QUEUE7_DONE
