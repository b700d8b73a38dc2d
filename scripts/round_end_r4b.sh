#!/bin/bash
# Round-4 session-3 end sequence.  Tighter than round_end_r4.sh: the final
# training leg runs first in this session, so the eval window is ~40 min.
# Ordered by information value; every stage tees to /tmp/round_end so a
# cutoff keeps everything before it.  Table's fresh desk-variant retrain is
# NOT here — it runs *after* this script as the trailing task (an in-flight
# snapshot still lands; a missing eval record does not).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1
OUT=/tmp/round_end
mkdir -p $OUT

echo "=== eval_checkpoints, r4-retrained categories [$(date +%H:%M:%S)] ==="
timeout 1500 python scripts/eval_checkpoints.py \
  --categories mug camera laptop bottle bowl --n_poses 10 \
  2> $OUT/eval_checkpoints.err | tee $OUT/eval_checkpoints.json

echo "=== camera geometric-sign A/B row [$(date +%H:%M:%S)] ==="
timeout 600 python scripts/eval_checkpoints.py \
  --categories camera --n_poses 10 --set geo_right_sign=true \
  2> $OUT/eval_camera_geo.err | tee $OUT/eval_camera_geo.json

echo "=== translation-bias A/B, sofa+bed [$(date +%H:%M:%S)] ==="
CATS="sofa bed" N=8 timeout 2400 bash scripts/ab_translation.sh \
  2>&1 | tee $OUT/ab_translation.log

echo "=== synthetic NOCS benchmark [$(date +%H:%M:%S)] ==="
timeout 1200 python scripts/synthetic_benchmark.py \
  --category bottle,bowl,can,mug,camera \
  --n_frames 10 --out_dir /tmp/synth_bench_multi \
  > $OUT/synth_nocs.log 2>&1
tail -25 $OUT/synth_nocs.log

echo ROUND_END_DONE $(date +%H:%M:%S)
