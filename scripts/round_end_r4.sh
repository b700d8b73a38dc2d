#!/bin/bash
# Round-4 end-of-round evaluation sequence — trimmed round_end.sh sized to
# fit a ~1 h tunnel window (round 3 lost its perf record by running out of
# clock).  Ordered by information value; each stage tees to /tmp/round_end
# so a mid-sequence cutoff still leaves everything before it on disk.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1
OUT=/tmp/round_end
mkdir -p $OUT

echo "=== translation-bias A/B (coplanar_halfspace / pair_balance) ==="
N=8 bash scripts/ab_translation.sh 2>&1 | tee $OUT/ab_translation.log

echo "=== eval_checkpoints (all 12) ==="
timeout 1500 python scripts/eval_checkpoints.py --n_poses 10 \
  2> $OUT/eval_checkpoints.err | tee $OUT/eval_checkpoints.json

echo "=== synthetic NOCS benchmark (multi-category) ==="
timeout 1200 python scripts/synthetic_benchmark.py \
  --category bottle,bowl,can,mug,camera \
  --n_frames 12 --out_dir /tmp/synth_bench_multi \
  > $OUT/synth_nocs.log 2>&1
tail -25 $OUT/synth_nocs.log

echo "=== bench.py ==="
timeout 900 python bench.py 2> $OUT/bench.err | tee $OUT/bench.json

echo "=== synthetic SUN RGB-D benchmark (A/B categories first) ==="
for c in table sofa bed chair bookshelf bathtub; do
  timeout 480 python scripts/sunrgbd_synthetic_benchmark.py --category $c \
    --n_scans 8 --out_dir /tmp/sunrgbd_synth_$c \
    > $OUT/synth_sunrgbd_$c.log 2>&1 || true
  tail -6 $OUT/synth_sunrgbd_$c.log
done

echo "=== zero-shot on the real demo frame ==="
timeout 480 python -m cppf_tpu.eval.zero_shot --ckpt checkpoints/bowl_reg \
  --out $OUT/zero_shot_vis.png > $OUT/zero_shot.log 2>&1
tail -10 $OUT/zero_shot.log

echo ROUND_END_DONE
