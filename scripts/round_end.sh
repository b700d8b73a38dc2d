#!/bin/bash
# End-of-round evaluation sequence (run AFTER the training queues finish —
# one TPU client at a time).  Produces:
#   /tmp/round_end/eval_checkpoints.json   per-category pose-error medians
#   /tmp/round_end/synth_nocs_<cat>.log    multi-category NOCS mAP benchmark
#   /tmp/round_end/synth_sunrgbd_<cat>.log SUN RGB-D synthetic mAP (all 6)
#   /tmp/round_end/zero_shot.log (+ png)   zero-shot on the real demo frame
#   /tmp/round_end/bench_categories.json   per-category ms/pose table
#   /tmp/round_end/bench.json              bench.py JSON line
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1
OUT=/tmp/round_end
mkdir -p $OUT

echo "=== translation-bias A/B (coplanar_halfspace / pair_balance) ==="
bash scripts/ab_translation.sh 2>&1 | tee $OUT/ab_translation.log

echo "=== eval_checkpoints ==="
python scripts/eval_checkpoints.py --n_poses 12 \
  2> $OUT/eval_checkpoints.err | tee $OUT/eval_checkpoints.json

echo "=== synthetic NOCS benchmark (multi-category) ==="
python scripts/synthetic_benchmark.py --category bottle,bowl,can,mug,camera \
  --n_frames 20 --out_dir /tmp/synth_bench_multi \
  > $OUT/synth_nocs.log 2>&1
tail -25 $OUT/synth_nocs.log

echo "=== synthetic SUN RGB-D benchmark (all six) ==="
for c in table chair bed sofa bookshelf bathtub; do
  python scripts/sunrgbd_synthetic_benchmark.py --category $c --n_scans 10 \
    --out_dir /tmp/sunrgbd_synth_$c > $OUT/synth_sunrgbd_$c.log 2>&1 || true
  tail -6 $OUT/synth_sunrgbd_$c.log
done

echo "=== zero-shot on the real demo frame ==="
python -m cppf_tpu.eval.zero_shot --ckpt checkpoints/bowl_reg \
  --out $OUT/zero_shot_vis.png > $OUT/zero_shot.log 2>&1
tail -10 $OUT/zero_shot.log

echo "=== per-category pipeline timing ==="
python scripts/bench_categories.py 2> $OUT/bench_categories.err \
  | tee $OUT/bench_categories.json

echo "=== bench.py ==="
python bench.py 2> $OUT/bench.err | tee $OUT/bench.json

echo ROUND_END_DONE
