#!/bin/bash
# Round-5 end sequence, phase 2 (run AFTER phase 1's head-to-head arms and
# the manual promotions — one TPU client at a time).  Re-measures every
# record row that the r5 retrains / promotions invalidated, plus the
# round's two still-unmeasured deliverables:
#   /tmp/r5_end/zs_map.log           zero-shot NOCS mAP (VERDICT r4 item 8 —
#                                    the TPU measurement the plumbing test
#                                    deferred), clean + clutter arms
#   /tmp/r5_end/synth_nocs_r5.log    synth NOCS mAP re-run for the promoted
#                                    right-axis retrains (mug, camera)
#   /tmp/r5_end/synth_sun_<cat>.log  SUN synthetic mAP for the categories
#                                    whose record rows were missing or
#                                    whose weights changed
#   /tmp/r5_end/bench.json           final bench.py capture for BENCH.md
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1
OUT=/tmp/r5_end
mkdir -p $OUT

echo "=== zero-shot NOCS mAP (clean) [$(date +%H:%M:%S)] ==="
timeout 2400 python scripts/zero_shot_benchmark.py --n_frames 8 --instances 2 \
  --out_dir /tmp/zs_bench_clean > $OUT/zs_map.log 2>&1
tail -8 $OUT/zs_map.log

echo "=== zero-shot NOCS mAP (clutter) [$(date +%H:%M:%S)] ==="
timeout 2400 python scripts/zero_shot_benchmark.py --n_frames 8 --instances 2 \
  --clutter 1 --out_dir /tmp/zs_bench_clutter >> $OUT/zs_map.log 2>&1
tail -8 $OUT/zs_map.log

# (the planned synth NOCS mug/camera re-run was dropped: neither boost
# retrain was promoted, so the committed record rows still measure the
# production weights)

echo "=== SUN synthetic mAP: missing/changed rows [$(date +%H:%M:%S)] ==="
for c in bookshelf bathtub table; do
  timeout 2400 python scripts/sunrgbd_synthetic_benchmark.py --category $c \
    --n_scans 8 --out_dir /tmp/sunrgbd_synth_r5_$c \
    > $OUT/synth_sun_$c.log 2>&1 || true
  tail -5 $OUT/synth_sun_$c.log
done

echo "=== bench.py [$(date +%H:%M:%S)] ==="
python bench.py 2> $OUT/bench.err | tee $OUT/bench.json

echo R5_END_PHASE2_DONE
