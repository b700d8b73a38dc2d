#!/bin/bash
# Round-4 A/B: meter-scale translation-bias levers (VERDICT item 3).
# Arms isolate coplanar_halfspace and pair_balance against a no-gating
# baseline (filter_coplanar forced off everywhere so table's committed
# yaml flag doesn't confound the comparison).  Runs on the TPU (a CPU
# run of the 12 arm-category combos was measured at >10 min per combo
# on this 1-core VM); invoke only while holding the tunnel (round_end
# prepends it, or run it manually after the queue is done).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1
OUT=/tmp/ab_translation
mkdir -p $OUT
CATS=${CATS:-"table sofa bed"}
N=${N:-12}

run_arm () {
  local name=$1; shift
  echo "=== arm $name: $* [$(date +%H:%M:%S)] ==="
  python scripts/eval_checkpoints.py \
    --categories $CATS --n_poses $N \
    --set "$@" 2> $OUT/$name.err | tee $OUT/$name.json
}

run_arm base filter_coplanar=false coplanar_halfspace=false pair_balance=0.0
run_arm hs   filter_coplanar=false coplanar_halfspace=true  pair_balance=0.0
run_arm pb   filter_coplanar=false coplanar_halfspace=false pair_balance=1.0
run_arm both filter_coplanar=false coplanar_halfspace=true  pair_balance=1.0
echo AB_TRANSLATION_DONE
