#!/bin/bash
# Round-4 trailing task: table fresh retrain on the desk-variant family
# (aux_asym + geo_right_sign/direct yaml flags).  Launched AFTER the
# end-of-round evals so it accumulates epochs until the round cutoff —
# the trainer writes params_best + metrics.jsonl + a per-epoch `last`
# state every epoch, so whatever state is on disk when the driver kills
# the session is committed by the driver and warm-starts in round 5.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1
OUT=/tmp/round4
mkdir -p $OUT

dir=checkpoints/table
if [ ! -f "$dir/.r4q6_fresh" ]; then
  rm -rf "$dir"
  mkdir -p "$dir"
  touch "$dir/.r4q6_fresh"
fi
python -m cppf_tpu.train.loop batch_size=2 npoint_pad=4096 resume=true \
  category=table max_epoch=200 out_dir=$dir >> $OUT/train_table.log 2>&1
echo "TABLE_DONE rc=$? $(date +%H:%M)"
