#!/bin/bash
# Round 2, phase 2: the six SUN RGB-D furniture categories to the reference
# 200-epoch budget (reference sunrgbd/inference.py:33 protocol needs
# per-category models; primitive families in cppf_tpu/data/synthetic.py).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1

run_item () {
  local tries=0
  until "$@"; do
    tries=$((tries+1))
    echo "[queue] item failed (try $tries): $*" >&2
    [ $tries -ge 3 ] && { echo "[queue] giving up: $*" >&2; return 1; }
    sleep 20
  done
}

T="python -m cppf_tpu.train.loop batch_size=2 npoint_pad=4096 resume=true"
run_item $T category=table     max_epoch=200 out_dir=checkpoints/table
run_item $T category=chair     max_epoch=200 out_dir=checkpoints/chair
run_item $T category=bed       max_epoch=200 out_dir=checkpoints/bed
run_item $T category=sofa      max_epoch=200 out_dir=checkpoints/sofa
run_item $T category=bookshelf max_epoch=200 out_dir=checkpoints/bookshelf
run_item $T category=bathtub   max_epoch=200 out_dir=checkpoints/bathtub
# laptop-aux segmenter to the full reference budget: 20 epochs over all 458
# laptop models at bs16 (reference config/laptop_aux.yaml + dataset __len__ =
# len(model_names), utils/dataset.py:277-278); round-1 run was a CPU smoke budget
run_item python -m cppf_tpu.train.laptop_aux max_epoch=20 batch_size=16 epoch_len=458 out_dir=checkpoints/laptop_aux
echo QUEUE2_DONE
