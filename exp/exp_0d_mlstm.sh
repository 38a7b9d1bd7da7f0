#!/bin/bash
# 0D MLSTM-FCN sweep over prediction distance x seeds
# (mirrors reference exp/exp_0D_mlstm.sh: dist in {1..5,8,12,20}, seeds 40-43)
for dist in 1 2 3 4 5 8 12 20; do
  for seed in 40 41 42 43; do
    python -m kstar_tpu.cli.train_0d --model MLSTM_FCN --dist $dist \
      --random_seed $seed --use_sampling --use_DRW --loss_type Focal "$@"
  done
done
