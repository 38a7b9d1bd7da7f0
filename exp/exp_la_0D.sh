#!/bin/bash
# learning-algorithm grid for 0D models (mirrors reference exp/exp_la_*.sh)
for model in Transformer CnnLSTM MLSTM_FCN; do
  for loss in CE Focal LDAM; do
    python -m kstar_tpu.cli.train_0d --model $model --loss_type $loss --use_sampling "$@"
    python -m kstar_tpu.cli.train_0d --model $model --loss_type $loss --use_DRW "$@"
  done
done
