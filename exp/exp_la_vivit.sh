#!/bin/bash
# learning-algorithm grid: loss in {CE, Focal, LDAM} x boost in {RS, RW, DRW}
# (mirrors reference exp/exp_la_vivit.sh)
for loss in CE Focal LDAM; do
  python -m kstar_tpu.cli.train_vision --model ViViT --loss_type $loss --use_sampling "$@"
  python -m kstar_tpu.cli.train_vision --model ViViT --loss_type $loss --use_weighting "$@"
  python -m kstar_tpu.cli.train_vision --model ViViT --loss_type $loss --use_DRW "$@"
done
