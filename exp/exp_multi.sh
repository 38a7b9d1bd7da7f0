#!/bin/bash
# multimodal configs: seq_len 84 tau 1 / seq_len 21 tau 4 (mirrors reference exp/exp_multi.sh)
python -m kstar_tpu.cli.train_multimodal --model_type concat --use_GB --seq_len 84 --tau 1 "$@"
python -m kstar_tpu.cli.train_multimodal --model_type concat --use_GB --seq_len 21 --tau 4 "$@"
python -m kstar_tpu.cli.train_multimodal --model_type TFN --use_GB --seq_len 21 --tau 4 "$@"
