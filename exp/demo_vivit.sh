#!/bin/bash
# End-to-end ViViT demo on the HARD synthetic fixture (difficulty 1.0:
# gradual rotating-mode precursors, distractor flashes, heavy noise):
# train the flagship video model, then whole-shot sweeps over the test
# shots PLUS 4 non-disruptive ramp-down shots -> alarm metrics with a
# false-alarm axis + threshold trade-off + prob-curve artifacts
# (results/demo_vivit_*). The normal shots are the negative population the
# round-3 verdict asked for: detection_rate alone cannot show false alarms.
#
# 6 s shots (1260 frames at 210 fps), 0.5 s prediction horizon (dist 105).
set -e
cd "$(dirname "$0")/.."

python -m kstar_tpu.cli.train_vision \
  --model ViViT \
  --synthetic --synthetic_difficulty 1.0 --synthetic_shots 20 \
  --synthetic_normal 4 --synthetic_frames 1260 \
  --seq_len 21 --dist 105 \
  --num_epoch 16 --batch_size 32 --use_sampling --steps_per_dispatch 8 \
  --image_size 64 --dim 64 --depth 2 --n_heads 4 --d_head 32 --scale_dim 4 \
  --tag demo_vivit --weight_dir ./weights --save_dir ./results "$@"
