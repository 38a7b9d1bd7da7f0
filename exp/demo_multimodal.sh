#!/bin/bash
# End-to-end multimodal demo on the HARD synthetic fixture (difficulty 1.0:
# gradual precursors in both modalities, distractor flashes, heavy noise),
# mirroring the ViViT demo (results/demo_vivit_*): train concat fusion with
# Gradient Blending (dynamic re-estimation), then whole-shot multimodal
# sweeps over the test shots -> alarm metrics + threshold trade-off +
# prob-curve artifacts (results/demo_multimodal_*).
#
# 6 s shots (1260 frames at 210 fps), frame-rate 0D table (the reference's
# 5 ms multimodal grid), 0.5 s prediction horizon (dist 105), tau=4 temporal
# subsampling (the reference's seq_len 21 / tau 4 sweep point, exp_multi.sh).
# Variants (artifact sets in results/, see PERFORMANCE.md "Alarm quality"):
#   (default)                         — reference pairing, disruptive-only
#                                       training: the parity baseline
#   --pair_mode aligned --tag demo_multimodal_aligned
#                                     — fixes the reference pairing shift
#                                       (dist > seq_len*tau regime)
#   --pair_mode aligned --train_with_normal --synthetic_normal 12 \
#     --tag demo_multimodal_aligned_normal
#                                     — additionally trains on normal-shot
#                                       ramp-down as negative windows
set -e
cd "$(dirname "$0")/.."

python -m kstar_tpu.cli.train_multimodal \
  --model_type concat --use_GB --gb_dynamic \
  --synthetic --synthetic_difficulty 1.0 --synthetic_shots 20 \
  --synthetic_normal 4 \
  --synthetic_frames 1260 --synthetic_dt 0.004761904761904762 \
  --seq_len 21 --tau 4 --dist 105 \
  --num_epoch 16 --batch_size 32 --use_sampling --steps_per_dispatch 8 \
  --epoch_per_GB_estimate 8 --n_epochs_GB_estimate 2 \
  --image_size 64 --dim 64 --depth 2 --n_heads 4 --d_head 32 --scale_dim 4 \
  --feature_dims 64 --ts_layers 2 --ts_heads 4 --dim_feedforward 256 \
  --tag demo_multimodal --weight_dir ./weights --save_dir ./results "$@"
