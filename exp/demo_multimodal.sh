#!/bin/bash
# End-to-end multimodal demo on the HARD synthetic fixture (difficulty 1.0:
# gradual precursors in both modalities, distractor flashes, heavy noise),
# mirroring the ViViT demo (results/demo_vivit_*): train concat fusion with
# Gradient Blending (dynamic re-estimation), then whole-shot multimodal
# sweeps over the alarm populations -> alarm metrics + threshold/dwell
# trade-offs + the threshold x dwell operating grid
# (results/demo_multimodal_*).
#
# Round-5 populations (round-4 verdict weak #2): 17 disruptive (4 test +
# 13 eval_only) + 16 normal (4 core + 12 eval_only) shots in the sweep;
# only the 20+4 core shots can enter a split. Reference regime: 12 s
# shots, 2.5-4.0 s precursor leads, 1.5 s horizon (dist 315), 0.15 s
# dwell at the headline operating point. The lead minimum must exceed
# dist/FPS: the positive window ends dist frames before the quench, so a
# lead equal to the horizon leaves zero precursor frames inside the
# positive window (unlearnable by construction — see exp/demo_vivit.sh).
#
# Variants (artifact sets in results/, see PERFORMANCE.md "Alarm quality"):
#   (default)                         — reference pairing, disruptive-only
#                                       training: the parity baseline
#   --pair_mode aligned --tag demo_multimodal_aligned
#                                     — fixes the reference pairing shift
#                                       (dist > seq_len*tau regime)
#   --pair_mode aligned --train_with_normal --synthetic_normal 12 \
#     --tag demo_multimodal_aligned_normal
#                                     — additionally trains on normal-shot
#                                       ramp-down as negative windows (the
#                                       12 eval_only normals keep the
#                                       false-alarm population at 12+
#                                       held-out test normals)
set -e
cd "$(dirname "$0")/.."

python -m kstar_tpu.cli.train_multimodal \
  --model_type concat --use_GB --gb_dynamic \
  --synthetic --synthetic_difficulty 1.0 --synthetic_shots 20 \
  --synthetic_normal 4 --synthetic_eval_disrupt 13 \
  --synthetic_eval_normal 12 \
  --synthetic_frames 2520 --synthetic_dt 0.004761904761904762 \
  --synthetic_lead_s 2.5 4.0 \
  --seq_len 21 --tau 4 --dist 315 --alarm_dwell_s 0.15 \
  --num_epoch 16 --batch_size 32 --use_sampling --steps_per_dispatch 8 \
  --epoch_per_GB_estimate 8 --n_epochs_GB_estimate 2 \
  --image_size 64 --dim 64 --depth 2 --n_heads 4 --d_head 32 --scale_dim 4 \
  --feature_dims 64 --ts_layers 2 --ts_heads 4 --dim_feedforward 256 \
  --tag demo_multimodal --weight_dir ./weights --save_dir ./results "$@"
