"""Real-time continuous prediction + GIF CLI (rebuild of reference
make_continuous_prediction.py): load trained video + 0D checkpoints, sweep
one whole shot, and render the side-by-side camera/probability animation.

Usage:
    python -m kstar_tpu.cli.make_continuous_prediction --synthetic --shot 30009
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    from .common import add_common_args

    p = argparse.ArgumentParser(description="continuous disruption prediction demo")
    p.add_argument("--shot", type=int, default=21310)
    p.add_argument("--video_tag", type=str, default=None,
                   help="checkpoint tag of the trained ViViT (optional)")
    p.add_argument("--ts_tag", type=str, default=None,
                   help="checkpoint tag of the trained 0D Transformer (optional)")
    add_common_args(p, batch_size=64)
    p.add_argument("--image_size", type=int, default=128)
    p.add_argument("--patch_size", type=int, default=16)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--depth", type=int, default=2)
    p.add_argument("--n_heads", type=int, default=4)
    p.add_argument("--d_head", type=int, default=64)
    p.add_argument("--scale_dim", type=int, default=8)
    p.add_argument("--feature_dims", type=int, default=128)
    p.add_argument("--gif", action="store_true", default=True)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..config import DT_0D, OptimConfig, Schema, TransformerConfig, ViViTConfig
    from ..data.splits import Scaler
    from ..infer import alarm_times, predict_0d_shot, predict_video_shot, warning_time
    from ..models import build_0d_model, build_video_model
    from ..train import create_train_state, load_checkpoint
    from ..viz import plot_shot_probability, render_realtime_gif
    from .common import load_data

    disrupt_df, ts_df, store = load_data(args, need_video=True, dt=DT_0D)
    shot = args.shot if args.shot in store.arrays else sorted(store.arrays)[-1]
    row = disrupt_df[disrupt_df.shot == shot].iloc[0]
    frames = np.asarray(store.arrays[shot])
    cols = Schema.INPUT_FEATURES

    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    crop = min(args.image_size, frames.shape[1])

    # --- video model sweep ---------------------------------------------------
    vcfg = ViViTConfig(image_size=crop, patch_size=min(args.patch_size, crop // 4),
                       n_frames=args.seq_len, dim=args.dim, depth=args.depth,
                       n_heads=args.n_heads, d_head=args.d_head,
                       scale_dim=args.scale_dim)
    vmodel = build_video_model("ViViT", vcfg, dtype=dtype)
    x0 = jnp.zeros((1, args.seq_len, crop, crop, 3), dtype)
    vstate = create_train_state(vmodel, x0, jax.random.key(0), OptimConfig())
    if args.video_tag:
        vstate = load_checkpoint(vstate, os.path.join(args.weight_dir, f"{args.video_tag}_best.ckpt"))

    t_vid, p_vid = predict_video_shot(
        vmodel, vstate.params, vstate.batch_stats, frames,
        int(row.frame_startup), int(row.frame_cutoff), seq_len=args.seq_len,
        dist=args.dist, crop_size=crop, batch_size=args.batch_size,
        compute_dtype=dtype)

    t_alarm = alarm_times(t_vid, p_vid, args.threshold,
                          min_dwell_s=args.alarm_dwell_s)
    t_warn = warning_time(t_alarm, float(row.tipminf))
    print(f"shot {shot} | video alarm at {t_alarm} s | warning margin "
          f"{t_warn if t_warn is None else round(t_warn, 4)} s")

    # --- 0D model sweep (skipped on video-only datasets: load_data returns
    # ts_df=None when no 0D csv exists) -----------------------------------
    d = ts_df[ts_df.shot == shot] if ts_df is not None else None
    if d is not None and len(d) > args.seq_len + args.dist + 1:
        tcfg = TransformerConfig(n_features=len(cols), feature_dims=args.feature_dims,
                                 max_len=args.seq_len)
        tmodel = build_0d_model("Transformer", tcfg, dtype=dtype)
        ts0 = jnp.zeros((1, args.seq_len, len(cols)), jnp.float32)
        tstate = create_train_state(tmodel, ts0, jax.random.key(0), OptimConfig())
        if args.ts_tag:
            tstate = load_checkpoint(tstate, os.path.join(args.weight_dir, f"{args.ts_tag}_best.ckpt"))

        t_0d, p_0d = predict_0d_shot(
            tmodel, tstate.params, tstate.batch_stats,
            d[cols].to_numpy(np.float32), d["time"].to_numpy(),
            Scaler(args.scaler), seq_len=args.seq_len, dist=args.dist, dt=DT_0D)
        plot_shot_probability(d, t_0d, p_0d, shot, float(row.tftsrt),
                              float(row.tTQend), float(row.tipminf),
                              save_path=os.path.join(args.save_dir, f"prob_0D_{shot}.png"))
        if args.gif:
            # 0D real-time animation (reference generate_real_time_experiment_0D,
            # src/visualization/visualize_application.py:354-527)
            render_realtime_gif(
                frames, t_0d, p_0d, shot, float(row.tipminf),
                save_path=os.path.join(
                    args.save_dir, f"real_time_disruption_prediction_0D_{shot}.gif"))

    # --- figures + GIF -------------------------------------------------------
    os.makedirs(args.save_dir, exist_ok=True)
    if d is not None and len(d):
        plot_shot_probability(d, t_vid, p_vid, shot, float(row.tftsrt),
                              float(row.tTQend), float(row.tipminf),
                              save_path=os.path.join(args.save_dir, f"prob_video_{shot}.png"))
    else:
        from ..viz import plot_shot_probability_zoom
        plot_shot_probability_zoom(
            t_vid, p_vid, shot, float(row.tftsrt), float(row.tTQend),
            float(row.tipminf), args.dist / 210.0,
            save_path=os.path.join(args.save_dir, f"prob_video_{shot}.png"))
    if args.gif:
        gif = render_realtime_gif(
            frames, t_vid, p_vid, shot, float(row.tipminf),
            save_path=os.path.join(args.save_dir,
                                   f"real_time_disruption_prediction_{shot}.gif"))
        print(f"wrote {gif}")


if __name__ == "__main__":
    main()
