"""XAI demo (script equivalent of the reference's analysis XAI notebooks):
Grad-CAM overlays for R(2+1)D and ViViT attention-rollout heatmaps on a
synthetic (or real) shot.

Usage:
    python analysis/xai_demo.py --synthetic
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", type=str, default="./dataset")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--save_dir", type=str, default="./results/xai")
    p.add_argument("--seq_len", type=int, default=8)
    p.add_argument("--image_size", type=int, default=64)
    args = p.parse_args(argv)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    import jax
    import jax.numpy as jnp

    from kstar_tpu.cli.common import load_data
    from kstar_tpu.models import R2Plus1DClassifier, ViViT
    from kstar_tpu.viz import gradcam_r2plus1d, overlay_cam, vivit_attention_rollout

    ns = argparse.Namespace(synthetic=args.synthetic, data_root=args.data_root,
                            random_seed=42)
    disrupt_df, ts_df, store = load_data(ns, need_video=True)
    shot = sorted(store.arrays)[0]
    row = disrupt_df[disrupt_df.shot == shot].iloc[0]
    frames = np.asarray(store.arrays[shot])
    H = min(args.image_size, frames.shape[1])
    L = args.seq_len

    # window ending right before the quench
    end = int(row.frame_tipminf)
    clip_u8 = frames[end - L:end, :H, :H, :]
    from kstar_tpu.config import PIXEL_MEAN_BGR
    clip = (clip_u8.astype(np.float32) - np.asarray(PIXEL_MEAN_BGR))[None]

    rngs = {"params": jax.random.key(0), "noise": jax.random.key(1),
            "dropout": jax.random.key(2)}
    os.makedirs(args.save_dir, exist_ok=True)

    # Grad-CAM on R(2+1)D
    r2 = R2Plus1DClassifier(image_size=H, n_frames=L, layer_sizes=(1, 1, 1, 1))
    v = r2.init(rngs, jnp.asarray(clip), train=False)
    cam = gradcam_r2plus1d(r2, v["params"], v.get("batch_stats", {}),
                           jnp.asarray(clip), target_class=0)
    t_mid = cam.shape[1] // 2
    over = overlay_cam(clip_u8[len(clip_u8) // 2], cam[0, t_mid])

    # attention rollout on ViViT
    vv = ViViT(image_size=H, patch_size=H // 4, n_frames=L, dim=32, depth=2,
               n_heads=2, d_head=16, scale_dim=2, dropout=0.0, embedd_dropout=0.0)
    vvv = vv.init(rngs, jnp.asarray(clip), train=False)
    space = vivit_attention_rollout(vv, vvv["params"], jnp.asarray(clip), "space")
    temporal = vivit_attention_rollout(vv, vvv["params"], jnp.asarray(clip), "temporal")

    fig, axes = plt.subplots(1, 4, figsize=(16, 4))
    axes[0].imshow(clip_u8[L // 2][..., ::-1]); axes[0].set_title("frame")
    axes[1].imshow(over[..., ::-1]); axes[1].set_title("Grad-CAM (R2+1D)")
    sp = space.reshape(-1, space.shape[-2], space.shape[-1])
    axes[2].imshow(sp[min(L // 2, len(sp) - 1)], cmap="inferno")
    axes[2].set_title("ViViT spatial rollout")
    axes[3].bar(range(temporal.shape[-1]), temporal[0])
    axes[3].set_title("ViViT temporal rollout")
    for ax in axes[:3]:
        ax.axis("off")
    fig.tight_layout()
    out = os.path.join(args.save_dir, f"xai_shot_{shot}.png")
    fig.savefig(out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
