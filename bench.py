"""Headline benchmark: continuous disruption-prediction clip throughput.

Measures the north-star path (BASELINE.md): stride-1 sliding-window sweep of
the flagship ViViT over a whole synthetic shot — the reference runs this as
batch-1 Python forwards (reference visualize_application.py:248-262), this
framework as on-device batched window gathers (kstar_tpu/infer/continuous.py).

Baseline: an equivalent torch-CPU ViViT at the same shape driven exactly the
way the reference drives it (per-window host crop+normalize, batch size 1).
The number is cached in BENCH_baseline.json (measured once per machine).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np

N_FRAMES_SHOT = 4096       # synthetic shot length (frames, ~19.5 s at 210 fps)
SEQ_LEN = 21
CROP = 128
RESIZE = 256
BATCH = 128
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_baseline.json")
BASELINE_WINDOWS = 48      # batch-1 torch windows to time (extrapolated)


def _synthetic_frames(n: int) -> np.ndarray:
    rng = np.random.default_rng(0)
    return rng.integers(0, 255, size=(n, RESIZE, RESIZE, 3), dtype=np.uint8)


# ---------------------------------------------------------------------------
# torch-CPU baseline (reference-style batch-1 loop)
# ---------------------------------------------------------------------------

def measure_torch_baseline(frames: np.ndarray) -> float:
    """Reference-style inference loop: per-window host crop + normalize, one
    forward per window at batch size 1 on CPU. Returns clips/sec."""
    import torch
    import torch.nn as nn

    torch.set_num_threads(os.cpu_count() or 8)

    dim, depth, heads, d_head, scale = 128, 2, 4, 64, 8
    patch = 16
    n_tok = (CROP // patch) ** 2 + 1

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.n1 = nn.LayerNorm(dim)
            self.attn = nn.MultiheadAttention(dim, heads, batch_first=True)
            self.n2 = nn.LayerNorm(dim)
            self.ff = nn.Sequential(nn.Linear(dim, dim * scale), nn.GELU(),
                                    nn.Linear(dim * scale, dim))

        def forward(self, x):
            h = self.n1(x)
            x = x + self.attn(h, h, h, need_weights=False)[0]
            return x + self.ff(self.n2(x))

    class TorchViViT(nn.Module):
        def __init__(self):
            super().__init__()
            self.embed = nn.Linear(patch * patch * 3, dim)
            self.pos = nn.Parameter(torch.randn(1, SEQ_LEN, n_tok, dim))
            self.cls_s = nn.Parameter(torch.randn(1, 1, dim))
            self.cls_t = nn.Parameter(torch.randn(1, 1, dim))
            self.space = nn.Sequential(*[Block() for _ in range(depth)])
            self.time = nn.Sequential(*[Block() for _ in range(depth)])
            self.head = nn.Sequential(nn.Linear(dim, dim // 2), nn.LayerNorm(dim // 2),
                                      nn.ELU(), nn.Linear(dim // 2, 2))

        def forward(self, x):  # (B, T, H, W, C)
            B, T, H, W, C = x.shape
            x = x.reshape(B, T, H // patch, patch, W // patch, patch, C)
            x = x.permute(0, 1, 2, 4, 3, 5, 6).reshape(B, T, -1, patch * patch * C)
            x = self.embed(x)
            x = torch.cat([self.cls_s.expand(B, T, 1, dim).reshape(B, T, 1, dim), x], dim=2)
            x = x + self.pos[:, :T, : x.shape[2]]
            x = self.space(x.reshape(B * T, -1, dim))[:, 0].reshape(B, T, dim)
            x = torch.cat([self.cls_t.expand(B, 1, dim), x], dim=1)
            x = self.time(x)[:, 0]
            return self.head(x)

    model = TorchViViT().eval()
    mean = np.array([90.0, 98.0, 102.0], np.float32)
    y0 = RESIZE // 2 - CROP // 2

    n_warm = 4
    with torch.no_grad():
        for i in range(n_warm):
            win = frames[i + 1: i + 1 + SEQ_LEN, y0:y0 + CROP, y0:y0 + CROP].astype(np.float32) - mean
            model(torch.from_numpy(win).unsqueeze(0))
        t0 = time.perf_counter()
        for i in range(BASELINE_WINDOWS):
            win = frames[i + 1: i + 1 + SEQ_LEN, y0:y0 + CROP, y0:y0 + CROP].astype(np.float32) - mean
            model(torch.from_numpy(win).unsqueeze(0))
        elapsed = time.perf_counter() - t0
    return BASELINE_WINDOWS / elapsed


def get_baseline(frames: np.ndarray) -> float:
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            return json.load(f)["torch_cpu_clips_per_s"]
    clips_per_s = measure_torch_baseline(frames)
    with open(BASELINE_FILE, "w") as f:
        json.dump({"torch_cpu_clips_per_s": clips_per_s,
                   "config": {"model": "ViViT", "seq_len": SEQ_LEN, "crop": CROP,
                              "batch": 1, "threads": os.cpu_count()}}, f, indent=2)
    return clips_per_s


# ---------------------------------------------------------------------------
# TPU path
# ---------------------------------------------------------------------------

def measure_tpu(frames: np.ndarray) -> float:
    import jax

    # persistent compilation cache: the sweep program compiles once per
    # machine, not once per bench run
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    import jax.numpy as jnp

    from kstar_tpu.config import ViViTConfig
    from kstar_tpu.infer.continuous import VideoSweeper
    from kstar_tpu.models import build_video_model

    cfg = ViViTConfig()
    model = build_video_model("ViViT", cfg, dtype=jnp.bfloat16)
    rng = jax.random.key(0)
    x0 = jnp.zeros((1, SEQ_LEN, CROP, CROP, 3), jnp.bfloat16)
    variables = model.init({"params": rng, "noise": rng, "dropout": rng}, x0, train=False)

    sweeper = VideoSweeper(model, variables["params"], variables.get("batch_stats", {}),
                           SEQ_LEN, CROP, BATCH, jnp.bfloat16)

    n_windows = len(frames) - SEQ_LEN - 1
    starts = np.arange(n_windows, dtype=np.int64)

    # warmup: upload the shot + compile the full-shot program
    frames_dev = sweeper.upload_shot(frames)
    sweeper.sweep_device(frames_dev, starts)

    # steady state: raw frames resident in HBM (the serving scenario); each
    # sweep is ONE dispatch covering per-shot preprocessing (patch embedding
    # + spatial table) AND all windows — the honest per-shot cost. Median of 3.
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        probs = sweeper.sweep_device(frames_dev, starts)
        times.append(time.perf_counter() - t0)
    assert np.isfinite(probs).all()
    return n_windows / float(np.median(times))


def main():
    frames = _synthetic_frames(N_FRAMES_SHOT)
    baseline = get_baseline(frames)
    tpu = measure_tpu(frames)
    print(json.dumps({
        "metric": "continuous_inference_clips_per_sec",
        "value": round(tpu, 2),
        "unit": "clips/s",
        "vs_baseline": round(tpu / baseline, 2),
    }))


if __name__ == "__main__":
    main()
