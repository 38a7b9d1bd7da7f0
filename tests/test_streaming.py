"""Streaming predictor tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from kstar_tpu.infer import StreamingPredictor


class Toy(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        m = x.astype(jnp.float32).mean(axis=(1, 2, 3, 4)) / 100.0
        return jnp.stack([m, -m], axis=-1)


class Toy0D(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        m = x.mean(axis=(1, 2))
        return jnp.stack([m, -m], axis=-1)


class TestStreamingVideo:
    def test_rolls_and_alarms(self):
        model = Toy()
        v = model.init(jax.random.key(0), jnp.zeros((1, 4, 8, 8, 3)))
        sp = StreamingPredictor(model, v.get("params", {}), {}, seq_len=4,
                                crop_size=8, threshold=0.5,
                                compute_dtype=jnp.float32, fps=10.0,
                                suppress_s=0.5)
        # dark frames: low probability, no alarm
        for _ in range(6):
            p, alarm = sp.push(np.zeros((8, 8, 3), np.uint8))
            assert not alarm
        # bright frames push p over threshold after suppression window
        fired = False
        for _ in range(8):
            p, alarm = sp.push(np.full((8, 8, 3), 255, np.uint8))
            fired = fired or alarm
        assert fired and sp.alarm_time is not None

    def test_center_crop_on_push(self):
        model = Toy()
        v = model.init(jax.random.key(0), jnp.zeros((1, 4, 8, 8, 3)))
        sp = StreamingPredictor(model, v.get("params", {}), {}, seq_len=4,
                                crop_size=8, compute_dtype=jnp.float32)
        p, _ = sp.push(np.zeros((16, 16, 3), np.uint8))
        assert np.isfinite(p)

    def test_reset(self):
        model = Toy()
        v = model.init(jax.random.key(0), jnp.zeros((1, 4, 8, 8, 3)))
        sp = StreamingPredictor(model, v.get("params", {}), {}, seq_len=4,
                                crop_size=8, compute_dtype=jnp.float32)
        sp.push(np.full((8, 8, 3), 255, np.uint8))
        sp.reset()
        assert sp.n_frames_seen == 0 and sp.alarm_time is None


class TestStreaming0D:
    def test_0d_mode(self):
        model = Toy0D()
        v = model.init(jax.random.key(0), jnp.zeros((1, 4, 3)))
        sp = StreamingPredictor(model, v.get("params", {}), {}, seq_len=4,
                                modality="0D", n_features=3, fps=10.0,
                                suppress_s=0.0)
        for _ in range(10):
            p, alarm = sp.push(np.ones(3, np.float32))
        assert np.isfinite(p)


class TestMicroBatchedPush:
    """push_block(k frames) must equal k sequential push calls — values,
    alarms, and alarm_time (the micro-batched mode exists purely to
    amortize dispatch overhead, PERFORMANCE.md Streaming)."""

    def _mk(self, **kw):
        model = Toy()
        v = model.init(jax.random.key(0), jnp.zeros((1, 4, 8, 8, 3)))
        return StreamingPredictor(model, v.get("params", {}), {}, seq_len=4,
                                  crop_size=8, threshold=0.5,
                                  compute_dtype=jnp.float32, fps=10.0,
                                  suppress_s=0.5, **kw)

    def test_block_equals_sequential_video(self):
        rng = np.random.default_rng(0)
        frames = rng.integers(0, 255, size=(24, 8, 8, 3), dtype=np.uint8)
        frames[12:] = 255  # bright tail to cross threshold post-suppression

        seq = self._mk()
        seq_out = [seq.push(f) for f in frames]
        blk = self._mk(block_size=8)
        ps, al = [], []
        for i in range(0, 24, 8):
            p, a = blk.push_block(frames[i:i + 8])
            ps.append(p)
            al.append(a)
        np.testing.assert_allclose(np.concatenate(ps),
                                   [p for p, _ in seq_out], atol=1e-6)
        np.testing.assert_array_equal(np.concatenate(al),
                                      [a for _, a in seq_out])
        assert blk.alarm_time == seq.alarm_time and blk.alarm_time is not None

    def test_block_equals_sequential_0d(self):
        model = Toy0D()
        v = model.init(jax.random.key(0), jnp.zeros((1, 4, 3)))
        kw = dict(seq_len=4, modality="0D", n_features=3, fps=10.0,
                  suppress_s=0.0)
        samples = np.random.default_rng(1).random((12, 3)).astype(np.float32)

        seq = StreamingPredictor(model, v.get("params", {}), {}, **kw)
        want = [seq.push(s)[0] for s in samples]
        blk = StreamingPredictor(model, v.get("params", {}), {}, **kw)
        got = np.concatenate([blk.push_block(samples[i:i + 4])[0]
                              for i in range(0, 12, 4)])
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_block_crops_on_push(self):
        blk = self._mk(block_size=4)
        p, _ = blk.push_block(np.zeros((4, 16, 16, 3), np.uint8))
        assert np.isfinite(p).all() and p.shape == (4,)


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="real-time budget is a TPU-hardware property")
def test_streaming_budget_210fps_tpu():
    """Through this relay, micro-batched streaming must hold the 210 fps
    frame budget (4.76 ms/frame) with the flagship ViViT at k=16, or k=32
    when pool load spikes (the sizes tried below) — VERDICT r2 item 1."""
    import time

    from kstar_tpu.config import ViViTConfig
    from kstar_tpu.models import build_video_model

    model = build_video_model("ViViT", ViViTConfig(), dtype=jnp.bfloat16)
    rng = jax.random.key(0)
    x0 = jnp.zeros((1, 21, 128, 128, 3), jnp.bfloat16)
    v = model.init({"params": rng, "noise": rng, "dropout": rng}, x0,
                   train=False)
    budget_ms = 1000.0 / 210.0
    results = {}
    # relay dispatch cost varies with pool load (PERFORMANCE.md): k=16
    # holds the budget on a quiet relay, k=32 with ~1.6x margin — accept
    # the smallest block size that holds it this run
    for k in (16, 32):
        sp = StreamingPredictor(model, v["params"], v.get("batch_stats", {}),
                                seq_len=21, crop_size=128, block_size=k)
        frames = np.random.default_rng(0).integers(
            0, 255, size=(k, 128, 128, 3), dtype=np.uint8)
        sp.push_block(frames)  # compile
        per_frame = []
        for _ in range(30):
            t0 = time.perf_counter()
            sp.push_block(frames)
            per_frame.append((time.perf_counter() - t0) / k)
        results[k] = float(np.median(per_frame)) * 1e3
        if results[k] < budget_ms:
            return
    raise AssertionError(
        f"no block size held the 4.76 ms/frame budget: " +
        ", ".join(f"k={k}: p50 {v:.2f} ms" for k, v in results.items()))
