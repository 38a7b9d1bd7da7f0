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


class TestChooseBlockSize:
    """Adaptive micro-batch sizing (round-4 verdict next #6): smallest k
    whose measured dispatch quantile holds the per-frame budget."""

    FPS = 210.0

    def test_picks_smallest_sustaining_k(self):
        from kstar_tpu.infer import choose_block_size
        # fixed 20 ms dispatch regardless of k (relay-RTT-dominated):
        # k/fps crosses 20 ms between k=4 (19.0 ms) and k=8 (38.1 ms)
        probed = []

        def probe(k):
            probed.append(k)
            return [0.020] * 10

        k, report = choose_block_size(probe, fps=self.FPS)
        assert k == 8
        assert probed == [1, 2, 4, 8]          # stops at first sustaining k
        assert not report[4]["sustains"] and report[8]["sustains"]
        assert report[8]["budget_s"] == pytest.approx(8 / self.FPS)

    def test_no_candidate_sustains_returns_largest(self):
        from kstar_tpu.infer import choose_block_size
        k, report = choose_block_size(lambda k: [10.0], fps=self.FPS,
                                      candidates=(1, 4, 16))
        assert k == 16
        assert not any(r["sustains"] for r in report.values())

    def test_quantile_not_median_gates(self):
        from kstar_tpu.infer import choose_block_size
        # median fast, p99 slow: k=1 budget 4.76 ms fails on the tail
        times = [0.001] * 29 + [0.030]
        k, report = choose_block_size(lambda k: times, fps=self.FPS,
                                      candidates=(1, 8))
        assert k == 8 and not report[1]["sustains"]

    def test_probe_stream_blocks_real_predictor(self):
        # tiny 0D-modality predictor: the probe factory round-trips through
        # a real StreamingPredictor and returns positive timings
        from kstar_tpu.infer import probe_stream_blocks

        class TinyModel:
            def apply(self, variables, x, train=False):
                return jnp.zeros((x.shape[0], 2), jnp.float32)

        probe = probe_stream_blocks(TinyModel(), {}, {}, seq_len=4,
                                    crop_size=8, n_probe=3, modality="0D",
                                    n_features=3)
        times = probe(2)
        assert len(times) == 3 and all(t > 0 for t in times)


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
