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
