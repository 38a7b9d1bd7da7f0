"""Pallas kernel correctness vs XLA fallbacks (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kstar_tpu.ops.attention import fused_attention, reference_attention
from kstar_tpu.ops.preprocess import gather_normalize_pallas, gather_normalize_xla


class TestFusedAttention:
    @pytest.mark.parametrize("n", [22, 65])
    def test_matches_reference(self, n):
        rng = np.random.default_rng(0)
        B, H, D = 2, 3, 64
        q = jnp.asarray(rng.normal(size=(B, H, n, D)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, H, n, D)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, H, n, D)).astype(np.float32))
        scale = D ** -0.5
        ref = reference_attention(q, k, v, scale)
        got = fused_attention(q, k, v, scale, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)

    def test_fallback_on_big_shapes(self):
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(1, 1, 600, 64)).astype(np.float32))
        out = fused_attention(q, q, q, 0.125, interpret=True)
        ref = reference_attention(q, q, q, 0.125)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


class TestGatherNormalize:
    def test_matches_xla(self):
        rng = np.random.default_rng(0)
        frames = jnp.asarray(rng.integers(0, 255, (40, 16, 16, 3), dtype=np.uint8))
        starts = jnp.asarray(np.array([0, 5, 17], dtype=np.int64))
        ref = gather_normalize_xla(frames, starts, seq_len=4, out_dtype=jnp.float32)
        got = gather_normalize_pallas(frames, starts, seq_len=4,
                                      out_dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


class TestViViTWithPallas:
    def test_vivit_pallas_matches_xla(self):
        from kstar_tpu.models import ViViT

        kw = dict(image_size=32, patch_size=8, n_frames=4, dim=32, depth=1,
                  n_heads=2, d_head=16, scale_dim=2, dropout=0.0, embedd_dropout=0.0)
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 4, 32, 32, 3)).astype(np.float32))
        rngs = {"params": jax.random.key(0), "noise": jax.random.key(1),
                "dropout": jax.random.key(2)}
        m_xla = ViViT(n_classes=2, use_pallas=False, **kw)
        v = m_xla.init(rngs, x, train=False)
        out_xla = m_xla.apply(v, x, train=False)

        from jax.experimental.pallas import tpu as pltpu
        m_pl = ViViT(n_classes=2, use_pallas=True, **kw)
        with pltpu.force_tpu_interpret_mode():
            out_pl = m_pl.apply(v, x, train=False)
        np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_xla),
                                   rtol=5e-3, atol=5e-3)
