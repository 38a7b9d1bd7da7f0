"""Video + fusion model invariants on tiny shapes (CPU-runnable)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kstar_tpu.models import (TFN, MultiModalConcat, MultiModalGB,
                              R2Plus1DClassifier, SlowFast, TFNGB, ViViT)

B, T, H = 2, 8, 32

VIVIT_KW = dict(image_size=H, patch_size=8, n_frames=T, dim=32, depth=1,
                n_heads=2, d_head=16, scale_dim=2, dropout=0.0, embedd_dropout=0.0)
TS_KW = dict(n_features=6, feature_dims=32, max_len=T, n_layers=1, n_heads=4,
             dim_feedforward=32, cls_dims=16)


def _rngs():
    return {"params": jax.random.key(0), "noise": jax.random.key(1),
            "dropout": jax.random.key(2)}


@pytest.fixture
def video():
    return jnp.asarray(np.random.default_rng(0).normal(size=(B, T, H, H, 3)).astype(np.float32))


@pytest.fixture
def ts():
    return jnp.asarray(np.random.default_rng(1).normal(size=(B, T, 6)).astype(np.float32))


class TestViViT:
    def test_forward_and_encode(self, video):
        m = ViViT(n_classes=2, **VIVIT_KW)
        v = m.init(_rngs(), video, train=False)
        out = m.apply(v, video, train=False)
        assert out.shape == (B, 2)
        assert np.isfinite(np.asarray(out)).all()
        h = m.apply(v, video, method="encode")
        assert h.shape == (B, 32)

    def test_train_mode_runs(self, video):
        m = ViViT(n_classes=2, **dict(VIVIT_KW, dropout=0.1, embedd_dropout=0.1))
        v = m.init(_rngs(), video, train=False)
        out = m.apply(v, video, train=True,
                      rngs={"dropout": jax.random.key(3), "noise": jax.random.key(4)})
        assert np.isfinite(np.asarray(out)).all()


class TestR2Plus1D:
    def test_forward_and_encode(self, video):
        m = R2Plus1DClassifier(image_size=H, n_frames=T, layer_sizes=(1, 1, 1, 1))
        v = m.init(_rngs(), video, train=False)
        out, mut = m.apply(v, video, train=True, mutable=["batch_stats"],
                           rngs={"noise": jax.random.key(3), "dropout": jax.random.key(4)})
        assert out.shape == (B, 2)
        assert np.isfinite(np.asarray(out)).all()
        h = m.apply(v, video, method="encode")
        assert h.shape == (B, 128)


class TestSlowFast:
    def test_forward_and_encode(self, video):
        m = SlowFast(image_size=H, n_frames=T, layers=(1, 1, 1, 1), alpha=4)
        v = m.init(_rngs(), video, train=False)
        out = m.apply(v, video, train=False)
        assert out.shape == (B, 2)
        assert np.isfinite(np.asarray(out)).all()
        h = m.apply(v, video, method="encode")
        # slow 8*m*4 + fast 8*m/alpha*4 = 512 + 128
        assert h.shape == (B, 640)


class TestFusion:
    def test_concat(self, video, ts):
        m = MultiModalConcat(vivit_kwargs=VIVIT_KW, ts_kwargs=TS_KW)
        v = m.init(_rngs(), video, ts, train=False)
        out = m.apply(v, video, ts, train=False)
        assert out.shape == (B, 2)
        fused, h_vis, h_ts = m.apply(v, video, ts, method="encode")
        assert fused.shape[0] == B and h_vis.shape == (B, 32) and h_ts.shape == (B, 32)

    def test_gb_triple_logits(self, video, ts):
        m = MultiModalGB(vivit_kwargs=VIVIT_KW, ts_kwargs=TS_KW)
        v = m.init(_rngs(), video, ts, train=False)
        multi, vis, t = m.apply(v, video, ts, train=False)
        assert multi.shape == vis.shape == t.shape == (B, 2)
        out_v = m.apply(v, video, method="forward_video")
        out_t = m.apply(v, ts, method="forward_ts")
        assert out_v.shape == out_t.shape == (B, 2)

    def test_tfn_outer_product_dim(self, video, ts):
        m = TFN(vivit_kwargs=VIVIT_KW, ts_kwargs=TS_KW)
        v = m.init(_rngs(), video, ts, train=False)
        out = m.apply(v, video, ts, train=False)
        assert out.shape == (B, 2)
        fused, _, _ = m.apply(v, video, ts, method="encode")
        assert np.isfinite(np.asarray(fused)).all()

    def test_tfn_gb(self, video, ts):
        m = TFNGB(vivit_kwargs=VIVIT_KW, ts_kwargs=TS_KW)
        v = m.init(_rngs(), video, ts, train=False)
        multi, vis, t = m.apply(v, video, ts, train=False)
        assert multi.shape == (B, 2)
        fused, _, _ = m.apply(v, video, ts, method="encode")
        assert fused.shape == (B, 33 * 33)
