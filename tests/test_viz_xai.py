"""Viz/XAI smoke tests on tiny models (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kstar_tpu.models import R2Plus1DClassifier, ViViT

B, T, H = 2, 8, 32


def _rngs():
    return {"params": jax.random.key(0), "noise": jax.random.key(1),
            "dropout": jax.random.key(2)}


@pytest.fixture(scope="module")
def video():
    return jnp.asarray(np.random.default_rng(0).normal(size=(B, T, H, H, 3)).astype(np.float32))


class TestGradCAM:
    def test_cam_shape_and_range(self, video):
        from kstar_tpu.viz import gradcam_r2plus1d

        m = R2Plus1DClassifier(image_size=H, n_frames=T, layer_sizes=(1, 1, 1, 1))
        v = m.init(_rngs(), video, train=False)
        cam = gradcam_r2plus1d(m, v["params"], v.get("batch_stats", {}), video)
        assert cam.shape[0] == B and cam.shape[2:] == (H, H)
        assert np.isfinite(cam).all()
        assert cam.min() >= 0.0 and cam.max() <= 1.0 + 1e-6


class TestGuidedBackprop:
    def test_vjp_rule_masks_both_signs(self):
        """Gradient passes only where input > 0 AND upstream grad > 0
        (reference GuidedBackpropReLU, visualize_cam.py:35-54)."""
        from kstar_tpu.models.common import guided_leaky_relu

        x = jnp.asarray([-2.0, -1.0, 1.0, 2.0])
        c = jnp.asarray([1.0, -1.0, -1.0, 3.0])   # upstream gradient
        g = jax.grad(lambda x: jnp.sum(c * guided_leaky_relu(x, 0.01)))(x)
        # kept only where x>0 and c>0: the last element
        np.testing.assert_allclose(np.asarray(g), [0.0, 0.0, 0.0, 3.0])

    def test_forward_unchanged(self):
        from kstar_tpu.models.common import guided_leaky_relu
        from flax import linen as nn

        x = jnp.linspace(-3, 3, 13)
        np.testing.assert_allclose(
            np.asarray(guided_leaky_relu(x, 0.1)),
            np.asarray(nn.leaky_relu(x, negative_slope=0.1)), rtol=1e-6)

    def test_saliency_shape_and_guided_difference(self, video):
        from kstar_tpu.viz import guided_backprop_saliency

        m = R2Plus1DClassifier(image_size=H, n_frames=T, layer_sizes=(1, 1, 1, 1))
        v = m.init(_rngs(), video, train=False)
        sal = guided_backprop_saliency(m, v["params"], v.get("batch_stats", {}),
                                       video)
        assert sal.shape == (B, T, H, H)
        assert np.isfinite(sal).all()
        assert sal.min() >= 0.0 and sal.max() <= 1.0 + 1e-6

        # vanilla input gradient (no guiding) must differ — the masks bite
        def score(x):
            logits = m.apply({"params": v["params"],
                              "batch_stats": v.get("batch_stats", {})},
                             x, train=False)
            return logits[:, 0].sum()

        g = np.abs(np.asarray(jax.grad(score)(video), np.float32)).max(axis=-1)
        g = g / np.maximum(g.reshape(B, -1).max(axis=1)[:, None, None, None], 1e-8)
        assert not np.allclose(g, sal, atol=1e-3)

    def test_saliency_guided_difference_slowfast(self, video):
        """SlowFast's ReLUs route through act_relu, so the guided rule must
        bite there too (not silently return the vanilla gradient)."""
        from kstar_tpu.models import SlowFast
        from kstar_tpu.viz import guided_backprop_saliency

        m = SlowFast(image_size=H, n_frames=T, alpha=4, tau_fast=1)
        v = m.init(_rngs(), video, train=False)
        sal = guided_backprop_saliency(m, v["params"], v.get("batch_stats", {}),
                                       video)
        assert sal.shape == (B, T, H, H)
        assert np.isfinite(sal).all()

        def score(x):
            logits = m.apply({"params": v["params"],
                              "batch_stats": v.get("batch_stats", {})},
                             x, train=False)
            return logits[:, 0].sum()

        g = np.abs(np.asarray(jax.grad(score)(video), np.float32)).max(axis=-1)
        g = g / np.maximum(g.reshape(B, -1).max(axis=1)[:, None, None, None], 1e-8)
        assert not np.allclose(g, sal, atol=1e-3)

    def test_flag_restored_after_context(self):
        from kstar_tpu.models import common
        from kstar_tpu.viz import guided_backprop

        assert common.GUIDED_BACKPROP[0] is False
        with guided_backprop():
            assert common.GUIDED_BACKPROP[0] is True
        assert common.GUIDED_BACKPROP[0] is False


class TestAttentionRollout:
    def test_space_and_temporal(self, video):
        from kstar_tpu.viz import vivit_attention_rollout

        m = ViViT(image_size=H, patch_size=8, n_frames=T, dim=32, depth=2,
                  n_heads=2, d_head=16, scale_dim=2, dropout=0.0, embedd_dropout=0.0)
        v = m.init(_rngs(), video, train=False)

        space = vivit_attention_rollout(m, v["params"], video, "space")
        assert space.shape == (B * T, 1, 4, 4) or space.shape == (B, T, 4, 4)
        assert np.isfinite(space).all()

        temporal = vivit_attention_rollout(m, v["params"], video, "temporal")
        assert temporal.shape[-1] == T
        assert np.isfinite(temporal).all()


class TestLatentViz:
    def test_latent_scatter(self, tiny_dataset, tmp_path):
        from kstar_tpu.config import MLSTMFCNConfig, OptimConfig, Schema
        from kstar_tpu.data import TSDataset, prepare_0d_dataset
        from kstar_tpu.models import build_0d_model
        from kstar_tpu.train import create_train_state
        from kstar_tpu.viz import visualize_latent_space

        shots, disrupt_df, ts_df = tiny_dataset
        df_train, _, _, scaler = prepare_0d_dataset(ts_df, Schema.INPUT_FEATURES,
                                                    test_shot=None)
        ds = TSDataset(df_train, disrupt_df, Schema.INPUT_FEATURES, scaler=scaler)
        cfg = MLSTMFCNConfig(n_features=len(Schema.INPUT_FEATURES), fcn_dim=16,
                             lstm_dim=16)
        model = build_0d_model("MLSTM_FCN", cfg)
        x, _ = ds.batch(np.arange(8))
        state = create_train_state(model, jnp.asarray(x), jax.random.key(0), OptimConfig())
        fig = visualize_latent_space(model, state, ds, method="pca",
                                     save_path=str(tmp_path / "latent.png"))
        assert (tmp_path / "latent.png").exists()


class TestProbCurvePlots:
    def test_plots(self, tiny_dataset, tmp_path):
        from kstar_tpu.viz import (plot_shot_probability,
                                   plot_shot_probability_zoom, render_realtime_gif)

        shots, disrupt_df, ts_df = tiny_dataset
        s = shots[0]
        t = np.linspace(0, 1.0, 200)
        p = np.clip(np.linspace(-0.5, 1.2, 200), 0, 1)
        fig = plot_shot_probability(s.ts, t, p, s.shot, s.tftsrt, s.tTQend,
                                    s.tipminf, save_path=str(tmp_path / "prob.png"))
        assert (tmp_path / "prob.png").exists()
        plot_shot_probability_zoom(t, p, s.shot, s.tftsrt, s.tTQend, s.tipminf,
                                   0.02, save_path=str(tmp_path / "prob.png"))
        out = render_realtime_gif(s.frames[:40], t, p, s.shot, s.tipminf,
                                  save_path=str(tmp_path / "rt.gif"), max_frames=10)
        assert (tmp_path / "rt.gif").exists()


class TestRealtimeGifParity:
    """Index parity with the reference's animation subsampling loop
    (reference visualize_application.py:279-296) and fps adaptation
    (:433-440)."""

    @staticmethod
    def _reference_indices(n_probs, frame_srt, frame_end, fps):
        # verbatim transliteration of reference visualize_application.py:279-296
        idx_distance = 21
        idx_interval = 0
        indices = []
        for idx in range(0, min(n_probs, frame_end - frame_srt + fps)):
            if idx_interval > idx_distance:
                indices.append(idx)
                idx_interval = 1
            else:
                idx_interval += 1
            if idx > frame_end - int(1.4 * fps / 10) and idx_distance > 0 and idx < frame_end:
                idx_distance = 0
            elif idx > frame_end and idx_distance == 0:
                idx_distance = 21
        return indices

    def test_index_parity(self):
        from kstar_tpu.viz.prob_curve import realtime_frame_indices

        for n_probs, srt, end, fps in [(4096, 0, 3800, 210), (2048, 128, 1900, 210),
                                       (900, 0, 700, 210), (5000, 0, 4500, 200),
                                       (50, 0, 40, 210)]:
            got = realtime_frame_indices(n_probs, srt, end, fps)
            ref = self._reference_indices(n_probs, srt, end, fps)
            assert got == ref, (n_probs, srt, end, fps)
        # densification engages: every index in the pre-quench window
        sel = realtime_frame_indices(4096, 0, 3800, 210)
        dense = [i for i in sel if 3800 - 25 < i < 3800]
        assert dense == list(range(dense[0], dense[-1] + 1))

    def test_adaptive_fps(self):
        from kstar_tpu.viz.prob_curve import adaptive_camera_fps

        # reference visualize_application.py:433-440
        assert adaptive_camera_fps(3.0) == 210
        assert adaptive_camera_fps(7.0) == 207
        assert adaptive_camera_fps(12.0) == 204
        assert adaptive_camera_fps(20.0) == 200
