"""Gradient Blending orchestration tests (stream steps, gb_estimate, fit_gb)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kstar_tpu.config import LossConfig, OptimConfig, Schema, TrainConfig
from kstar_tpu.data import MultiModalDataset, VideoStore
from kstar_tpu.models import MultiModalGB
from kstar_tpu.train import create_train_state
from kstar_tpu.train.gb import fit_gb, gb_estimate, make_stream_eval, make_stream_step

COLS = Schema.INPUT_FEATURES

VIVIT_KW = dict(image_size=32, patch_size=8, n_frames=10, dim=16, depth=1,
                n_heads=2, d_head=8, scale_dim=2, dropout=0.0, embedd_dropout=0.0)
TS_KW = dict(n_features=len(COLS), feature_dims=16, max_len=10, n_layers=1,
             n_heads=2, dim_feedforward=16, cls_dims=8)


class _PreppedDS:
    """Wrap MultiModalDataset to emit float video (models expect floats)."""

    def __init__(self, ds):
        self.ds = ds
        self.labels = ds.labels

    def __len__(self):
        return len(self.ds)

    def class_counts(self):
        return self.ds.class_counts()

    def batch(self, idx):
        data, y = self.ds.batch(idx)
        # crude center crop to 32 + normalize
        H = data["video"].shape[2]
        y0 = H // 2 - 16
        v = data["video"][:, :, y0:y0 + 32, y0:y0 + 32, :].astype(np.float32) / 255.0
        return {"video": v, "0D": data["0D"]}, y


@pytest.fixture(scope="module")
def gb_setup(tiny_dataset):
    shots, disrupt_df, ts_df = tiny_dataset
    store = VideoStore.from_arrays({s.shot: s.frames for s in shots})
    ds = MultiModalDataset(store, ts_df, disrupt_df, COLS,
                           [s.shot for s in shots], seq_len=10, dist=3,
                           dt=4.0 / 210.0, tau=1)
    ds = _PreppedDS(ds)
    model = MultiModalGB(vivit_kwargs=VIVIT_KW, ts_kwargs=TS_KW)
    b0, _ = ds.batch(np.arange(4))
    state = create_train_state(model, None, jax.random.key(0), OptimConfig(lr=1e-3),
                               apply_args=(b0["video"], b0["0D"]))
    return model, state, ds


class TestStreamSteps:
    @pytest.mark.parametrize("stream", ["video", "0D", "multi"])
    def test_stream_step_runs(self, gb_setup, stream):
        model, state, ds = gb_setup
        step = make_stream_step(model, LossConfig(loss_type="CE"), stream)
        batch, y = ds.batch(np.arange(4))
        w = jnp.ones(2); m = jnp.asarray([0.3, 0.1])
        new_state, loss = step(state, batch, jnp.asarray(y), w, m)
        assert np.isfinite(float(loss))

    def test_video_stream_only_updates_video_params(self, gb_setup):
        model, state, ds = gb_setup
        step = make_stream_step(model, LossConfig(loss_type="CE"), "video")
        batch, y = ds.batch(np.arange(4))
        w = jnp.ones(2); m = jnp.asarray([0.3, 0.1])
        new_state, _ = step(state, batch, jnp.asarray(y), w, m)
        # ts_model params must be untouched by the video stream
        old_ts = jax.tree.leaves(state.params["ts_model"])
        new_ts = jax.tree.leaves(new_state.params["ts_model"])
        assert all(np.array_equal(np.asarray(a), np.asarray(b))
                   for a, b in zip(old_ts, new_ts))
        # vis_model params must change
        old_v = jax.tree.leaves(state.params["vis_model"])
        new_v = jax.tree.leaves(new_state.params["vis_model"])
        assert any(not np.array_equal(np.asarray(a), np.asarray(b))
                   for a, b in zip(old_v, new_v))


class TestGBEstimate:
    def test_weights_normalized(self, gb_setup):
        model, state, ds = gb_setup
        ws = gb_estimate(model, state, ds, ds, LossConfig(loss_type="CE"),
                         batch_size=4, n_epochs=2)
        assert set(ws) == {"video", "0D", "multi"}
        assert np.isclose(sum(ws.values()), 1.0)

    def test_scan_steps_match_sequential_stream_steps(self, gb_setup):
        """make_stream_scan_steps(K=2) == two sequential make_stream_step
        calls: same losses, same updated params (exact scan semantics)."""
        from kstar_tpu.train.gb import make_stream_scan_steps

        model, state, ds = gb_setup
        loss_cfg = LossConfig(loss_type="CE")
        w = jnp.ones(2); m = jnp.asarray([0.3, 0.1])
        b1, y1 = ds.batch(np.arange(4))
        b2, y2 = ds.batch(np.arange(4, 8))

        step = make_stream_step(model, loss_cfg, "video")
        s_seq, l1 = step(state, b1, jnp.asarray(y1), w, m)
        s_seq, l2 = step(s_seq, b2, jnp.asarray(y2), w, m)

        stack = {k: np.stack([b1[k], b2[k]]) for k in b1}
        ys = jnp.asarray(np.stack([y1, y2]))
        scan = make_stream_scan_steps(model, loss_cfg, "video")
        s_scan, losses = scan(state, stack, ys, w, m)

        np.testing.assert_allclose(np.asarray(losses),
                                   [float(l1), float(l2)], rtol=1e-5)
        for a, b in zip(jax.tree.leaves(s_seq.params),
                        jax.tree.leaves(s_scan.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    def test_gb_estimate_scan_dispatch_weights_close(self, gb_setup):
        """gb_estimate with scanned probe epochs lands on the same weights
        up to the 1/(Of-Oi)^2 amplification of float reassociation noise
        (step-level exactness is asserted above)."""
        model, state, ds = gb_setup
        kw = dict(batch_size=4, n_epochs=2, seed=7)
        w1 = gb_estimate(model, state, ds, ds, LossConfig(loss_type="CE"), **kw)
        w2 = gb_estimate(model, state, ds, ds, LossConfig(loss_type="CE"),
                         steps_per_dispatch=2, **kw)
        for s in w1:
            np.testing.assert_allclose(w1[s], w2[s], rtol=5e-2)


class TestFitGB:
    def test_two_epochs(self, gb_setup, tmp_path):
        model, state, ds = gb_setup
        # fit_gb's jitted steps DONATE the state's buffers; copy so the
        # module-scoped fixture stays usable for later tests
        state = jax.tree.map(jnp.copy, state)
        cfg = TrainConfig(batch_size=4, num_epoch=2, weight_dir=str(tmp_path),
                          early_stopping=False, verbose=0)
        state, hist, gb_w = fit_gb(model, state, ds, ds, cfg,
                                   LossConfig(loss_type="Focal"), tag="gbtest")
        assert len(hist.train_loss) == 2
        assert all(np.isfinite(hist.train_loss))
        assert (tmp_path / "gbtest_last.ckpt").exists()


class TestFusedPreprocess:
    def test_stream_eval_pre_fn_matches_host_preprocess(self, gb_setup):
        """make_stream_eval(pre_fn=...) on raw uint8 == plain eval on a batch
        preprocessed by the same (deterministic, train=False) pipeline."""
        from kstar_tpu.config import AugmentConfig
        from kstar_tpu.data.augment import make_pre_fns, preprocess_pure

        model, state, ds = gb_setup
        raw, y = ds.ds.batch(np.arange(4))          # uint8 video, float 0D
        _, pre_eval = make_pre_fns(32, AugmentConfig(), out_dtype=jnp.float32)
        w = jnp.ones(2); m = jnp.asarray([0.3, 0.1]); mask = jnp.ones(4)

        for stream in ("video", "0D", "multi"):
            fused = make_stream_eval(model, LossConfig(loss_type="CE"), stream,
                                     pre_fn=pre_eval)
            plain = make_stream_eval(model, LossConfig(loss_type="CE"), stream)
            pre = dict(raw)
            pre["video"] = preprocess_pure(None, jnp.asarray(raw["video"]), 32,
                                           AugmentConfig(), train=False,
                                           out_dtype=jnp.float32)
            l1, p1 = fused(state, jax.tree.map(jnp.asarray, raw), jnp.asarray(y), w, m, mask)
            l2, p2 = plain(state, pre, jnp.asarray(y), w, m, mask)
            np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
            np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
