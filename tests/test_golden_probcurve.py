"""Golden alignment test for the 0D continuous probability curve: run the
REFERENCE generate_prob_curve_from_0D with a constant-logit torch model and
compare time axis + probability array against predict_0d_shot with an
equivalent constant-logit flax model. With constant model output, any
difference can only come from window counting, padding, startup
suppression, re-interpolation, or smoothing — exactly the alignment
semantics under test (reference src/utils/utility.py:979-1066)."""

import os
import sys

import numpy as np
import pandas as pd
import pytest

from parity_helpers import REF, stub_ref_deps

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not mounted")

LOGIT_DISRUPT = 0.7
LOGIT_NORMAL = -0.3


@pytest.fixture()
def patched_cv2_imread():
    """Point cv2.imread at constant frames for the reference's jpg loader,
    restoring the REAL cv2 (present in this image) afterwards — without the
    restore, later tests that decode actual images see 256x256 zeros."""
    import sys as _sys
    mod = _sys.modules.get("cv2")
    old = getattr(mod, "imread", None) if mod else None
    yield
    if mod is not None:
        mod.imread = old


@pytest.fixture(scope="module")
def ref_utility():
    stub_ref_deps()
    import importlib

    return importlib.import_module("src.utils.utility")


class TestGolden0DProbCurve:
    def test_alignment_matches_reference(self, ref_utility, tiny_dataset, tmp_path):
        import torch

        import jax
        import jax.numpy as jnp
        from flax import linen as nn

        from kstar_tpu.config import DT_0D, Schema
        from kstar_tpu.data.splits import Scaler
        from kstar_tpu.infer import predict_0d_shot

        shots, disrupt_df, ts_df = tiny_dataset
        cols = Schema.INPUT_FEATURES
        shot = shots[0]
        seq_len, dist = 21, 3

        # --- reference path ---------------------------------------------------
        class ConstTorch(torch.nn.Module):
            def forward(self, x):
                B = x.shape[0]
                out = torch.empty((B, 2))
                out[:, 0] = LOGIT_DISRUPT
                out[:, 1] = LOGIT_NORMAL
                return out

        shot_list_path = tmp_path / "shotlist.csv"
        ts_path = tmp_path / "ts.csv"
        disrupt_df.to_csv(shot_list_path, index=False, encoding="euc-kr")
        ts_df.to_csv(ts_path, index=False)

        t_ref, p_ref = ref_utility.generate_prob_curve_from_0D(
            ConstTorch(), device="cpu",
            save_dir=str(tmp_path / "ref.png"),
            ts_data_dir=str(ts_path), ts_cols=list(cols),
            shot_list_dir=str(shot_list_path), shot_num=shot.shot,
            seq_len=seq_len, dist=dist, dt=DT_0D, scaler=None)

        # --- kstar_tpu path ---------------------------------------------------
        class ConstFlax(nn.Module):
            @nn.compact
            def __call__(self, x, train=False):
                B = x.shape[0]
                bias = self.param("b", nn.initializers.zeros, (2,))
                base = jnp.asarray([LOGIT_DISRUPT, LOGIT_NORMAL])
                return jnp.broadcast_to(base + bias, (B, 2))

        model = ConstFlax()
        v = model.init(jax.random.key(0), jnp.zeros((1, seq_len, len(cols))))
        d = ts_df[ts_df.shot == shot.shot]
        t_mine, p_mine = predict_0d_shot(
            model, v["params"], {}, d[cols].to_numpy(np.float32),
            d["time"].to_numpy(), Scaler("Robust"),
            seq_len=seq_len, dist=dist, dt=DT_0D)

        assert len(p_mine) == len(p_ref)
        np.testing.assert_allclose(t_mine, t_ref, atol=1e-9)
        np.testing.assert_allclose(p_mine, np.asarray(p_ref), atol=1e-5)


class TestGoldenMultimodalProbCurve:
    def test_alignment_matches_reference(self, ref_utility, tiny_dataset, tmp_path, patched_cv2_imread):
        import torch

        import jax
        import jax.numpy as jnp
        from flax import linen as nn

        from kstar_tpu.config import DT_0D, Schema
        from kstar_tpu.infer import predict_multimodal_shot

        from kstar_tpu.data import synthetic

        # a longer shot so the data region extends past the 1 s startup
        # suppression window
        shot = synthetic.make_shot(shot=50000, n_frames=900, height=32, width=32,
                                   dt=4.0 / 210.0)
        disrupt_df = pd.DataFrame([{
            "shot": shot.shot, "tftsrt": shot.tftsrt, "tTQend": shot.tTQend,
            "tipminf": shot.tipminf, "dt": shot.tipminf - shot.tTQend,
            "frame_startup": shot.frame_startup, "frame_cutoff": shot.frame_cutoff,
            "frame_tTQend": shot.frame_tTQend, "frame_tipminf": shot.frame_tipminf,
        }])
        ts_df = shot.ts
        cols = Schema.INPUT_FEATURES
        seq_len, dist, tau = 10, 3, 1
        n_frames = len(shot.frames)

        folder = tmp_path / str(shot.shot)
        folder.mkdir()
        for i in range(n_frames):
            (folder / f"{i:06d}.jpg").touch()
        sys.modules["cv2"].imread = lambda p: np.zeros((256, 256, 3), np.uint8)

        class ConstTorch(torch.nn.Module):
            def forward(self, xv, xt):
                B = xv.shape[0]
                out = torch.empty((B, 2))
                out[:, 0] = LOGIT_DISRUPT
                out[:, 1] = LOGIT_NORMAL
                return out

        shot_list_path = tmp_path / "shotlist.csv"
        ts_path = tmp_path / "ts.csv"
        disrupt_df.to_csv(shot_list_path, index=False, encoding="euc-kr")
        ts_df.to_csv(ts_path, index=False)

        # the reference returns only the RAW window probs; its final smoothed
        # curve goes to the plot functions — capture it there
        captured = {}
        orig_plot = ref_utility.plot_exp_prob_type_1

        def capture_plot(ts_data_0D, prob_list, time_x, *a, **k):
            captured["curve"] = np.asarray(prob_list, dtype=np.float64)
            captured["time"] = np.asarray(time_x, dtype=np.float64)
            return None

        orig_plot2 = ref_utility.plot_exp_prob_type_2
        ref_utility.plot_exp_prob_type_1 = capture_plot
        ref_utility.plot_exp_prob_type_2 = lambda *a, **k: None
        try:
            t_ref, p_ref_raw = ref_utility.generate_prob_curve_from_multi(
                str(folder), ConstTorch(), device="cpu",
                save_dir=str(tmp_path / "ref.png"),
                ts_data_dir=str(ts_path), ts_cols=list(cols),
                shot_list_dir=str(shot_list_path), shot_num=shot.shot,
                vis_seq_len=seq_len, ts_seq_len=seq_len, dist=dist, dt=DT_0D,
                scaler=None, tau=tau)
        finally:
            # restore BOTH patches: the reference module is session-cached in
            # sys.modules, so a leaked no-op would contaminate later tests
            ref_utility.plot_exp_prob_type_1 = orig_plot
            ref_utility.plot_exp_prob_type_2 = orig_plot2

        class ConstFlax(nn.Module):
            @nn.compact
            def __call__(self, xv, xt, train=False):
                B = xv.shape[0]
                bias = self.param("b", nn.initializers.zeros, (2,))
                base = jnp.asarray([LOGIT_DISRUPT, LOGIT_NORMAL])
                return jnp.broadcast_to(base + bias, (B, 2))

        model = ConstFlax()
        v = model.init(jax.random.key(0),
                       jnp.zeros((1, seq_len, 128, 128, 3)),
                       jnp.zeros((1, seq_len, len(cols))))
        d = ts_df[ts_df.shot == shot.shot]
        frames = np.zeros((n_frames, 256, 256, 3), np.uint8)
        t_mine, p_mine = predict_multimodal_shot(
            model, v["params"], {}, frames, d[cols].to_numpy(np.float32),
            d["time"].to_numpy(), None,
            int(shot.frame_startup), int(shot.frame_cutoff),
            float(shot.tftsrt), float(shot.tipminf),
            seq_len=seq_len, dist=dist, dt=DT_0D, tau=tau,
            crop_size=128, batch_size=32, compute_dtype=jnp.float32)

        # time axes identical (binds head padding, window count, tail)
        assert len(t_mine) == len(t_ref)
        np.testing.assert_allclose(t_mine, np.asarray(t_ref), atol=1e-9)
        const_p = 1.0 / (1.0 + np.exp(LOGIT_NORMAL - LOGIT_DISRUPT))
        assert np.allclose(np.asarray(p_ref_raw), const_p, atol=1e-6)
        # my smoothed curve equals the reference's final (captured) curve;
        # interpolation backends differ only in out-of-range extrapolation,
        # which both resolve to the zero tail here
        np.testing.assert_allclose(p_mine, captured["curve"], atol=1e-5)


class TestGoldenVideoProbCurve:
    def test_alignment_matches_reference(self, ref_utility, tiny_dataset, tmp_path, patched_cv2_imread):
        import torch

        import jax
        import jax.numpy as jnp
        from flax import linen as nn

        from kstar_tpu.config import Schema
        from kstar_tpu.infer import predict_video_shot

        shots, disrupt_df, ts_df = tiny_dataset
        cols = Schema.INPUT_FEATURES
        shot = shots[1]
        seq_len, dist = 21, 3
        n_frames = len(shot.frames)

        # frame folder of empty jpgs; stub cv2.imread to constant frames
        folder = tmp_path / str(shot.shot)
        folder.mkdir()
        for i in range(n_frames):
            (folder / f"{i:06d}.jpg").touch()
        sys.modules["cv2"].imread = lambda p: np.zeros((256, 256, 3), np.uint8)

        class ConstTorch(torch.nn.Module):
            def forward(self, x):
                B = x.shape[0]
                out = torch.empty((B, 2))
                out[:, 0] = LOGIT_DISRUPT
                out[:, 1] = LOGIT_NORMAL
                return out

        shot_list_path = tmp_path / "shotlist.csv"
        ts_path = tmp_path / "ts.csv"
        disrupt_df.to_csv(shot_list_path, index=False, encoding="euc-kr")
        ts_df.to_csv(ts_path, index=False)

        t_ref, p_ref = ref_utility.generate_prob_curve(
            str(folder), ConstTorch(), device="cpu",
            save_dir=str(tmp_path / "ref.png"),
            shot_list_dir=str(shot_list_path), ts_data_dir=str(ts_path),
            ts_cols=list(cols), shot_num=shot.shot,
            clip_len=seq_len, dist_frame=dist)

        class ConstFlax(nn.Module):
            @nn.compact
            def __call__(self, x, train=False):
                B = x.shape[0]
                bias = self.param("b", nn.initializers.zeros, (2,))
                base = jnp.asarray([LOGIT_DISRUPT, LOGIT_NORMAL])
                return jnp.broadcast_to(base + bias, (B, 2))

        model = ConstFlax()
        v = model.init(jax.random.key(0), jnp.zeros((1, seq_len, 128, 128, 3)))
        frames = np.zeros((n_frames, 256, 256, 3), np.uint8)
        t_mine, p_mine = predict_video_shot(
            model, v["params"], {}, frames,
            int(shot.frame_startup), int(shot.frame_cutoff),
            seq_len=seq_len, dist=dist, crop_size=128, batch_size=64,
            compute_dtype=jnp.float32)

        assert len(p_mine) == len(p_ref)
        np.testing.assert_allclose(t_mine, t_ref, atol=1e-9)
        np.testing.assert_allclose(p_mine, np.asarray(p_ref), atol=1e-5)
