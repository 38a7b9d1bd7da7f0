"""Golden window/label parity: run the REFERENCE Dataset classes on the same
synthetic shots and assert this framework's window generators produce
identical indices and labels. This is the strongest check of the labeling
core (SURVEY.md 'hard parts': off-by-one-sensitive semantics).

cv2 is stubbed (index generation never decodes frames); frame folders are
materialized as empty jpg files for the reference's glob-based path logic.
"""

import os

import numpy as np
import pandas as pd
import pytest

from parity_helpers import REF, stub_ref_deps

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not mounted")


@pytest.fixture(scope="module")
def ref_dataset_mod():
    stub_ref_deps()
    import importlib

    return importlib.import_module("src.dataset")


def _make_frame_folder(tmp_path, shot: int, n_frames: int) -> str:
    d = tmp_path / str(shot)
    d.mkdir()
    for i in range(n_frames):
        (d / f"{i:06d}.jpg").touch()
    return str(d)


class TestVideoWindowGolden:
    @pytest.mark.parametrize("seq_len,dist", [(21, 3), (21, 1), (21, 20), (84, 3)])
    def test_indices_and_labels_match(self, tmp_path, tiny_dataset,
                                      ref_dataset_mod, seq_len, dist):
        from kstar_tpu.data import windows as W

        shots, disrupt_df, _ = tiny_dataset
        for s in shots[:3]:
            folder = _make_frame_folder(tmp_path, s.shot, len(s.frames))
            ref_ds = ref_dataset_mod.DatasetForVideo(
                [folder], disrupt_df, augmentation=False,
                seq_len=seq_len, dist=dist)

            mine = W.video_windows(s.shot, s.frame_startup, s.frame_tipminf,
                                   seq_len, dist)

            # reference stores per-window path lists [idx+1 : idx+seq_len+1]
            ref_starts = [int(os.path.basename(p[0]).split(".")[0]) - 1
                          for p in ref_ds.video_file_path]
            np.testing.assert_array_equal(mine.starts, ref_starts)
            np.testing.assert_array_equal(mine.labels, ref_ds.labels)

            # frame coverage identical
            for k, paths in enumerate(ref_ds.video_file_path):
                ref_frames = [int(os.path.basename(p).split(".")[0]) for p in paths]
                got = W.video_frame_indices(mine.starts[k:k + 1], seq_len)[0]
                np.testing.assert_array_equal(got, ref_frames)


class TestTSWindowGolden:
    # seq_len 7 is the smallest REFERENCE-safe size (its seq_len//7 stride
    # is 0 below that and the reference walk hangs — our floored strides
    # are covered separately in test_windows.py)
    @pytest.mark.parametrize("seq_len,dist", [(21, 3), (21, 1), (21, 20),
                                              (84, 3), (7, 2), (10, 5)])
    def test_indices_and_labels_match(self, tiny_dataset, ref_dataset_mod,
                                      seq_len, dist):
        from kstar_tpu.config import DT_0D, Schema
        from kstar_tpu.data import windows as W

        shots, disrupt_df, ts_df = tiny_dataset
        cols = Schema.INPUT_FEATURES

        ref_ds = ref_dataset_mod.DatasetFor0D(
            ts_df.copy().reset_index(drop=True), disrupt_df, seq_len=seq_len,
            cols=list(cols), dist=dist, dt=DT_0D, scaler=None)

        # rebuild with my pure functions, per shot, translating positional
        # starts to the global row labels the reference stores
        all_starts, all_labels = [], []
        for shot in ref_ds.shot_list:
            d = ts_df[ts_df.shot == shot]
            row = disrupt_df[disrupt_df.shot == shot].iloc[0]
            w = W.ts_windows(shot, d.time.values, float(row.tftsrt),
                             float(row.tipminf), seq_len, dist, DT_0D)
            offset = d.index.values[0]
            all_starts.extend((w.starts + offset).tolist())
            all_labels.extend(w.labels.tolist())

        np.testing.assert_array_equal(all_starts, ref_ds.indices)
        np.testing.assert_array_equal(all_labels, ref_ds.labels)


class TestMultimodalWindowGolden:
    # (8, 12, 1) and (10, 16, 1) have dist > seq_len*tau — the regime where
    # the reference's post-walk t_disrupt filter (src/dataset.py:639-652)
    # drops the head of the ts ladder and SHIFTS the video<->0D pairing;
    # pair_mode="reference" must reproduce that shift exactly
    @pytest.mark.parametrize("seq_len,dist,tau", [(10, 3, 1), (10, 1, 1),
                                                  (10, 3, 2), (21, 3, 4),
                                                  (8, 6, 3), (12, 2, 4),
                                                  (8, 12, 1), (10, 16, 1)])
    def test_indices_and_labels_match(self, tmp_path, tiny_dataset,
                                      ref_dataset_mod, seq_len, dist, tau):
        from kstar_tpu.config import DT_0D, Schema
        from kstar_tpu.data import windows as W

        shots, disrupt_df, ts_df = tiny_dataset
        cols = Schema.INPUT_FEATURES

        folders = [_make_frame_folder(tmp_path, s.shot, len(s.frames))
                   for s in shots[:4]]

        # the reference calls fillna(method='ffill'), removed in pandas 2.x —
        # shim the old signature for the duration of the constructor
        orig_fillna = pd.DataFrame.fillna

        def fillna_compat(self, *a, **k):
            if k.get("method") == "ffill":
                return self.ffill()
            return orig_fillna(self, *a, **k)

        pd.DataFrame.fillna = fillna_compat
        try:
            ref_ds = ref_dataset_mod.MultiModalDataset(
                folders, disrupt_df, ts_df.copy().reset_index(drop=True), list(cols),
                augmentation=False, seq_len=seq_len, dist=dist, dt=DT_0D,
                scaler=None, tau=tau)
        finally:
            pd.DataFrame.fillna = orig_fillna

        mine_video, mine_ts, mine_labels = [], [], []
        for s in shots[:4]:
            if s.shot not in ref_ds.shot_list:
                continue
            d = ts_df[ts_df.shot == s.shot]
            mw = W.multimodal_windows(
                s.shot, d.time.values, float(s.tftsrt), float(s.tipminf),
                s.frame_startup, s.frame_tipminf, len(s.frames),
                seq_len, dist, DT_0D, tau)
            if mw is None:
                continue
            offset = d.index.values[0]
            mine_video.extend(mw.video_starts.tolist())
            mine_ts.extend((mw.ts_starts + offset).tolist())
            mine_labels.extend(mw.labels.tolist())

        ref_video_starts = [int(os.path.basename(p[0]).split(".")[0]) - 1 - tau
                            for p in ref_ds.video_file_path]
        np.testing.assert_array_equal(mine_video, ref_video_starts)
        np.testing.assert_array_equal(mine_ts, ref_ds.ts_data_indices)
        np.testing.assert_array_equal(mine_labels, np.asarray(ref_ds.labels))
