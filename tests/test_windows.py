"""Golden tests for the three window/labeling algorithms.

Expectations are computed by hand from the reference semantics
(reference src/dataset.py:80-96, :343-396, :605-665) on small synthetic
inputs — the off-by-one details here gate F1 parity.
"""

import numpy as np
import pytest

from kstar_tpu.data import windows as W


class TestVideoWindows:
    def test_backward_stride_and_labels(self):
        # frame_tipminf=100, dist=3 -> dis_frame=97; seq_len=10, startup=50
        # reversed(range(87, 50, -10)) -> [57, 67, 77, 87]
        w = W.video_windows(shot=1, frame_startup=50, frame_tipminf=100, seq_len=10, dist=3)
        np.testing.assert_array_equal(w.starts, [57, 67, 77, 87])
        np.testing.assert_array_equal(w.labels, [1, 1, 1, 0])

    def test_window_covers_s_plus_1_to_s_plus_seqlen(self):
        idx = W.video_frame_indices(np.array([57]), seq_len=10)
        np.testing.assert_array_equal(idx[0], np.arange(58, 68))

    def test_exact_fit_excludes_startup(self):
        # range(stop) is exclusive of frame_startup itself
        w = W.video_windows(shot=1, frame_startup=7, frame_tipminf=30, seq_len=10, dist=3)
        np.testing.assert_array_equal(w.starts, [17])
        np.testing.assert_array_equal(w.labels, [0])

    def test_empty_when_too_short(self):
        w = W.video_windows(shot=1, frame_startup=90, frame_tipminf=100, seq_len=21, dist=3)
        assert len(w) == 0


class TestTSWindows:
    def _times(self, n, dt):
        return np.arange(n) * dt

    def test_three_zones(self):
        dt = 0.01
        seq_len, dist = 21, 3
        n = 500
        times = self._times(n, dt)
        tftsrt = 0.5
        tipminf = 4.0
        w = W.ts_windows(1, times, tftsrt, tipminf, seq_len, dist, dt)

        assert len(w) > 0
        # replicate the reference walk independently
        exp_starts, exp_labels = [], []
        idx = int(tftsrt / dt)
        idx_last = n - seq_len - dist
        while idx < idx_last:
            t = times[idx]
            if tftsrt <= t < tipminf - dt * (2 * seq_len + dist):
                exp_starts.append(idx); exp_labels.append(1); idx += seq_len // 3
            elif t < tipminf - dt * (seq_len + dist):
                exp_starts.append(idx); exp_labels.append(1); idx += seq_len // 7
            elif t <= tipminf - dt * seq_len + dt:
                exp_starts.append(idx); exp_labels.append(0); idx += 1
            elif t > tipminf:
                break
            else:
                idx += seq_len // 3
        np.testing.assert_array_equal(w.starts, exp_starts)
        np.testing.assert_array_equal(w.labels, exp_labels)
        # near-quench zone emits stride-1 disruptive labels
        assert (w.labels == 0).sum() >= 1
        dis = w.starts[w.labels == 0]
        assert np.all(np.diff(dis) == 1)

    def test_small_seq_len_terminates(self):
        """seq_len < 7 made the mid-zone stride seq_len//7 == 0, hanging the
        walk forever (the reference dataset.py:378 has the same flaw at its
        non-default sizes); the floored strides must terminate and stay
        identical to the reference walk for seq_len >= 7."""
        dt = 0.01
        times = self._times(500, dt)
        for seq_len in (2, 4, 6):
            w = W.ts_windows(1, times, 0.5, 4.0, seq_len, 3, dt)
            assert len(w) > 0
            assert np.all(np.diff(w.starts) >= 1)

    def test_disruptive_zone_time_range(self):
        dt = 0.01
        seq_len, dist = 21, 3
        times = self._times(1000, dt)
        tipminf = 6.0
        w = W.ts_windows(1, times, 0.2, tipminf, seq_len, dist, dt)
        t_dis = times[w.starts[w.labels == 0]]
        assert np.all(t_dis >= tipminf - dt * (seq_len + dist) - 1e-9)
        assert np.all(t_dis <= tipminf - dt * seq_len + dt + 1e-9)

    def test_gather_inclusive_slice(self):
        data = np.arange(40, dtype=np.float32).reshape(40, 1)
        out = W.gather_ts(data, np.array([5]), seq_len=4)
        np.testing.assert_array_equal(out[0, :, 0], [6, 7, 8, 9])


class TestMultimodalWindows:
    def _setup(self, n_rows=400, dt=0.01, tftsrt=0.3, tipminf=3.5,
               frame_startup=30, frame_tipminf=350):
        times = np.arange(n_rows) * dt
        return times, tftsrt, tipminf, frame_startup, frame_tipminf

    def test_basic_pairing(self):
        times, tftsrt, tipminf, fs, ft = self._setup()
        mw = W.multimodal_windows(1, times, tftsrt, tipminf, fs, ft,
                                  n_frames=400, seq_len=21, dist=3, dt=0.01, tau=1)
        assert mw is not None and len(mw) > 0
        assert len(mw.video_starts) == len(mw.ts_starts) == len(mw.labels)
        # disruptive labels exist and are the windows nearest the quench
        assert (mw.labels == 0).sum() >= 1
        dis_frame = ft - 3 - 21
        assert np.all(mw.video_starts[mw.labels == 0] >= dis_frame - 1)

    def test_near_quench_stride_one(self):
        times, tftsrt, tipminf, fs, ft = self._setup()
        mw = W.multimodal_windows(1, times, tftsrt, tipminf, fs, ft,
                                  n_frames=400, seq_len=21, dist=3, dt=0.01, tau=1)
        # first dist+1 emitted windows step by 1 (diff<=dist zone)
        v = mw.video_starts
        assert v[0] - v[1] == 1 and v[1] - v[2] == 1

    def test_skip_too_short(self):
        times = np.arange(50) * 0.01
        mw = W.multimodal_windows(1, times, 0.0, 0.4, 5, 20,
                                  n_frames=60, seq_len=21, dist=3, dt=0.01, tau=1)
        assert mw is None

    def test_video_frame_offsets_tau(self):
        # reference: video_path[idx+tau*L+1 : idx+1 : -tau][::-1]
        for tau, L, s in [(1, 21, 10), (4, 21, 100), (2, 3, 0)]:
            path = list(range(1000))
            expected = path[s + tau * L + 1 : s + 1 : -tau][::-1]
            got = W.multimodal_video_frame_indices(np.array([s]), L, tau)[0]
            np.testing.assert_array_equal(got, expected)

    def test_pair_modes_agree_when_nothing_dropped(self):
        # dist < seq_len*tau: the t_disrupt filter drops nothing, so the
        # reference re-pairing and the aligned pairing are identical
        times, tftsrt, tipminf, fs, ft = self._setup()
        kw = dict(n_frames=400, seq_len=21, dist=3, dt=0.01, tau=1)
        ref = W.multimodal_windows(1, times, tftsrt, tipminf, fs, ft, **kw)
        ali = W.multimodal_windows(1, times, tftsrt, tipminf, fs, ft,
                                   pair_mode="aligned", **kw)
        np.testing.assert_array_equal(ref.video_starts, ali.video_starts)
        np.testing.assert_array_equal(ref.ts_starts, ali.ts_starts)
        np.testing.assert_array_equal(ref.labels, ali.labels)

    def test_reference_pairing_shift_vs_aligned(self):
        # dist > seq_len*tau: the reference filter drops the ts ladder's
        # near-quench head and re-pairs by tail truncation, so the video-ts
        # offset drifts (reference src/dataset.py:639-652 — latent in the
        # reference's own sweeps, which all use dist <= 20 < seq_len*tau=84,
        # exp/exp_multi.sh); 'aligned' keeps the walk's pairing by dropping
        # the offending entries as PAIRS
        times, tftsrt, tipminf, fs, ft = self._setup()
        kw = dict(n_frames=400, seq_len=8, dist=30, dt=0.01, tau=1)
        ref = W.multimodal_windows(1, times, tftsrt, tipminf, fs, ft, **kw)
        ali = W.multimodal_windows(1, times, tftsrt, tipminf, fs, ft,
                                   pair_mode="aligned", **kw)
        # the quirk: reference offsets drift across the window list
        ref_off = ref.video_starts - ref.ts_starts
        assert ref_off.min() != ref_off.max()
        # aligned: constant offset (the walk pairs index-for-index) ...
        ali_off = ali.video_starts - ali.ts_starts
        assert ali_off.min() == ali_off.max()
        # ... and no 0D anchor crosses t_disrupt
        t_disrupt = tipminf - 30 * 0.01
        assert float(times[ali.ts_starts].max()) <= t_disrupt
        # aligned drops the head pairs whose ts anchor overshoots, nothing else
        assert len(ali) <= len(ref)
        assert (ali.labels == 0).sum() >= 1  # disruptive windows survive

    def test_pair_mode_rejects_unknown(self):
        times, tftsrt, tipminf, fs, ft = self._setup()
        with np.testing.assert_raises(ValueError):
            W.multimodal_windows(1, times, tftsrt, tipminf, fs, ft,
                                 n_frames=400, seq_len=8, dist=30, dt=0.01,
                                 tau=1, pair_mode="bogus")

    def test_ts_window_tau_subsample(self):
        data = np.arange(100, dtype=np.float32).reshape(100, 1)
        # reference: .loc[s+1 : s+L*tau].values[::tau]
        s, L, tau = 10, 5, 3
        expected = data[s + 1 : s + L * tau + 1 : tau, 0]
        got = W.gather_ts(data, np.array([s]), L, tau)[0, :, 0]
        np.testing.assert_array_equal(got, expected)


def test_class_counts():
    labels = np.array([0, 1, 1, 1, 0])
    np.testing.assert_array_equal(W.class_counts(labels), [2, 3])


class TestNormalShotWindows:
    """Negative-only walks for non-disruptive shots (--train_with_normal):
    no reference counterpart — the reference trains on disruptive shots only
    and a trained model never sees ramp-down labeled normal."""

    def test_video_normal_covers_ramp_down(self):
        from kstar_tpu.data.windows import LABEL_NORMAL, video_windows_normal

        w = video_windows_normal(1, frame_startup=10, frame_cutoff=200,
                                 seq_len=21)
        assert len(w) > 0
        assert (w.labels == LABEL_NORMAL).all()
        # anchored at the cutoff: the last window ends exactly at it
        assert w.starts[-1] + 21 == 200
        assert (np.diff(w.starts) == 21).all()
        assert w.starts[0] > 10

    def test_ts_normal_all_negative(self):
        from kstar_tpu.data.windows import LABEL_NORMAL, ts_windows_normal

        dt = 4.0 / 210.0
        times = np.arange(300) * dt
        w = ts_windows_normal(1, times, tftsrt=0.5, seq_len=21, dt=dt)
        assert len(w) > 0
        assert (w.labels == LABEL_NORMAL).all()
        assert (w.starts + 21 <= len(times)).all()
        assert (np.diff(w.starts) == 7).all()          # seq_len//3
        assert w.starts[0] == int(0.5 / dt)

    def test_multimodal_normal_pairs_stay_aligned(self):
        from kstar_tpu.data.windows import (LABEL_NORMAL,
                                            multimodal_windows_normal)

        dt = 1.0 / 210.0
        times = np.arange(1200) * dt
        mw = multimodal_windows_normal(1, times, tftsrt=0.2,
                                       frame_startup=40, frame_cutoff=1150,
                                       seq_len=21, dt=dt, tau=4)
        assert mw is not None and len(mw) > 0
        assert (mw.labels == LABEL_NORMAL).all()
        # positional pairing: both ladders step together (constant offset)
        off = mw.video_starts - mw.ts_starts
        assert (off == off[0]).all()
        # tails guarded for the gather geometry
        assert (mw.video_starts + 1 + 4 * 21 <= 1150).all()
        assert (mw.ts_starts + 4 * 21 < len(times)).all()

    def test_datasets_gate_on_include_normal(self, tiny_normal_dataset):
        from kstar_tpu.data import (MultiModalDataset, TSDataset,
                                    VideoDataset, VideoStore)

        from kstar_tpu.config import Schema

        cols = list(Schema.INPUT_FEATURES[:3])
        shots, disrupt_df, ts_df = tiny_normal_dataset
        store = VideoStore.from_arrays({s.shot: s.frames for s in shots})
        normal = [s.shot for s in shots if not s.is_disrupt]
        assert normal, "fixture must contain a normal shot"

        vd0 = VideoDataset(store, disrupt_df, normal, seq_len=10, dist=3)
        vd1 = VideoDataset(store, disrupt_df, normal, seq_len=10, dist=3,
                           include_normal=True)
        assert len(vd0) == 0 and len(vd1) > 0
        assert (vd1.labels == 1).all()
        x, y = vd1.batch(np.arange(min(4, len(vd1))))
        assert x.shape[1] == 10 and (y == 1).all()

        sub = ts_df[ts_df.shot.isin(normal)]
        td0 = TSDataset(sub, disrupt_df, cols, seq_len=10,
                        dist=3, dt=4.0 / 210.0)
        td1 = TSDataset(sub, disrupt_df, cols, seq_len=10,
                        dist=3, dt=4.0 / 210.0, include_normal=True)
        assert len(td0) == 0 and len(td1) > 0
        assert (td1.labels == 1).all()

        md0 = MultiModalDataset(store, ts_df, disrupt_df, cols,
                                normal, seq_len=10, dist=3, dt=4.0 / 210.0)
        md1 = MultiModalDataset(store, ts_df, disrupt_df, cols,
                                normal, seq_len=10, dist=3, dt=4.0 / 210.0,
                                include_normal=True)
        assert len(md0) == 0 and len(md1) > 0
        assert (md1.labels == 1).all()
        b, y = md1.batch(np.arange(min(4, len(md1))))
        assert b["video"].shape[1] == 10 and b["0D"].shape[1] == 10
