"""Data-pipeline invariants on synthetic shots (the reference's test intent,
test/test_data.py: finite inputs, bounded magnitude, nonzero class counts —
but hermetic)."""

import numpy as np
import pytest

from kstar_tpu.config import Schema
from kstar_tpu.data import (
    ImbalancedSampler, MultiModalDataset, Scaler, TSDataset, VideoDataset,
    VideoStore, epoch_batches, eval_batches, prepare_0d_dataset, split_shots,
)

COLS = Schema.INPUT_FEATURES


class TestTSDataset:
    def test_build_and_batch(self, tiny_dataset):
        shots, disrupt_df, ts_df = tiny_dataset
        df_train, df_valid, df_test, scaler = prepare_0d_dataset(ts_df, COLS, test_shot=None)
        ds = TSDataset(df_train, disrupt_df, COLS, seq_len=21, dist=3, scaler=scaler)
        assert len(ds) > 0
        counts = ds.class_counts()
        assert counts[0] > 0 and counts[1] > 0

        x, y = ds.batch(np.arange(min(16, len(ds))))
        assert x.shape[1:] == (21, len(COLS))
        assert np.isfinite(x).all()
        assert np.abs(x).max() < 1e6
        assert set(np.unique(y)) <= {0, 1}

    def test_scaler_roundtrip(self):
        x = np.random.default_rng(0).normal(3, 2, (100, 4))
        for kind in ("Robust", "Standard", "MinMax"):
            s = Scaler(kind).fit(x)
            out = s.transform(x)
            assert np.isfinite(out).all()
            s2 = Scaler.from_state(s.state_dict())
            np.testing.assert_allclose(out, s2.transform(x), rtol=1e-6)


class TestVideoDataset:
    def test_build_and_batch(self, tiny_dataset):
        shots, disrupt_df, ts_df = tiny_dataset
        store = VideoStore.from_arrays({s.shot: s.frames for s in shots})
        ds = VideoDataset(store, disrupt_df, [s.shot for s in shots], seq_len=21, dist=3)
        assert len(ds) > 0
        x, y = ds.batch(np.arange(min(8, len(ds))))
        assert x.dtype == np.uint8
        assert x.shape[1:] == (21, 64, 64, 3)
        assert ds.class_counts()[0] > 0


class TestMultiModalDataset:
    @pytest.mark.parametrize("tau", [1, 2])
    def test_build_and_batch(self, tiny_dataset, tau):
        shots, disrupt_df, ts_df = tiny_dataset
        store = VideoStore.from_arrays({s.shot: s.frames for s in shots})
        ds = MultiModalDataset(
            store, ts_df, disrupt_df, COLS, [s.shot for s in shots],
            seq_len=10, dist=3, dt=4.0 / 210.0, tau=tau,
        )
        assert len(ds) > 0
        data, y = ds.batch(np.arange(min(8, len(ds))))
        assert data["video"].shape[1] == 10
        assert data["0D"].shape[1:] == (10, len(COLS))
        assert np.isfinite(data["0D"]).all()
        assert ds.class_counts()[0] > 0


class TestLoaders:
    def test_epoch_batches_static_shape(self):
        batches = list(epoch_batches(103, 16, np.random.default_rng(0)))
        assert all(len(b) == 16 for b in batches)

    def test_eval_batches_mask(self):
        batches = list(eval_batches(10, 4))
        assert len(batches) == 3
        idx, mask = batches[-1]
        assert len(idx) == 4 and mask.sum() == 2

    def test_imbalanced_sampler_balances(self):
        labels = np.array([0] * 10 + [1] * 990)
        s = ImbalancedSampler(labels, num_samples=2000)
        idx = s.sample(np.random.default_rng(0))
        frac0 = (labels[idx] == 0).mean()
        assert 0.4 < frac0 < 0.6


def test_split_shots_deterministic():
    shots = list(range(100))
    a = split_shots(shots, test_shot=None)
    b = split_shots(shots, test_shot=None)
    assert a == b
    train, valid, test = a
    assert not (set(train) & set(test)) and not (set(train) & set(valid))
    assert len(train) + len(valid) + len(test) == 100


def test_epoch_batches_small_dataset_still_yields():
    from kstar_tpu.data import epoch_batches
    batches = list(epoch_batches(10, 64, np.random.default_rng(0)))
    assert len(batches) == 1 and len(batches[0]) == 64
    assert set(batches[0]) == set(range(10))


class TestEvalOnlyShots:
    """--synthetic_eval_disrupt machinery: extra disruptive shots marked
    eval_only grow the alarm populations without entering any split."""

    def test_make_dataset_eval_only_flags(self):
        from kstar_tpu.data import synthetic
        shots, df, ts_df = synthetic.make_dataset(
            n_shots=3, n_frames=64, height=8, width=8, seed=0,
            difficulty=1.0, n_normal=2, n_eval_disrupt=4)
        assert len(shots) == 9
        assert df.eval_only.tolist() == [False] * 5 + [True] * 4
        # eval-only shots are disruptive (finite quench times)
        ev = df[df.eval_only]
        assert ev.is_disrupt.all() and np.isfinite(ev.tipminf).all()
        # and have 0D rows like any other shot
        assert set(ev.shot) <= set(ts_df.shot)

    def test_split_eval_only_shots(self):
        from kstar_tpu.cli.common import split_eval_only_shots
        from kstar_tpu.data import synthetic
        shots, df, _ = synthetic.make_dataset(
            n_shots=3, n_frames=64, height=8, width=8, seed=0,
            n_eval_disrupt=2)
        ids = [s.shot for s in shots]
        splittable, ev = split_eval_only_shots(df, ids)
        assert ev == ids[-2:] and splittable == ids[:-2]
        # shot log without the column: everything splittable (real data)
        splittable2, ev2 = split_eval_only_shots(df.drop(columns="eval_only"),
                                                 ids)
        assert splittable2 == ids and ev2 == []

    def test_partition_shots_four_way(self):
        from kstar_tpu.cli.common import partition_shots
        from kstar_tpu.data import synthetic
        shots, df, _ = synthetic.make_dataset(
            n_shots=3, n_frames=64, height=8, width=8, seed=0,
            n_normal=2, n_eval_disrupt=2, n_eval_normal=3)
        ids = [s.shot for s in shots]
        d, n, ev_d, ev_n = partition_shots(df, ids)
        assert d == ids[:3] and n == ids[3:5]
        assert ev_d == ids[5:7] and ev_n == ids[7:10]
        # eval-only normals really are non-disruptive
        sub = df[df.shot.isin(ev_n)]
        assert (~sub.is_disrupt.astype(bool)).all()

    def test_precursor_lead_range_respected(self):
        from kstar_tpu.data import synthetic
        # 12 s shots, multi-second leads: every drawn lead must land in the
        # configured window (the reference regime for warning-time stats)
        for i in range(4):
            s = synthetic.make_shot(31000 + i, n_frames=2520, height=8,
                                    width=8, seed=1, difficulty=1.0,
                                    precursor_lead_s=(1.5, 4.0))
            assert 1.5 - 1e-6 <= s.lead_s <= 4.0
        # default window unchanged (CI fixture)
        s = synthetic.make_shot(31010, n_frames=2520, height=8, width=8,
                                seed=1, difficulty=1.0)
        assert 0.0 < s.lead_s <= 2.5
        # no precursor without difficulty / for normal shots
        assert synthetic.make_shot(31011, n_frames=256, height=8, width=8,
                                   seed=1).lead_s == 0.0
