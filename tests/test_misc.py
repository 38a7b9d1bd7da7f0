"""Tests for smaller utilities: sync table, threaded prefetch, device pipe,
model summary, tags."""

import numpy as np
import pandas as pd
import pytest

from kstar_tpu.config import LossConfig, Schema, TrainConfig, tag_for


class TestSyncTable:
    def test_sync_video_0d(self, tiny_dataset):
        from kstar_tpu.data.ts_pipeline import sync_video_0d

        shots, disrupt_df, ts_df = tiny_dataset
        table = sync_video_0d(ts_df, disrupt_df)
        assert set(table.columns) >= {"shot", "time", "frame_idx",
                                      "t_to_quench", "in_plasma"}
        assert len(table) == len(ts_df)
        # frame_idx monotonic per shot
        for shot in table.shot.unique()[:2]:
            f = table[table.shot == shot].frame_idx.values
            assert (np.diff(f) >= 0).all()


class TestThreadedBatches:
    def test_yields_all_batches_in_order(self, tiny_dataset):
        from kstar_tpu.data import TSDataset, prepare_0d_dataset
        from kstar_tpu.data.loader import eval_batches, threaded_batches

        shots, disrupt_df, ts_df = tiny_dataset
        df_train, _, _, scaler = prepare_0d_dataset(ts_df, Schema.INPUT_FEATURES,
                                                    test_shot=None)
        ds = TSDataset(df_train, disrupt_df, Schema.INPUT_FEATURES, scaler=scaler)
        idx_list = [idx for idx, _ in eval_batches(len(ds), 16)]
        got = list(threaded_batches(ds, idx_list))
        assert len(got) == len(idx_list)
        # order and content preserved
        x0, y0 = ds.batch(idx_list[0])
        np.testing.assert_array_equal(got[0][0], x0)
        np.testing.assert_array_equal(got[0][1], y0)


class TestAbandonedConsumer:
    def test_producer_exits_when_generator_closed(self):
        """Closing the generator mid-epoch (a train step raised) must unblock
        the producer thread — it used to park forever on q.put with device
        batches pinned, leaking a thread per failed trial."""
        import threading
        import time

        from kstar_tpu.data.loader import threaded_batches

        class SlowDS:
            def batch(self, idx):
                return np.asarray(idx, np.float32), np.zeros(len(idx), np.int64)

        before = threading.active_count()
        # depth=1: the producer fills the queue and blocks on the second put
        gen = threaded_batches(SlowDS(), [np.arange(4)] * 16, depth=1)
        next(gen)
        gen.close()
        for _ in range(50):                       # producer exits within 5 s
            if threading.active_count() <= before:
                break
            time.sleep(0.1)
        assert threading.active_count() <= before


class TestGroupedBatches:
    def test_stacks_then_singles(self, tiny_dataset):
        from kstar_tpu.data import TSDataset, prepare_0d_dataset
        from kstar_tpu.data.loader import eval_batches, grouped_batches

        shots, disrupt_df, ts_df = tiny_dataset
        df_train, _, _, scaler = prepare_0d_dataset(ts_df, Schema.INPUT_FEATURES,
                                                    test_shot=None)
        ds = TSDataset(df_train, disrupt_df, Schema.INPUT_FEATURES, scaler=scaler)
        idx_list = [idx for idx, _ in eval_batches(len(ds), 16)]
        k = 3
        got = list(grouped_batches(ds, idx_list, k))
        n_full = len(idx_list) // k
        assert [kind for kind, _ in got] == (["stack"] * n_full
                                             + ["single"] * (len(idx_list) - n_full * k))
        # stacked content == the k individually gathered batches, in order
        (kind0, (xb, yb)) = got[0]
        assert xb.shape[0] == k and yb.shape == (k, 16)
        for j in range(k):
            x_j, y_j = ds.batch(idx_list[j])
            np.testing.assert_array_equal(xb[j], x_j)
            np.testing.assert_array_equal(yb[j], y_j)
        # remainder batches come through unstacked
        if len(idx_list) % k:
            _, (xs, ys) = got[-1]
            x_l, y_l = ds.batch(idx_list[-1])
            np.testing.assert_array_equal(xs, x_l)

    def test_dict_batches_and_small_epoch(self):
        from kstar_tpu.data.loader import grouped_batches

        class DictDS:
            def batch(self, idx):
                idx = np.asarray(idx)
                return ({"video": idx[:, None] * 1.0, "0D": idx[:, None] * 2.0},
                        idx % 2)

        ds = DictDS()
        # fewer index batches than k: everything yields as singles
        got = list(grouped_batches(ds, [np.arange(4), np.arange(4, 8)], 3))
        assert [kind for kind, _ in got] == ["single", "single"]
        # dict batches stack per-key
        got = list(grouped_batches(ds, [np.arange(4), np.arange(4, 8)], 2))
        (kind, (b, y)) = got[0]
        assert kind == "stack" and b["video"].shape == (2, 4, 1)
        np.testing.assert_array_equal(b["0D"][1].ravel(), np.arange(4, 8) * 2.0)


class TestDevicePipeMesh:
    def test_sharded_preprocess(self, tiny_dataset):
        import jax

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from kstar_tpu.config import MeshConfig
        from kstar_tpu.data.device_pipe import DevicePreprocessor
        from kstar_tpu.parallel import make_mesh

        mesh = make_mesh(MeshConfig(data=8, model=1), jax.devices()[:8])
        pre = DevicePreprocessor(crop_size=32, train=False, mesh=mesh)
        v = np.random.default_rng(0).integers(0, 255, (16, 4, 64, 64, 3),
                                              dtype=np.uint8)
        y = np.zeros(16, np.int64)
        out, labels = pre((v, y))
        assert out.shape == (16, 4, 32, 32, 3)
        assert np.isfinite(np.asarray(out, dtype=np.float32)).all()


class TestTagNaming:
    def test_boost_types(self):
        loss = LossConfig(loss_type="Focal")
        train = TrainConfig(seed=42)
        assert tag_for("ViViT", 21, 3, loss, train, use_sampling=True).endswith(
            "Focal_RS_seed_42")
        drw = LossConfig(loss_type="Focal", use_drw=True)
        assert "RS_DRW" in tag_for("ViViT", 21, 3, drw, train, use_sampling=True)
        assert "Normal" in tag_for("ViViT", 21, 3, loss, train)


class TestModelSummary:
    def test_tabulate(self):
        import jax.numpy as jnp

        from kstar_tpu.config import MLSTMFCNConfig
        from kstar_tpu.models import build_0d_model
        from kstar_tpu.utils import model_summary

        m = build_0d_model("MLSTM_FCN", MLSTMFCNConfig(n_features=4, fcn_dim=8,
                                                       seq_len=6, lstm_dim=4))
        text = model_summary(m, jnp.zeros((1, 6, 4)), depth=2)
        assert "MLSTMFCN" in text

    def test_render_model_graph(self, tmp_path):
        import jax.numpy as jnp

        from kstar_tpu.config import MLSTMFCNConfig
        from kstar_tpu.models import build_0d_model
        from kstar_tpu.utils.summary import render_model_graph

        m = build_0d_model("MLSTM_FCN", MLSTMFCNConfig(n_features=4, fcn_dim=8,
                                                       seq_len=6, lstm_dim=4))
        out = str(tmp_path / "graph.png")
        path = render_model_graph(m, jnp.zeros((1, 6, 4)), save_path=out,
                                  depth=2)
        import os
        assert os.path.exists(path) and os.path.getsize(path) > 10_000


class TestCpuInit:
    def test_forced_cpu_init_matches_default(self):
        """The init-on-CPU fast path (batch-1 slice, eager init, single
        transfer) must produce the same param tree structure/shapes and the
        same values as the default path (same rng)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from kstar_tpu.config import OptimConfig, TransformerConfig
        from kstar_tpu.models import build_0d_model
        from kstar_tpu.train import create_train_state

        m = build_0d_model("Transformer", TransformerConfig(
            n_features=4, feature_dims=16, max_len=6, n_layers=1, n_heads=2,
            dim_feedforward=32, cls_dims=8))
        x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 6, 4)),
                        jnp.float32)
        rng = jax.random.key(7)
        st_cpu = create_train_state(m, x, rng, OptimConfig(), init_on_cpu=True)
        st_def = create_train_state(m, x, rng, OptimConfig(), init_on_cpu=False)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
            jax.device_get(st_cpu.params), jax.device_get(st_def.params))
        assert jax.tree.structure(st_cpu.opt_state) == jax.tree.structure(st_def.opt_state)
