"""End-to-end slice: synthetic 0D data -> MLSTM-FCN -> fit -> eval -> infer,
plus checkpoint roundtrip and data-parallel sharded step on the 8-device
CPU mesh."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kstar_tpu.config import (LossConfig, MeshConfig, MLSTMFCNConfig,
                              OptimConfig, Schema, TrainConfig)
from kstar_tpu.data import ImbalancedSampler, TSDataset, prepare_0d_dataset
from kstar_tpu.models import build_0d_model
from kstar_tpu.train import (create_train_state, fit, load_checkpoint,
                             make_eval_step, run_eval_epoch, save_checkpoint)

COLS = Schema.INPUT_FEATURES


@pytest.fixture(scope="module")
def ts_setup(request):
    from kstar_tpu.data import synthetic
    shots, disrupt_df, ts_df = synthetic.make_dataset(
        n_shots=8, n_frames=192, height=32, width=32, seed=0)
    df_train, df_valid, df_test, scaler = prepare_0d_dataset(ts_df, COLS, test_shot=None)
    mk = lambda df: TSDataset(df, disrupt_df, COLS, seq_len=21, dist=3, scaler=scaler)
    return mk(df_train), mk(df_valid), mk(df_test)


@pytest.fixture(scope="module")
def small_model():
    cfg = MLSTMFCNConfig(n_features=len(COLS), fcn_dim=16, seq_len=21,
                         lstm_dim=16, lstm_n_layers=1)
    return build_0d_model("MLSTM_FCN", cfg)


class TestFit:
    def test_two_epochs_and_checkpoints(self, ts_setup, small_model, tmp_path):
        train_ds, valid_ds, test_ds = ts_setup
        x, _ = train_ds.batch(np.arange(16))
        state = create_train_state(small_model, jnp.asarray(x), jax.random.key(0),
                                   OptimConfig(lr=1e-3))
        cfg = TrainConfig(batch_size=16, num_epoch=2, weight_dir=str(tmp_path),
                          early_stopping=False, verbose=0)
        loss_cfg = LossConfig(loss_type="Focal", use_drw=True)
        sampler = ImbalancedSampler(train_ds.labels)

        state, hist = fit(small_model, state, train_ds, valid_ds, cfg, loss_cfg,
                          tag="test", sampler=sampler)
        assert len(hist.train_loss) == 2
        assert all(np.isfinite(hist.train_loss))
        assert os.path.exists(tmp_path / "test_last.ckpt")
        assert os.path.exists(tmp_path / "test_best.ckpt")

        # checkpoint roundtrip
        restored = load_checkpoint(state, str(tmp_path / "test_last.ckpt"))
        a = jax.tree.leaves(restored.params)[0]
        b = jax.tree.leaves(state.params)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # eval on test split collects probs
        eval_step = make_eval_step(small_model, loss_cfg)
        w = jnp.ones(2); m = jnp.asarray([0.3, 0.1]); gb = jnp.zeros(3)
        loss, acc, f1, (probs, labels) = run_eval_epoch(
            eval_step, state, test_ds, 16, w, m, gb, collect_probs=True)
        assert probs.shape[1] == 2 and len(labels) == len(test_ds)
        assert np.isfinite(probs).all()


class TestContinuousInference0D:
    def test_prob_curve_shapes(self, ts_setup, small_model):
        from kstar_tpu.data import synthetic
        from kstar_tpu.data.splits import Scaler
        from kstar_tpu.infer import alarm_times, predict_0d_shot

        shot = synthetic.make_shot(shot=40000, n_frames=192, height=32, width=32)
        values = shot.ts[COLS].to_numpy(np.float32)
        times = shot.ts["time"].to_numpy()

        x = jnp.zeros((4, 21, len(COLS)), jnp.float32)
        state = create_train_state(small_model, x, jax.random.key(0), OptimConfig())
        time_x, probs = predict_0d_shot(
            small_model, state.params, state.batch_stats, values, times,
            Scaler("Robust"), seq_len=21, dist=3, batch_size=32)
        assert len(time_x) == len(probs)
        assert len(probs) > 0
        assert probs.min() >= 0.0 and probs.max() <= 1.0
        # alarm machinery doesn't crash
        alarm_times(time_x, probs, threshold=0.5)


class TestDataParallel:
    def test_sharded_step_8dev(self, ts_setup, small_model):
        from kstar_tpu.parallel import make_dp_step_fns, make_mesh, replicate_state

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        train_ds, valid_ds, _ = ts_setup
        mesh = make_mesh(MeshConfig(data=8, model=1), jax.devices()[:8])
        x, y = train_ds.batch(np.arange(16))
        state = create_train_state(small_model, jnp.asarray(x), jax.random.key(0),
                                   OptimConfig(lr=1e-3))
        state = replicate_state(state, mesh)
        train_step, eval_step, put = make_dp_step_fns(
            small_model, LossConfig(loss_type="Focal"), mesh)
        batch, labels = put((x, y))
        w = jnp.ones(2); m = jnp.asarray([0.3, 0.1]); gb = jnp.zeros(3)
        state, loss, preds = train_step(state, batch, labels, w, m, gb)
        assert np.isfinite(float(loss))
        assert preds.shape == (16,)


class TestGraftEntry:
    def test_dryrun_multichip(self):
        import sys
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        import __graft_entry__ as ge

        ge.dryrun_multichip(min(8, len(jax.devices())))
