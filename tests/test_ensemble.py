"""vmap'd multi-seed ensemble training (train/ensemble.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kstar_tpu.config import (LossConfig, MLSTMFCNConfig, OptimConfig, Schema,
                              TrainConfig)
from kstar_tpu.data import TSDataset, prepare_0d_dataset
from kstar_tpu.models import build_0d_model
from kstar_tpu.train import (create_ensemble_state, create_train_state,
                             fit_ensemble, load_checkpoint,
                             make_ensemble_step, make_train_step,
                             unstack_ensemble)

COLS = Schema.INPUT_FEATURES
SEEDS = (40, 41, 42)


@pytest.fixture(scope="module")
def ens_setup(tiny_dataset):
    shots, disrupt_df, ts_df = tiny_dataset
    df_train, df_valid, _, scaler = prepare_0d_dataset(ts_df, COLS, test_shot=None)
    mk = lambda df: TSDataset(df, disrupt_df, COLS, seq_len=21, dist=3, scaler=scaler)
    cfg = MLSTMFCNConfig(n_features=len(COLS), fcn_dim=16, seq_len=21,
                         lstm_dim=16, lstm_n_layers=1)
    return build_0d_model("MLSTM_FCN", cfg), mk(df_train), mk(df_valid)


def test_members_match_solo_runs(ens_setup):
    """Each ensemble member's trajectory == a solo run with that seed
    (SGD; same rng-from-(rng, step) stream, shared batches)."""
    model, train_ds, _ = ens_setup
    x, _ = train_ds.batch(np.arange(8))
    opt = OptimConfig(lr=1e-3, optimizer="SGD")
    loss_cfg = LossConfig(loss_type="Focal")
    w = jnp.ones(2); m = jnp.asarray([0.3, 0.1]); gb = jnp.zeros(3)

    rng = np.random.default_rng(0)
    batches = [train_ds.batch(rng.permutation(len(train_ds))[:8])
               for _ in range(3)]

    states = create_ensemble_state(model, jnp.asarray(x), SEEDS, opt)
    estep = make_ensemble_step(model, loss_cfg)
    ens_losses = []
    for b, y in batches:
        states, losses, _ = estep(states, jnp.asarray(b), jnp.asarray(y), w, m, gb)
        ens_losses.append(np.asarray(losses))

    step = make_train_step(model, loss_cfg)
    for i, seed in enumerate(SEEDS):
        solo = create_train_state(model, jnp.asarray(x), jax.random.key(seed), opt)
        for t, (b, y) in enumerate(batches):
            solo, loss, _ = step(solo, jnp.asarray(b), jnp.asarray(y), w, m, gb)
            np.testing.assert_allclose(float(loss), ens_losses[t][i], rtol=1e-5)
        member = unstack_ensemble(states, i)
        for a, b_ in zip(jax.tree.leaves(solo.params),
                         jax.tree.leaves(member.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-5, atol=1e-6)


def test_ensemble_scan_dispatch_matches_per_step(ens_setup, tmp_path):
    """steps_per_dispatch=2 (vmap x lax.scan) trains each member to the
    same trajectory as per-step dispatch (SGD; same rng/batch streams)."""
    from kstar_tpu.train.ensemble import make_ensemble_scan_steps

    model, train_ds, valid_ds = ens_setup
    x, _ = train_ds.batch(np.arange(8))
    opt = OptimConfig(lr=1e-3, optimizer="SGD")

    def run(k):
        states = create_ensemble_state(model, jnp.asarray(x), SEEDS, opt)
        cfg = TrainConfig(batch_size=8, num_epoch=2,
                          weight_dir=str(tmp_path / f"k{k}"),
                          early_stopping=False, verbose=0,
                          steps_per_dispatch=k)
        return fit_ensemble(model, states, SEEDS, train_ds, valid_ds, cfg,
                            LossConfig(loss_type="CE"), tag="scan")

    s1, h1 = run(1)
    s2, h2 = run(2)
    for a, b in zip(h1, h2):
        np.testing.assert_allclose(a.train_loss, b.train_loss, rtol=1e-5)
        np.testing.assert_allclose(a.valid_f1, b.valid_f1, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_fit_ensemble_histories_and_checkpoints(ens_setup, tmp_path):
    model, train_ds, valid_ds = ens_setup
    x, _ = train_ds.batch(np.arange(8))
    states = create_ensemble_state(model, jnp.asarray(x), SEEDS,
                                   OptimConfig(lr=1e-3))
    cfg = TrainConfig(batch_size=8, num_epoch=2, weight_dir=str(tmp_path),
                      early_stopping=False, verbose=0)
    states, hists = fit_ensemble(model, states, SEEDS, train_ds, valid_ds,
                                 cfg, LossConfig(loss_type="CE"), tag="ens")
    assert len(hists) == len(SEEDS)
    assert all(len(h.train_loss) == 2 for h in hists)
    assert all(np.isfinite(h.train_loss).all() for h in hists)
    # members genuinely differ (independent inits)
    p0 = jax.tree.leaves(unstack_ensemble(states, 0).params)[0]
    p1 = jax.tree.leaves(unstack_ensemble(states, 1).params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    for s in SEEDS:
        assert (tmp_path / f"ens_seed_{s}_last.ckpt").exists()
        assert (tmp_path / f"ens_seed_{s}_best.ckpt").exists()
    # checkpoint restores into a solo-state template
    solo = create_train_state(model, jnp.asarray(x), jax.random.key(0),
                              OptimConfig(lr=1e-3))
    restored = load_checkpoint(solo, str(tmp_path / f"ens_seed_40_best.ckpt"))
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored.params)[0]).shape,
        np.asarray(jax.tree.leaves(solo.params)[0]).shape)


def test_sharded_ensemble_matches_unsharded(ens_setup):
    """Ensemble axis sharded over the 8-device mesh == unsharded results
    (members are independent; GSPMD partitions without collectives)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from kstar_tpu.config import MeshConfig
    from kstar_tpu.parallel import make_mesh

    model, train_ds, _ = ens_setup
    x, _ = train_ds.batch(np.arange(8))
    opt = OptimConfig(lr=1e-3, optimizer="SGD")
    loss_cfg = LossConfig(loss_type="CE")
    w = jnp.ones(2); m = jnp.asarray([0.3, 0.1]); gb = jnp.zeros(3)
    seeds8 = tuple(range(40, 48))
    mesh = make_mesh(MeshConfig(data=8, model=1), jax.devices()[:8])

    b, y = train_ds.batch(np.arange(8))
    plain = create_ensemble_state(model, jnp.asarray(x), seeds8, opt)
    shard = create_ensemble_state(model, jnp.asarray(x), seeds8, opt, mesh=mesh)
    step = make_ensemble_step(model, loss_cfg)
    for _ in range(2):
        plain, l1, _ = step(plain, jnp.asarray(b), jnp.asarray(y), w, m, gb)
        shard, l2, _ = step(shard, jnp.asarray(b), jnp.asarray(y), w, m, gb)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5)
    for a, c in zip(jax.tree.leaves(plain.params), jax.tree.leaves(shard.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-5, atol=1e-6)
