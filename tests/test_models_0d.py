"""0D model invariants (the reference's torcheck intents, test/test_model.py:
finite outputs, raw logits, params update after a step) on synthetic data."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kstar_tpu.config import (CnnLSTMConfig, LossConfig, MLSTMFCNConfig,
                              OptimConfig, TransformerConfig)
from kstar_tpu.models import build_0d_model
from kstar_tpu.train import create_train_state, make_train_step

B, T, F = 8, 21, 18

SMALL = {
    "Transformer": TransformerConfig(n_features=F, feature_dims=32, n_layers=1,
                                     n_heads=4, dim_feedforward=64, cls_dims=16, max_len=T),
    "CnnLSTM": CnnLSTMConfig(seq_len=T, n_features=F, conv_dim=16, lstm_dim=16, n_layers=1),
    "MLSTM_FCN": MLSTMFCNConfig(n_features=F, fcn_dim=16, seq_len=T, lstm_dim=16),
}


@pytest.fixture
def xy():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, F)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 2, B))
    return x, y


@pytest.mark.parametrize("name", list(SMALL))
class TestModels0D:
    def test_forward_shapes_and_logits(self, name, xy):
        x, y = xy
        model = build_0d_model(name, SMALL[name])
        variables = model.init(
            {"params": jax.random.key(0), "noise": jax.random.key(1),
             "dropout": jax.random.key(2)}, x, train=False)
        out = model.apply(variables, x, train=False)
        assert out.shape == (B, 2)
        assert np.isfinite(np.asarray(out)).all()
        # raw logits, not probabilities
        assert (np.asarray(out).max() > 1.0) or (np.asarray(out).min() < 0.0)

    def test_encode_latent(self, name, xy):
        x, _ = xy
        model = build_0d_model(name, SMALL[name])
        variables = model.init(
            {"params": jax.random.key(0), "noise": jax.random.key(1),
             "dropout": jax.random.key(2)}, x, train=False)
        h = model.apply(variables, x, method="encode")
        assert h.ndim == 2 and h.shape[0] == B
        assert np.isfinite(np.asarray(h)).all()

    @pytest.mark.parametrize("loss_type", ["CE", "Focal", "LDAM"])
    def test_train_step_updates_params(self, name, xy, loss_type):
        x, y = xy
        model = build_0d_model(name, SMALL[name])
        state = create_train_state(model, x, jax.random.key(0), OptimConfig(lr=1e-3))
        step = make_train_step(model, LossConfig(loss_type=loss_type))
        w = jnp.ones(2); m = jnp.asarray([0.3, 0.1]); gb = jnp.zeros(3)
        old = jax.tree.map(lambda p: np.asarray(p).copy(), state.params)
        state, loss, preds = step(state, x, y, w, m, gb)
        assert np.isfinite(float(loss))
        changed = jax.tree.leaves(jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a) - b).max()) > 0,
            state.params, old))
        assert any(changed)

    def test_nan_guard_keeps_state(self, name, xy):
        x, y = xy
        model = build_0d_model(name, SMALL[name])
        state = create_train_state(model, x, jax.random.key(0), OptimConfig(lr=1e-3))
        step = make_train_step(model, LossConfig(loss_type="CE"))
        w = jnp.ones(2); m = jnp.asarray([0.3, 0.1]); gb = jnp.zeros(3)
        old = jax.tree.map(lambda p: np.asarray(p).copy(), state.params)
        x_bad = x.at[0, 0, 0].set(jnp.nan)
        state, loss, _ = step(state, x_bad, y, w, m, gb)
        assert not np.isfinite(float(loss))
        unchanged = jax.tree.leaves(jax.tree.map(
            lambda a, b: np.array_equal(np.asarray(a), b), state.params, old))
        assert all(unchanged)
