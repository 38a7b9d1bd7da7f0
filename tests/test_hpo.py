"""ASHA successive-halving unit tests with a synthetic trainable."""

import numpy as np
import pytest

from kstar_tpu.train.hpo import (choice, loguniform, randint, run_asha,
                                 sample_config, uniform)


class TestSamplers:
    def test_ranges(self):
        rng = np.random.default_rng(0)
        space = {"lr": loguniform(1e-4, 1e-2), "b": choice([1, 2, 4]),
                 "u": uniform(0, 1), "n": randint(1, 5)}
        for _ in range(50):
            c = sample_config(space, rng)
            assert 1e-4 <= c["lr"] <= 1e-2
            assert c["b"] in (1, 2, 4)
            assert 0 <= c["u"] <= 1
            assert 1 <= c["n"] < 5


class TestASHA:
    def test_promotes_best_and_respects_budget(self):
        calls = {"total_epochs": 0}

        def trainable(config, n_epochs, state):
            # score converges toward the config's 'quality'; resumable state
            # carries epochs done
            done = state or 0
            scores = [config["quality"] * (1 - 0.5 ** (done + e + 1))
                      for e in range(n_epochs)]
            calls["total_epochs"] += n_epochs
            return done + n_epochs, scores

        space = {"quality": uniform(0.1, 1.0)}
        best, trials = run_asha(trainable, space, n_trials=8, max_epochs=8,
                                grace_period=2, reduction_factor=2, seed=0)

        qualities = [t.config["quality"] for t in trials]
        assert best.config["quality"] == max(qualities)
        # only survivors train to the full budget
        full = [t for t in trials if t.epochs_done >= 8]
        assert 1 <= len(full) <= 2
        # successive halving trains far less than n_trials * max_epochs
        assert calls["total_epochs"] < 8 * 8

    def test_resume_carries_state(self):
        seen_states = []

        def trainable(config, n_epochs, state):
            seen_states.append(state)
            return (state or 0) + n_epochs, [0.5] * n_epochs

        run_asha(trainable, {"x": uniform(0, 1)}, n_trials=2, max_epochs=4,
                 grace_period=2, reduction_factor=2, seed=0)
        # survivors resume with their accumulated epoch count, not None
        assert any(s == 2 for s in seen_states)


class TestOrbaxCheckpoint:
    def test_roundtrip(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from kstar_tpu.config import MLSTMFCNConfig, OptimConfig
        from kstar_tpu.models import build_0d_model
        from kstar_tpu.train import create_train_state
        from kstar_tpu.train.state import (load_checkpoint_orbax,
                                           save_checkpoint_orbax)

        m = build_0d_model("MLSTM_FCN", MLSTMFCNConfig(n_features=4, fcn_dim=8,
                                                       seq_len=6, lstm_dim=4))
        x = jnp.zeros((2, 6, 4))
        s = create_train_state(m, x, jax.random.key(0), OptimConfig())
        path = str(tmp_path / "ckpt")
        save_checkpoint_orbax(s, path)
        s2 = load_checkpoint_orbax(s, path)
        for a, b in zip(jax.tree.leaves(s.params), jax.tree.leaves(s2.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestParallelASHA:
    def test_parallel_matches_serial_and_spreads_devices(self):
        import jax
        import time

        seen_devices = []

        def trainable(config, n_epochs, state, device=None):
            seen_devices.append(device)
            done = state or 0
            time.sleep(0.02)
            scores = [config["quality"] * (1 - 0.5 ** (done + e + 1))
                      for e in range(n_epochs)]
            return done + n_epochs, scores

        def trainable_serial(config, n_epochs, state):
            done = state or 0
            scores = [config["quality"] * (1 - 0.5 ** (done + e + 1))
                      for e in range(n_epochs)]
            return done + n_epochs, scores

        space = {"quality": uniform(0.1, 1.0)}
        best_s, trials_s = run_asha(trainable_serial, space, n_trials=8,
                                    max_epochs=8, grace_period=2,
                                    reduction_factor=2, seed=0)
        best_p, trials_p = run_asha(trainable, space, n_trials=8, max_epochs=8,
                                    grace_period=2, reduction_factor=2, seed=0,
                                    n_workers=4, devices=jax.devices())

        assert best_p.config == best_s.config
        for a, b in zip(trials_s, trials_p):
            assert a.scores == b.scores and a.epochs_done == b.epochs_done
        # trials actually spread over devices
        if len(jax.devices()) > 1:
            assert len({str(d) for d in seen_devices if d is not None}) > 1
        # halving demonstrated: at least two distinct rung budgets
        assert len({t.epochs_done for t in trials_p}) >= 2
