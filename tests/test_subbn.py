"""SubBatchNorm golden parity vs the reference SubBatchNorm3d
(src/models/resnet.py:11-61) plus the multigrid long-cycle reset
(:267-273) and backbone integration."""

import os

import numpy as np
import pytest

from parity_helpers import REF, stub_ref_deps, t2j

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not mounted")


def _ref_module(num_splits, c):
    stub_ref_deps()
    import importlib

    import torch

    rn = importlib.import_module("src.models.resnet")
    torch.manual_seed(0)
    m = rn.SubBatchNorm3d(num_splits, num_features=c, affine=True)
    with torch.no_grad():
        m.weight.copy_(torch.rand(c) + 0.5)
        m.bias.copy_(torch.rand(c) - 0.5)
    return m


def _my_variables(ref, s, c):
    import jax.numpy as jnp

    return {
        "params": {"scale": jnp.asarray(t2j(ref.weight)),
                   "bias": jnp.asarray(t2j(ref.bias))},
        "batch_stats": {
            "split_mean": jnp.asarray(t2j(ref.split_bn.running_mean)).reshape(s, c),
            "split_var": jnp.asarray(t2j(ref.split_bn.running_var)).reshape(s, c),
            "mean": jnp.asarray(t2j(ref.bn.running_mean)),
            "var": jnp.asarray(t2j(ref.bn.running_var)),
        },
    }


class TestSubBatchNormParity:
    @pytest.mark.parametrize("num_splits", [1, 2, 4])
    def test_train_forward_and_running_stats(self, num_splits):
        import torch

        import jax.numpy as jnp

        from kstar_tpu.models import SubBatchNorm

        n, c, t, h, w = 8, 6, 2, 4, 4
        ref = _ref_module(num_splits, c).train()
        rng = np.random.default_rng(1)
        # two steps so the running-stat update rule (momentum + unbiased
        # running var) is exercised from a non-initial state too
        xs = [rng.normal(size=(n, c, t, h, w)).astype(np.float32) for _ in range(2)]

        model = SubBatchNorm(num_splits=num_splits)
        variables = _my_variables(ref, num_splits, c)
        for x in xs:
            ref_y = t2j(ref(torch.from_numpy(x)))
            x_j = jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))  # NCTHW->NTHWC
            y, updates = model.apply(variables, x_j, train=True,
                                     mutable=["batch_stats"])
            variables = {"params": variables["params"], **updates}
            np.testing.assert_allclose(
                np.transpose(np.asarray(y), (0, 4, 1, 2, 3)), ref_y,
                rtol=2e-5, atol=2e-5)

        np.testing.assert_allclose(
            np.asarray(variables["batch_stats"]["split_mean"]).ravel(),
            t2j(ref.split_bn.running_mean), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(variables["batch_stats"]["split_var"]).ravel(),
            t2j(ref.split_bn.running_var), rtol=1e-5, atol=1e-6)

    def test_aggregate_and_eval_forward(self):
        import torch

        import jax.numpy as jnp

        from kstar_tpu.models import SubBatchNorm, aggregate_subbn_stats

        s, n, c = 4, 8, 6
        ref = _ref_module(s, c).train()
        rng = np.random.default_rng(2)
        x = rng.normal(size=(n, c, 2, 4, 4)).astype(np.float32)

        model = SubBatchNorm(num_splits=s)
        variables = _my_variables(ref, s, c)
        ref(torch.from_numpy(x))
        _, updates = model.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1))),
                                 train=True, mutable=["batch_stats"])
        variables = {"params": variables["params"], **updates}

        ref.aggregate_stats()
        # wrap so the walker sees the same nested layout a real model has
        nested = {"params": {"block": variables["params"]},
                  "batch_stats": {"block": variables["batch_stats"]}}
        nested = aggregate_subbn_stats(nested)
        np.testing.assert_allclose(np.asarray(nested["batch_stats"]["block"]["mean"]),
                                   t2j(ref.bn.running_mean), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(nested["batch_stats"]["block"]["var"]),
                                   t2j(ref.bn.running_var), rtol=1e-5, atol=1e-6)

        ref.eval()
        x2 = rng.normal(size=(n, c, 2, 4, 4)).astype(np.float32)
        ref_y = t2j(ref(torch.from_numpy(x2)))
        y, _ = model.apply({"params": variables["params"],
                            "batch_stats": nested["batch_stats"]["block"]},
                           jnp.asarray(np.transpose(x2, (0, 2, 3, 4, 1))),
                           train=False, mutable=[])
        np.testing.assert_allclose(np.transpose(np.asarray(y), (0, 4, 1, 2, 3)),
                                   ref_y, rtol=2e-5, atol=2e-5)

    def test_long_cycle_reset_matches_reference(self):
        """reference update_bn_splits_long_cycle: fresh split_bn at
        base*scale splits, affine + aggregated stats kept."""
        import torch

        import jax.numpy as jnp

        from kstar_tpu.models import SubBatchNorm, reset_bn_splits_long_cycle

        base, scale, c, n = 2, 2, 6, 8
        ref = _ref_module(base, c).train()
        x = np.random.default_rng(3).normal(size=(n, c, 2, 4, 4)).astype(np.float32)
        ref(torch.from_numpy(x))

        variables = _my_variables(ref, base, c)
        model0 = SubBatchNorm(num_splits=base)
        _, updates = model0.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1))),
                                  train=True, mutable=["batch_stats"])
        variables = {"params": variables["params"], **updates}

        # reference-style long-cycle update on the torch module
        import torch.nn as tnn
        new_splits = base * scale
        ref.num_splits = new_splits
        ref.split_bn = tnn.BatchNorm3d(num_features=c * new_splits, affine=False)

        variables = reset_bn_splits_long_cycle(variables, new_splits)
        assert variables["batch_stats"]["split_mean"].shape == (new_splits, c)
        np.testing.assert_array_equal(np.asarray(variables["batch_stats"]["split_mean"]).ravel(),
                                      t2j(ref.split_bn.running_mean))
        np.testing.assert_array_equal(np.asarray(variables["batch_stats"]["split_var"]).ravel(),
                                      t2j(ref.split_bn.running_var))

        # the rebuilt model at the new split count trains from the reset state
        # and stays in lockstep with torch
        model1 = SubBatchNorm(num_splits=new_splits)
        x2 = np.random.default_rng(4).normal(size=(n, c, 2, 4, 4)).astype(np.float32)
        ref_y = t2j(ref(torch.from_numpy(x2)))
        y, _ = model1.apply(variables, jnp.asarray(np.transpose(x2, (0, 2, 3, 4, 1))),
                            train=True, mutable=["batch_stats"])
        np.testing.assert_allclose(np.transpose(np.asarray(y), (0, 4, 1, 2, 3)),
                                   ref_y, rtol=2e-5, atol=2e-5)


class TestBackboneIntegration:
    def test_slowfast_with_bn_splits(self):
        """bn_splits threads to every block BN; stem/shortcut stay plain BN
        (reference swaps only bn1-3, src/models/resnet.py:129-141)."""
        import jax
        import jax.numpy as jnp

        from kstar_tpu.models import SlowFast

        model = SlowFast(image_size=32, n_frames=8, layers=(1, 1, 1, 1),
                         alpha=4, base_bn_splits=2)
        x = jnp.zeros((4, 8, 32, 32, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x, train=True)
        flat = jax.tree_util.tree_flatten_with_path(variables["batch_stats"])[0]
        paths = ["/".join(str(getattr(k, "key", k)) for k in path)
                 for path, _ in flat]
        assert any("split_mean" in p for p in paths)
        assert any("stem/bn/mean" in p for p in paths)        # stem stays plain
        assert any("shortcut_bn" in p for p in paths)          # shortcut stays plain
        assert not any("stem" in p and "split" in p for p in paths)

        y, updates = model.apply(variables, x, train=True,
                                 mutable=["batch_stats"])
        assert y.shape == (4, 2)
        assert np.isfinite(np.asarray(y)).all()


class TestCLIRoundtrip:
    def test_train_and_reload_with_bn_splits(self, tmp_path):
        """SlowFast --bn_splits 2 trains via the CLI (aggregation before each
        eval epoch persists into the checkpoint) and evaluate_model reloads
        the SubBatchNorm variable tree with the mirrored flag."""
        import os
        import subprocess
        import sys

        env = dict(os.environ, JAX_PLATFORMS="cpu")
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        hparams = ["--synthetic", "--synthetic_shots", "6",
                   "--synthetic_frames", "64", "--batch_size", "8",
                   "--image_size", "32", "--seq_len", "8",
                   "--bn_splits", "2",
                   "--weight_dir", str(tmp_path / "w"),
                   "--save_dir", str(tmp_path / "r")]
        r = subprocess.run(
            [sys.executable, "-m", "kstar_tpu.cli.train_vision",
             "--model", "SlowFast", "--num_epoch", "1", "--skip_extras",
             *hparams],
            cwd=root, env=env, capture_output=True, text=True, timeout=1200)
        assert r.returncode == 0, r.stderr[-3000:]

        r = subprocess.run(
            [sys.executable, "-m", "kstar_tpu.cli.evaluate_model",
             "--kind", "vision", "--model", "SlowFast", *hparams],
            cwd=root, env=env, capture_output=True, text=True, timeout=1200)
        assert r.returncode == 0, r.stderr[-3000:]
        assert "macro-F1" in r.stdout
