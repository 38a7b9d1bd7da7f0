"""Loss parity tests against hand-computed / torch-semantics expectations."""

import jax.numpy as jnp
import numpy as np
import pytest

from kstar_tpu import losses as L


def _np_softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


@pytest.fixture
def batch():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(16, 2)).astype(np.float32)
    labels = rng.integers(0, 2, size=16)
    return jnp.asarray(logits), jnp.asarray(labels), logits, labels


class TestCE:
    def test_sum_reduction(self, batch):
        jl, jy, nl, ny = batch
        p = _np_softmax(nl)
        expected = -np.log(p[np.arange(16), ny]).sum()
        got = float(L.ce_loss(jl, jy))
        assert np.isclose(got, expected, rtol=1e-5)

    def test_weighted(self, batch):
        jl, jy, nl, ny = batch
        w = np.array([2.0, 0.5], np.float32)
        p = _np_softmax(nl)
        expected = (-np.log(p[np.arange(16), ny]) * w[ny]).sum()
        got = float(L.ce_loss(jl, jy, jnp.asarray(w)))
        assert np.isclose(got, expected, rtol=1e-5)


class TestFocal:
    def test_matches_formula(self, batch):
        """sum(alpha * (1-p)^gamma * CE), p = exp(-CE) (reference src/loss.py:25-34)."""
        jl, jy, nl, ny = batch
        w = np.array([1.5, 0.75], np.float32)
        gamma = 2.0
        ce = -np.log(_np_softmax(nl)[np.arange(16), ny])
        p = np.exp(-ce)
        expected = (w[ny] * (1 - p) ** gamma * ce).sum()
        got = float(L.focal_loss(jl, jy, jnp.asarray(w), gamma))
        assert np.isclose(got, expected, rtol=1e-5)

    def test_gamma_zero_equals_weighted_ce(self, batch):
        jl, jy, _, _ = batch
        w = jnp.asarray([1.0, 1.0])
        assert np.isclose(float(L.focal_loss(jl, jy, w, 0.0)),
                          float(L.ce_loss(jl, jy, w)), rtol=1e-5)


class TestLDAM:
    def test_margins(self):
        """m_c = max_m * n_c^-(1/4) / max(n^-(1/4)) (reference src/loss.py:52-56)."""
        m = L.ldam_margins(np.array([10, 1000]), max_m=0.5)
        assert np.isclose(m[0], 0.5)
        assert np.isclose(m[1], 0.5 * (1000 ** -0.25) / (10 ** -0.25))

    def test_margin_shifts_true_class(self, batch):
        jl, jy, nl, ny = batch
        m = jnp.asarray([0.5, 0.1], jnp.float32)
        s = 30.0
        x_m = nl.copy()
        x_m[np.arange(16), ny] -= np.asarray(m)[ny]
        ce = -np.log(_np_softmax(s * x_m)[np.arange(16), ny])
        expected = ce.mean()
        got = float(L.ldam_loss(jl, jy, m, s))
        assert np.isclose(got, expected, rtol=1e-4)


class TestReweighting:
    def test_inverse_freq(self):
        w = L.inverse_freq_weights(np.array([100, 900]))
        assert w[0] > w[1]
        assert np.isclose(w.sum(), 2.0)

    def test_drw_schedule(self):
        counts = np.array([100, 900])
        w0 = L.drw_weights(0, 100, counts, beta=0.25)
        np.testing.assert_allclose(w0, [1.0, 1.0])  # beta=0 -> uniform
        w_late = L.drw_weights(99, 100, counts, beta=0.3333)
        assert w_late[0] > w_late[1]  # late epochs favor the minority class


class TestGradientBlending:
    def test_weighted_sum(self, batch):
        jl, jy, _, _ = batch
        gb_w = jnp.asarray([0.1, 0.4, 0.5])
        got = float(L.gradient_blending_loss(jl, jl, jl, jy, gb_w, loss_type="CE"))
        expected = float(L.ce_loss(jl, jy))
        assert np.isclose(got, expected, rtol=1e-5)

    def test_estimate_normalizes(self):
        tr = {"video": [1.0, 0.5], "0D": [1.0, 0.8], "multi": [1.0, 0.3]}
        va = {"video": [1.1, 0.9], "0D": [1.1, 1.0], "multi": [1.1, 0.7]}
        ws = L.estimate_gb_weights(tr, va)
        assert np.isclose(sum(ws.values()), 1.0)
        assert set(ws) == {"video", "0D", "multi"}
        assert all(v >= 0 for v in ws.values())

    def test_estimate_mixed_signs_never_negative(self):
        """One stream's valid loss rises while the others fall: the
        reference's w/sum(w) hands the minority-sign stream a NEGATIVE
        blending weight (the objective then maximizes its loss); the
        dominant side must normalize to 1 with the minority at 0."""
        tr = {"video": [1.0, 0.9], "0D": [1.0, 0.8], "multi": [1.0, 0.7]}
        va = {"video": [1.0, 1.4],                     # worsens (G > 0)
              "0D": [1.2, 0.9], "multi": [1.2, 0.8]}   # improve (G < 0)
        ws = L.estimate_gb_weights(tr, va)
        assert np.isclose(sum(ws.values()), 1.0)
        assert all(v >= 0 for v in ws.values())
        assert ws["video"] == 0.0
        assert ws["multi"] > 0 and ws["0D"] > 0


class TestCCA:
    def test_correlated_views_lower_loss(self):
        rng = np.random.default_rng(0)
        z = rng.normal(size=(64, 8)).astype(np.float32)
        h1 = jnp.asarray(z + 0.01 * rng.normal(size=(64, 8)))
        h2 = jnp.asarray(z + 0.01 * rng.normal(size=(64, 8)))
        h3 = jnp.asarray(rng.normal(size=(64, 8)).astype(np.float32))
        corr_loss = float(L.cca_loss(h1, h2, out_dim=4))
        rand_loss = float(L.cca_loss(h1, h3, out_dim=4))
        assert corr_loss < rand_loss  # more correlation -> more negative
