"""Numerical parity vs the reference LSTM-based 0D models (MLSTM-FCN,
CnnLSTM) with shared weights. Torch LSTM packs gates [i, f, g, o] in
weight_ih/weight_hh; flax OptimizedLSTMCell keeps per-gate kernels with the
bias on the hidden projection (set to bias_ih + bias_hh)."""

import os

import numpy as np
import pytest

from parity_helpers import REF, stub_ref_deps, t2j

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not mounted")


@pytest.fixture(scope="module")
def ref_modules():
    stub_ref_deps()
    import importlib

    ml = importlib.import_module("src.models.MLSTM_FCN")
    cl = importlib.import_module("src.models.CnnLSTM")
    return ml, cl


def load_lstm_gates(cell_params, sd, prefix, reverse=False):
    """Copy one torch LSTM layer into a flax OptimizedLSTMCell param dict."""
    sfx = "_reverse" if reverse else ""
    w_ih = t2j(sd[f"{prefix}.weight_ih_l0{sfx}"])   # (4H, in)
    w_hh = t2j(sd[f"{prefix}.weight_hh_l0{sfx}"])   # (4H, H)
    b = t2j(sd[f"{prefix}.bias_ih_l0{sfx}"]) + t2j(sd[f"{prefix}.bias_hh_l0{sfx}"])
    H = w_hh.shape[1]
    gates = {"i": 0, "f": 1, "g": 2, "o": 3}
    for g, k in gates.items():
        cell_params[f"i{g}"]["kernel"] = w_ih[k * H:(k + 1) * H].T
        cell_params[f"h{g}"]["kernel"] = w_hh[k * H:(k + 1) * H].T
        cell_params[f"h{g}"]["bias"] = b[k * H:(k + 1) * H]


class TestMLSTMFCNParity:
    def test_logits_match_reference(self, ref_modules):
        import torch

        import jax
        import jax.numpy as jnp

        from kstar_tpu.models import MLSTMFCN

        ml, _ = ref_modules
        torch.manual_seed(0)
        F, L, FCN, LSTM = 18, 21, 16, 12
        ref = ml.MLSTM_FCN(n_features=F, fcn_dim=FCN, kernel_size=5, stride=1,
                           seq_len=L, lstm_dim=LSTM, lstm_n_layers=1,
                           lstm_bidirectional=True, lstm_dropout=0.0,
                           reduction=4, alpha=0.01, n_classes=2).eval()

        model = MLSTMFCN(n_features=F, fcn_dim=FCN, kernel_size=5, stride=1,
                         seq_len=L, lstm_dim=LSTM, lstm_n_layers=1,
                         lstm_bidirectional=True, lstm_dropout=0.0,
                         reduction=4, alpha=0.01, n_classes=2, noise_std=0.0)
        x = np.random.default_rng(0).normal(size=(4, L, F)).astype(np.float32)
        variables = model.init({"params": jax.random.key(0),
                                "noise": jax.random.key(1),
                                "dropout": jax.random.key(2)},
                               jnp.asarray(x), train=False)
        p = jax.tree.map(np.asarray, variables["params"])
        bs = jax.tree.map(np.asarray, variables["batch_stats"])
        sd = ref.state_dict()

        # FCN branch: fcn.0/.2 ConvBlocks, fcn.1/.3 SE blocks
        for blk, tpre in (("fcn1", "fcn.0"), ("fcn2", "fcn.2")):
            p[blk]["Conv_0"]["kernel"] = t2j(sd[f"{tpre}.conv.weight"]).transpose(2, 1, 0)
            p[blk]["Conv_0"]["bias"] = t2j(sd[f"{tpre}.conv.bias"])
            p[blk]["BatchNorm_0"]["scale"] = t2j(sd[f"{tpre}.bn.weight"])
            p[blk]["BatchNorm_0"]["bias"] = t2j(sd[f"{tpre}.bn.bias"])
            bs[blk]["BatchNorm_0"] = {"mean": t2j(sd[f"{tpre}.bn.running_mean"]),
                                      "var": t2j(sd[f"{tpre}.bn.running_var"])}
        for se, tpre in (("se1", "fcn.1"), ("se2", "fcn.3")):
            p[se]["Dense_0"]["kernel"] = t2j(sd[f"{tpre}.fc.0.weight"]).T
            p[se]["Dense_1"]["kernel"] = t2j(sd[f"{tpre}.fc.2.weight"]).T

        # RNN branch
        load_lstm_gates(p["rnn"]["OptimizedLSTMCell_0"], sd, "rnn.lstm")
        load_lstm_gates(p["rnn"]["OptimizedLSTMCell_1"], sd, "rnn.lstm", reverse=True)
        p["pool"]["w_s1"]["kernel"] = t2j(sd["rnn.w_s1.weight"]).T
        p["pool"]["w_s1"]["bias"] = t2j(sd["rnn.w_s1.bias"])
        p["pool"]["w_s2"]["kernel"] = t2j(sd["rnn.w_s2.weight"]).T
        p["pool"]["w_s2"]["bias"] = t2j(sd["rnn.w_s2.bias"])

        p["converter"]["kernel"] = t2j(sd["converter.weight"]).T
        p["converter"]["bias"] = t2j(sd["converter.bias"])
        p["head"]["fc1"]["kernel"] = t2j(sd["classifier.0.weight"]).T
        p["head"]["fc1"]["bias"] = t2j(sd["classifier.0.bias"])
        p["head"]["norm"]["scale"] = t2j(sd["classifier.1.weight"])
        p["head"]["norm"]["bias"] = t2j(sd["classifier.1.bias"])
        bs["head"]["norm"] = {"mean": t2j(sd["classifier.1.running_mean"]),
                              "var": t2j(sd["classifier.1.running_var"])}
        p["head"]["fc2"]["kernel"] = t2j(sd["classifier.3.weight"]).T
        p["head"]["fc2"]["bias"] = t2j(sd["classifier.3.bias"])

        out_jax = model.apply({"params": p, "batch_stats": bs},
                              jnp.asarray(x), train=False)
        import torch as _t
        with _t.no_grad():
            out_ref = ref(_t.from_numpy(x))
        np.testing.assert_allclose(np.asarray(out_jax), t2j(out_ref),
                                   rtol=3e-4, atol=3e-4)


class TestCnnLSTMParity:
    def test_logits_match_reference(self, ref_modules):
        import torch

        import jax
        import jax.numpy as jnp

        from kstar_tpu.models import CnnLSTM

        _, cl = ref_modules
        torch.manual_seed(0)
        F, L, CD, LD = 18, 21, 8, 12
        ref = cl.CnnLSTM(seq_len=L, n_features=F, conv_dim=CD, conv_kernel=3,
                         conv_stride=1, conv_padding=1, lstm_dim=LD,
                         n_layers=1, bidirectional=True, n_classes=2).eval()

        model = CnnLSTM(seq_len=L, n_features=F, conv_dim=CD, conv_kernel=3,
                        conv_stride=1, conv_padding=1, lstm_dim=LD,
                        n_layers=1, bidirectional=True, n_classes=2,
                        noise_std=0.0)
        x = np.random.default_rng(0).normal(size=(4, L, F)).astype(np.float32)
        variables = model.init({"params": jax.random.key(0),
                                "noise": jax.random.key(1),
                                "dropout": jax.random.key(2)},
                               jnp.asarray(x), train=False)
        p = jax.tree.map(np.asarray, variables["params"])
        bs = jax.tree.map(np.asarray, variables["batch_stats"])
        sd = ref.state_dict()

        p["conv1"]["kernel"] = t2j(sd["conv.0.weight"]).transpose(2, 1, 0)
        p["conv1"]["bias"] = t2j(sd["conv.0.bias"])
        p["conv2"]["kernel"] = t2j(sd["conv.1.weight"]).transpose(2, 1, 0)
        p["conv2"]["bias"] = t2j(sd["conv.1.bias"])
        p["bn"]["scale"] = t2j(sd["conv.2.weight"])
        p["bn"]["bias"] = t2j(sd["conv.2.bias"])
        bs["bn"] = {"mean": t2j(sd["conv.2.running_mean"]),
                    "var": t2j(sd["conv.2.running_var"])}

        load_lstm_gates(p["lstm"]["OptimizedLSTMCell_0"], sd, "lstm")
        load_lstm_gates(p["lstm"]["OptimizedLSTMCell_1"], sd, "lstm", reverse=True)

        p["pool"]["w_s1"]["kernel"] = t2j(sd["w_s1.weight"]).T
        p["pool"]["w_s1"]["bias"] = t2j(sd["w_s1.bias"])
        p["pool"]["w_s2"]["kernel"] = t2j(sd["w_s2.weight"]).T
        p["pool"]["w_s2"]["bias"] = t2j(sd["w_s2.bias"])

        p["head"]["fc1"]["kernel"] = t2j(sd["classifier.0.weight"]).T
        p["head"]["fc1"]["bias"] = t2j(sd["classifier.0.bias"])
        p["head"]["norm"]["scale"] = t2j(sd["classifier.1.weight"])
        p["head"]["norm"]["bias"] = t2j(sd["classifier.1.bias"])
        bs["head"]["norm"] = {"mean": t2j(sd["classifier.1.running_mean"]),
                              "var": t2j(sd["classifier.1.running_var"])}
        p["head"]["fc2"]["kernel"] = t2j(sd["classifier.3.weight"]).T
        p["head"]["fc2"]["bias"] = t2j(sd["classifier.3.bias"])

        out_jax = model.apply({"params": p, "batch_stats": bs},
                              jnp.asarray(x), train=False)
        with torch.no_grad():
            out_ref = ref(torch.from_numpy(x))
        np.testing.assert_allclose(np.asarray(out_jax), t2j(out_ref),
                                   rtol=3e-4, atol=3e-4)
