"""Numerical parity vs the reference TFN (Tensor Fusion Network) and
MultiModalModel (concat fusion) with shared weights — completes the parity
story across the fusion family (encoders are covered by the per-model
parity tests)."""

import os

import numpy as np
import pytest

from parity_helpers import REF, load_ts_encoder, load_vivit_encoder, stub_ref_deps, t2j

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not mounted")

H, P, T, D, DEPTH = 32, 8, 6, 32, 1
F, NL = 18, 1

VIVIT_KW = dict(image_size=H, patch_size=P, n_frames=T, dim=D, depth=DEPTH,
                n_heads=2, d_head=16, scale_dim=2, dropout=0.0,
                embedd_dropout=0.0)
TS_KW = dict(n_features=F, feature_dims=D, max_len=T, n_layers=NL, n_heads=4,
             dim_feedforward=64, dropout=0.0)

REF_VIVIT_KW = dict(image_size=H, patch_size=P, n_frames=T, dim=D, depth=DEPTH,
                    n_heads=2, d_head=16, scale_dim=2, dropout=0.0,
                    embedd_dropout=0.0, in_channels=3, pool="cls")
REF_TS_KW = dict(n_features=F, kernel_size=5, feature_dims=D, max_len=T,
                 n_layers=NL, n_heads=4, dim_feedforward=64, dropout=0.0)


@pytest.fixture(scope="module")
def ref_mm():
    stub_ref_deps()
    import importlib

    return importlib.import_module("src.models.MultiModal")


def _init_mine(cls):
    import jax
    import jax.numpy as jnp

    model = cls(vivit_kwargs=dict(VIVIT_KW), ts_kwargs=dict(TS_KW, kernel_size=5))
    x_v = np.random.default_rng(0).normal(size=(2, T, H, H, 3)).astype(np.float32)
    x_t = np.random.default_rng(1).normal(size=(2, T, F)).astype(np.float32)
    variables = model.init({"params": jax.random.key(0),
                            "noise": jax.random.key(1),
                            "dropout": jax.random.key(2)},
                           jnp.asarray(x_v), jnp.asarray(x_t), train=False)
    p = jax.tree.map(np.asarray, variables["params"])
    bs = jax.tree.map(np.asarray, variables.get("batch_stats", {}))
    return model, p, bs, x_v, x_t


class TestTFNParity:
    def test_logits_match_reference(self, ref_mm):
        import torch

        import jax.numpy as jnp

        from kstar_tpu.models import TFN

        torch.manual_seed(0)
        ref = ref_mm.TFN(n_classes=2, args_video=dict(REF_VIVIT_KW),
                         args_0D=dict(REF_TS_KW)).eval()
        model, p, bs, x_v, x_t = _init_mine(TFN)
        sd = ref.state_dict()

        load_vivit_encoder(p["encoder_video"], sd, "encoder_video.", DEPTH)
        load_ts_encoder(p["encoder_0d"], bs["encoder_0d"], sd, "encoder_0D.", NL)

        p["connector"]["kernel"] = t2j(sd["connector.0.weight"]).T
        p["connector"]["bias"] = t2j(sd["connector.0.bias"])
        p["cls_fc1"]["kernel"] = t2j(sd["classifier.0.weight"]).T
        p["cls_fc1"]["bias"] = t2j(sd["classifier.0.bias"])
        p["cls_ln"]["scale"] = t2j(sd["classifier.1.weight"])
        p["cls_ln"]["bias"] = t2j(sd["classifier.1.bias"])
        p["cls_fc2"]["kernel"] = t2j(sd["classifier.3.weight"]).T
        p["cls_fc2"]["bias"] = t2j(sd["classifier.3.bias"])

        out_jax = model.apply({"params": p, "batch_stats": bs},
                              jnp.asarray(x_v), jnp.asarray(x_t), train=False)
        with torch.no_grad():
            out_ref = ref(torch.from_numpy(x_v.transpose(0, 1, 4, 2, 3)),
                          torch.from_numpy(x_t))
        np.testing.assert_allclose(np.asarray(out_jax), t2j(out_ref),
                                   rtol=5e-4, atol=5e-4)


class TestConcatParity:
    def test_logits_match_reference(self, ref_mm):
        import torch

        import jax.numpy as jnp

        from kstar_tpu.models import MultiModalConcat

        torch.manual_seed(1)
        ref = ref_mm.MultiModalModel(n_classes=2, args_video=dict(REF_VIVIT_KW),
                                     args_0D=dict(REF_TS_KW)).eval()
        model, p, bs, x_v, x_t = _init_mine(MultiModalConcat)
        sd = ref.state_dict()

        load_vivit_encoder(p["encoder_video"], sd, "encoder_video.", DEPTH)
        load_ts_encoder(p["encoder_0d"], bs["encoder_0d"], sd, "encoder_0D.", NL)

        p["connector"]["kernel"] = t2j(sd["connector.0.weight"]).T
        p["connector"]["bias"] = t2j(sd["connector.0.bias"])
        p["cls_fc1"]["kernel"] = t2j(sd["classifier.0.weight"]).T
        p["cls_fc1"]["bias"] = t2j(sd["classifier.0.bias"])
        p["cls_ln"]["scale"] = t2j(sd["classifier.1.weight"])
        p["cls_ln"]["bias"] = t2j(sd["classifier.1.bias"])
        p["cls_fc2"]["kernel"] = t2j(sd["classifier.3.weight"]).T
        p["cls_fc2"]["bias"] = t2j(sd["classifier.3.bias"])

        out_jax = model.apply({"params": p, "batch_stats": bs},
                              jnp.asarray(x_v), jnp.asarray(x_t), train=False)
        with torch.no_grad():
            out_ref = ref(torch.from_numpy(x_v.transpose(0, 1, 4, 2, 3)),
                          torch.from_numpy(x_t))
        np.testing.assert_allclose(np.asarray(out_jax), t2j(out_ref),
                                   rtol=5e-4, atol=5e-4)
