"""Numerical parity vs the reference torch models with shared weights.

These tests import the reference implementations from /root/reference
(read-only), copy their randomly-initialized weights into the flax rebuilds,
and assert logit agreement — the strongest evidence that the rebuild
computes the same function. Skipped when the reference tree isn't mounted.
"""

import os

import numpy as np
import pytest

from parity_helpers import REF, stub_ref_deps, t2j

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not mounted")


@pytest.fixture(scope="module")
def ref_modules():
    """Import reference model modules with their missing deps stubbed."""
    stub_ref_deps()
    import importlib

    tf = importlib.import_module("src.models.transformer")
    vv = importlib.import_module("src.models.ViViT")
    return tf, vv


class TestTransformer0DParity:
    def test_logits_match_reference(self, ref_modules):
        import torch

        import jax
        import jax.numpy as jnp

        from kstar_tpu.models import Transformer0D

        tf_mod, _ = ref_modules
        torch.manual_seed(0)

        F, L, D, NL, NH, FF, CLS = 18, 21, 32, 2, 4, 64, 16
        ref = tf_mod.Transformer(n_features=F, kernel_size=5, feature_dims=D,
                                 max_len=L, n_layers=NL, n_heads=NH,
                                 dim_feedforward=FF, dropout=0.0, cls_dims=CLS,
                                 n_classes=2).eval()

        model = Transformer0D(n_features=F, kernel_size=5, feature_dims=D,
                              max_len=L, n_layers=NL, n_heads=NH,
                              dim_feedforward=FF, dropout=0.0, cls_dims=CLS,
                              n_classes=2, noise_std=0.0)
        x = np.random.default_rng(0).normal(size=(4, L, F)).astype(np.float32)
        variables = model.init({"params": jax.random.key(0),
                                "noise": jax.random.key(1),
                                "dropout": jax.random.key(2)},
                               jnp.asarray(x), train=False)

        p = {k: dict(v) if isinstance(v, dict) else v
             for k, v in variables["params"].items()}
        enc = p["encoder"]
        sd = ref.state_dict()

        def conv_w(name):  # torch (out,in,k) -> flax (k,in,out)
            return t2j(sd[name]).transpose(2, 1, 0)

        enc["filter1"]["kernel"] = conv_w("encoder.filter.0.weight")
        enc["filter1"]["bias"] = t2j(sd["encoder.filter.0.bias"])
        enc["filter2"]["kernel"] = conv_w("encoder.filter.1.weight")
        enc["filter2"]["bias"] = t2j(sd["encoder.filter.1.bias"])
        enc["filter_bn"]["scale"] = t2j(sd["encoder.filter.2.weight"])
        enc["filter_bn"]["bias"] = t2j(sd["encoder.filter.2.bias"])
        bs = dict(variables["batch_stats"])
        bs_enc = dict(bs["encoder"])
        bs_enc["filter_bn"] = {"mean": t2j(sd["encoder.filter.2.running_mean"]),
                               "var": t2j(sd["encoder.filter.2.running_var"])}
        bs["encoder"] = bs_enc

        for i in range(NL):
            pref = f"encoder.transformer_encoder.layers.{i}."
            blk = enc[f"block_{i}"]
            attn = blk["_CausalSelfAttention_0"]
            attn["qkv"]["kernel"] = t2j(sd[pref + "self_attn.in_proj_weight"]).T
            attn["qkv"]["bias"] = t2j(sd[pref + "self_attn.in_proj_bias"])
            attn["proj"]["kernel"] = t2j(sd[pref + "self_attn.out_proj.weight"]).T
            attn["proj"]["bias"] = t2j(sd[pref + "self_attn.out_proj.bias"])
            blk["LayerNorm_0"]["scale"] = t2j(sd[pref + "norm1.weight"])
            blk["LayerNorm_0"]["bias"] = t2j(sd[pref + "norm1.bias"])
            blk["Dense_0"]["kernel"] = t2j(sd[pref + "linear1.weight"]).T
            blk["Dense_0"]["bias"] = t2j(sd[pref + "linear1.bias"])
            blk["Dense_1"]["kernel"] = t2j(sd[pref + "linear2.weight"]).T
            blk["Dense_1"]["bias"] = t2j(sd[pref + "linear2.bias"])
            blk["LayerNorm_1"]["scale"] = t2j(sd[pref + "norm2.weight"])
            blk["LayerNorm_1"]["bias"] = t2j(sd[pref + "norm2.bias"])

        enc["connector"]["kernel"] = t2j(sd["encoder.connector.0.weight"]).T
        enc["connector"]["bias"] = t2j(sd["encoder.connector.0.bias"])
        enc["connector_ln"]["scale"] = t2j(sd["encoder.connector.1.weight"])
        enc["connector_ln"]["bias"] = t2j(sd["encoder.connector.1.bias"])

        p["cls_fc1"] = {"kernel": t2j(sd["classifier.0.weight"]).T,
                        "bias": t2j(sd["classifier.0.bias"])}
        p["cls_ln"] = {"scale": t2j(sd["classifier.1.weight"]),
                       "bias": t2j(sd["classifier.1.bias"])}
        p["cls_fc2"] = {"kernel": t2j(sd["classifier.3.weight"]).T,
                        "bias": t2j(sd["classifier.3.bias"])}

        out_jax = model.apply({"params": p, "batch_stats": bs},
                              jnp.asarray(x), train=False)

        with torch.no_grad():
            out_ref = ref(torch.from_numpy(x))

        np.testing.assert_allclose(np.asarray(out_jax), t2j(out_ref),
                                   rtol=2e-4, atol=2e-4)


class TestViViTParity:
    def test_logits_match_reference(self, ref_modules):
        import torch

        import jax
        import jax.numpy as jnp

        from kstar_tpu.models import ViViT

        _, vv_mod = ref_modules
        torch.manual_seed(0)

        H, P, T, D, DEPTH, NH, DH, SCALE = 32, 8, 6, 32, 2, 2, 16, 2
        ref = vv_mod.ViViT(image_size=H, patch_size=P, n_frames=T, n_classes=2,
                           dim=D, depth=DEPTH, n_heads=NH, d_head=DH,
                           pool="cls", in_channels=3, dropout=0.0,
                           embedd_dropout=0.0, scale_dim=SCALE).eval()

        model = ViViT(image_size=H, patch_size=P, n_frames=T, n_classes=2,
                      dim=D, depth=DEPTH, n_heads=NH, d_head=DH,
                      scale_dim=SCALE, dropout=0.0, embedd_dropout=0.0)
        x = np.random.default_rng(0).normal(size=(2, T, H, H, 3)).astype(np.float32)
        variables = model.init({"params": jax.random.key(0),
                                "noise": jax.random.key(1),
                                "dropout": jax.random.key(2)},
                               jnp.asarray(x), train=False)
        p = jax.tree.map(lambda a: np.asarray(a), variables["params"])
        sd = ref.state_dict()
        enc = p["encoder"]

        enc["patch_embed"]["kernel"] = t2j(sd["to_patch_embedding.1.weight"]).T
        enc["patch_embed"]["bias"] = t2j(sd["to_patch_embedding.1.bias"])
        enc["pos_embedding"] = t2j(sd["pos_embedding"])
        enc["space_token"] = t2j(sd["space_token"])
        enc["temporal_token"] = t2j(sd["temporal_token"])

        def load_transformer(dst, src_prefix):
            for i in range(DEPTH):
                # reference: layers.i.0 = PreNorm(Attention), layers.i.1 = PreNorm(FF)
                a = f"{src_prefix}.layers.{i}.0."
                f = f"{src_prefix}.layers.{i}.1."
                dst[f"attn_norm_{i}"]["scale"] = t2j(sd[a + "norm.weight"])
                dst[f"attn_norm_{i}"]["bias"] = t2j(sd[a + "norm.bias"])
                dst[f"attn_{i}"]["to_qkv"]["kernel"] = t2j(sd[a + "fn.to_qkv.weight"]).T
                dst[f"attn_{i}"]["to_out"]["kernel"] = t2j(sd[a + "fn.to_out.0.weight"]).T
                dst[f"attn_{i}"]["to_out"]["bias"] = t2j(sd[a + "fn.to_out.0.bias"])
                dst[f"ff_norm_{i}"]["scale"] = t2j(sd[f + "norm.weight"])
                dst[f"ff_norm_{i}"]["bias"] = t2j(sd[f + "norm.bias"])
                dst[f"ff1_{i}"]["kernel"] = t2j(sd[f + "fn.net.0.weight"]).T
                dst[f"ff1_{i}"]["bias"] = t2j(sd[f + "fn.net.0.bias"])
                dst[f"ff2_{i}"]["kernel"] = t2j(sd[f + "fn.net.3.weight"]).T
                dst[f"ff2_{i}"]["bias"] = t2j(sd[f + "fn.net.3.bias"])
            dst["final_norm"]["scale"] = t2j(sd[src_prefix + ".norm.weight"])
            dst["final_norm"]["bias"] = t2j(sd[src_prefix + ".norm.bias"])

        load_transformer(enc["space_transformer"], "space_transformer")
        load_transformer(enc["temporal_transformer"], "temporal_transformer")

        p["mlp_fc1"] = {"kernel": t2j(sd["mlp.0.weight"]).T,
                        "bias": t2j(sd["mlp.0.bias"])}
        p["mlp_ln"] = {"scale": t2j(sd["mlp.1.weight"]),
                       "bias": t2j(sd["mlp.1.bias"])}
        p["mlp_fc2"] = {"kernel": t2j(sd["mlp.3.weight"]).T,
                        "bias": t2j(sd["mlp.3.bias"])}

        out_jax = model.apply({"params": p}, jnp.asarray(x), train=False)

        with torch.no_grad():
            # reference accepts (B, T, C, H, W)
            out_ref = ref(torch.from_numpy(x.transpose(0, 1, 4, 2, 3)))

        np.testing.assert_allclose(np.asarray(out_jax), t2j(out_ref),
                                   rtol=3e-4, atol=3e-4)
