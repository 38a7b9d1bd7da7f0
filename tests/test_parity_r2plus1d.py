"""Numerical parity vs the reference R(2+1)D with shared weights."""

import os

import numpy as np
import pytest

from parity_helpers import REF, stub_ref_deps, t2j

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not mounted")


def conv3d_w(sd, name):
    """torch (out, in, kt, kh, kw) -> flax (kt, kh, kw, in, out)."""
    return t2j(sd[name]).transpose(2, 3, 4, 1, 0)


class TestR2Plus1DParity:
    def test_logits_match_reference(self):
        stub_ref_deps()
        import importlib

        import torch

        import jax
        import jax.numpy as jnp

        from kstar_tpu.models import R2Plus1DClassifier

        r2 = importlib.import_module("src.models.R2Plus1D")
        torch.manual_seed(0)

        H, T = 32, 8
        layer_sizes = [1, 1, 1, 1]
        ref = r2.R2Plus1DClassifier(input_size=(3, T, H, H), num_classes=2,
                                    layer_sizes=layer_sizes, alpha=0.01).eval()
        model = R2Plus1DClassifier(image_size=H, n_frames=T, n_classes=2,
                                   layer_sizes=tuple(layer_sizes), alpha=0.01)

        x = np.random.default_rng(0).normal(size=(2, T, H, H, 3)).astype(np.float32)
        variables = model.init({"params": jax.random.key(0),
                                "noise": jax.random.key(1),
                                "dropout": jax.random.key(2)},
                               jnp.asarray(x), train=False)
        p = jax.tree.map(np.asarray, variables["params"])
        bs = jax.tree.map(np.asarray, variables["batch_stats"])
        sd = ref.state_dict()

        def load_conv_bn(dst_p, dst_bs, tpre):
            """One Conv3dBlock: conv + bn (+ running stats)."""
            dst_p["Conv_0"]["kernel"] = conv3d_w(sd, tpre + ".conv.weight")
            dst_p["BatchNorm_0"]["scale"] = t2j(sd[tpre + ".bn.weight"])
            dst_p["BatchNorm_0"]["bias"] = t2j(sd[tpre + ".bn.bias"])
            dst_bs["BatchNorm_0"] = {"mean": t2j(sd[tpre + ".bn.running_mean"]),
                                     "var": t2j(sd[tpre + ".bn.running_var"])}

        def load_st_conv(dst_p, dst_bs, tpre):
            """SpatioTemporalConv: spatio_conv + temporal_conv Conv3dBlocks."""
            load_conv_bn(dst_p["spatial"], dst_bs["spatial"], tpre + ".spatio_conv")
            load_conv_bn(dst_p["temporal"], dst_bs["temporal"], tpre + ".temporal_conv")

        bk, bbs = p["backbone"], bs["backbone"]
        load_st_conv(bk["conv1"], bbs["conv1"], "res2plus1d.conv1")

        for stage in ("conv2", "conv3", "conv4", "conv5"):
            # reference layer: block1 + blocks.N; mine: block_0..block_k
            n_blocks = layer_sizes[("conv2", "conv3", "conv4", "conv5").index(stage)]
            for b in range(n_blocks):
                mine = bk[stage][f"block_{b}"]
                mine_bs = bbs[stage][f"block_{b}"]
                tpre = (f"res2plus1d.{stage}.block1" if b == 0
                        else f"res2plus1d.{stage}.blocks.{b-1}")
                load_st_conv(mine["conv1"], mine_bs["conv1"], tpre + ".conv1")
                load_st_conv(mine["conv2"], mine_bs["conv2"], tpre + ".conv2")
                if "shortcut" in mine:
                    load_st_conv(mine["shortcut"], mine_bs["shortcut"],
                                 tpre + ".downsample_conv")

        p["head"]["fc1"]["kernel"] = t2j(sd["linear.0.weight"]).T
        p["head"]["fc1"]["bias"] = t2j(sd["linear.0.bias"])
        p["head"]["norm"]["scale"] = t2j(sd["linear.1.weight"])
        p["head"]["norm"]["bias"] = t2j(sd["linear.1.bias"])
        bs["head"]["norm"] = {"mean": t2j(sd["linear.1.running_mean"]),
                              "var": t2j(sd["linear.1.running_var"])}
        p["head"]["fc2"]["kernel"] = t2j(sd["linear.3.weight"]).T
        p["head"]["fc2"]["bias"] = t2j(sd["linear.3.bias"])

        out_jax = model.apply({"params": p, "batch_stats": bs},
                              jnp.asarray(x), train=False)
        with torch.no_grad():
            out_ref = ref(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))
        np.testing.assert_allclose(np.asarray(out_jax), t2j(out_ref),
                                   rtol=1e-3, atol=1e-3)
