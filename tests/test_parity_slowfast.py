"""Numerical parity vs the reference SlowFast with shared weights."""

import os

import numpy as np
import pytest

from parity_helpers import REF, stub_ref_deps, t2j

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not mounted")


def conv3d_w(sd, name):
    return t2j(sd[name]).transpose(2, 3, 4, 1, 0)


class TestSlowFastParity:
    def test_logits_match_reference(self):
        stub_ref_deps()
        import importlib

        import torch

        import jax
        import jax.numpy as jnp

        from kstar_tpu.models import SlowFast

        sf = importlib.import_module("src.models.slowfast")
        torch.manual_seed(0)

        H, T, ALPHA = 32, 8, 4
        layers = [1, 1, 1, 1]
        ref = sf.SlowFast(input_shape=(3, T, H, H), layers=layers, alpha=ALPHA,
                          tau_fast=1, num_classes=2, alpha_elu=1.0).eval()
        model = SlowFast(image_size=H, n_frames=T, n_classes=2,
                         layers=tuple(layers), alpha=ALPHA, tau_fast=1)

        x = np.random.default_rng(0).normal(size=(2, T, H, H, 3)).astype(np.float32)
        variables = model.init({"params": jax.random.key(0),
                                "noise": jax.random.key(1),
                                "dropout": jax.random.key(2)},
                               jnp.asarray(x), train=False)
        p = jax.tree.map(np.asarray, variables["params"])
        bs = jax.tree.map(np.asarray, variables["batch_stats"])
        sd = ref.state_dict()

        def bn(dst_p, dst_bs, key, tpre):
            dst_p[key]["scale"] = t2j(sd[tpre + ".weight"])
            dst_p[key]["bias"] = t2j(sd[tpre + ".bias"])
            dst_bs[key] = {"mean": t2j(sd[tpre + ".running_mean"]),
                           "var": t2j(sd[tpre + ".running_var"])}

        def conv(dst_p, key, tpre, bias=True):
            dst_p[key]["kernel"] = conv3d_w(sd, tpre + ".weight")
            if bias:
                dst_p[key]["bias"] = t2j(sd[tpre + ".bias"])

        def load_path(mine, mine_bs, tnet):
            conv(mine["stem"], "conv", f"{tnet}.layer0.0")
            bn(mine["stem"], mine_bs["stem"], "bn", f"{tnet}.layer0.1")
            for s, stage in enumerate(("stage1", "stage2", "stage3", "stage4"), 1):
                for b in range(layers[s - 1]):
                    mb = mine[stage][f"block_{b}"]
                    mbs = mine_bs[stage][f"block_{b}"]
                    tpre = f"{tnet}.layer{s}.{b}"
                    conv(mb, "conv1", tpre + ".conv1", bias=False)
                    bn(mb, mbs, "bn1", tpre + ".bn1")
                    conv(mb, "conv2", tpre + ".conv2", bias=False)
                    bn(mb, mbs, "bn2", tpre + ".bn2")
                    conv(mb, "conv3", tpre + ".conv3", bias=False)
                    bn(mb, mbs, "bn3", tpre + ".bn3")
                    conv(mb, "se_fc1", tpre + ".fc1")
                    conv(mb, "se_fc2", tpre + ".fc2")
                    if "shortcut_conv" in mb:
                        conv(mb, "shortcut_conv", tpre + ".downsample.0", bias=False)
                        bn(mb, mbs, "shortcut_bn", tpre + ".downsample.1")

        load_path(p["encoder"]["fast"], bs["encoder"]["fast"], "encoder.fastnet")
        load_path(p["encoder"]["slow"], bs["encoder"]["slow"], "encoder.slownet")

        for mine_k, t_k in (("l_stem", "l_maxpool"), ("l_stage1", "l_layer1"),
                            ("l_stage2", "l_layer2"), ("l_stage3", "l_layer3")):
            conv(p["encoder"]["fast"], mine_k, f"encoder.fastnet.{t_k}", bias=False)

        p["head"]["fc1"]["kernel"] = t2j(sd["classifier.classifier.0.weight"]).T
        p["head"]["fc1"]["bias"] = t2j(sd["classifier.classifier.0.bias"])
        p["head"]["norm"]["scale"] = t2j(sd["classifier.classifier.1.weight"])
        p["head"]["norm"]["bias"] = t2j(sd["classifier.classifier.1.bias"])
        bs["head"]["norm"] = {"mean": t2j(sd["classifier.classifier.1.running_mean"]),
                              "var": t2j(sd["classifier.classifier.1.running_var"])}
        p["head"]["fc2"]["kernel"] = t2j(sd["classifier.classifier.3.weight"]).T
        p["head"]["fc2"]["bias"] = t2j(sd["classifier.classifier.3.bias"])

        out_jax = model.apply({"params": p, "batch_stats": bs},
                              jnp.asarray(x), train=False)
        with torch.no_grad():
            out_ref = ref(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))

        # reference output order is concat([slow, fast]); mine matches
        np.testing.assert_allclose(np.asarray(out_jax), t2j(out_ref),
                                   rtol=1e-3, atol=1e-3)
