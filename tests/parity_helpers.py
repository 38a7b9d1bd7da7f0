"""Shared torch->flax weight-transfer helpers for the parity tests."""

import sys
import types

import numpy as np

REF = "/root/reference"


def stub_ref_deps():
    """Make the reference tree importable: prefer REAL modules when they are
    installed (cv2 exists in this image), stub the display-only deps the
    bare image lacks, and put /root/reference on sys.path. One copy shared
    by every parity/golden test — the per-file variants had drifted."""
    stubs = {
        "pytorch_model_summary": {"summary": lambda *a, **k: ""},
        "cv2": {"imread": None, "flip": None, "GaussianBlur": None,
                "convertScaleAbs": None, "VideoCapture": None},
    }
    for name, attrs in stubs.items():
        if name not in sys.modules:
            try:
                __import__(name)   # prefer the real module
                continue
            except ImportError:
                pass
            mod = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[name] = mod
    if "glob2" not in sys.modules:
        import glob as _glob
        mod = types.ModuleType("glob2")
        mod.glob = _glob.glob
        sys.modules["glob2"] = mod
    if "torchvision" not in sys.modules:
        try:
            __import__("torchvision")
        except ImportError:
            tv = types.ModuleType("torchvision")
            tr = types.ModuleType("torchvision.transforms")
            tv.transforms = tr
            sys.modules["torchvision"] = tv
            sys.modules["torchvision.transforms"] = tr
    if REF not in sys.path:
        sys.path.insert(0, REF)


def t2j(t):
    return np.asarray(t.detach().cpu().numpy())


def load_vivit_encoder(enc, sd, prefix: str, depth: int):
    """Copy a reference ViViTEncoder state_dict subtree (prefix, e.g.
    'encoder_video.') into my ViViTEncoder param dict."""
    enc["patch_embed"]["kernel"] = t2j(sd[prefix + "to_patch_embedding.1.weight"]).T
    enc["patch_embed"]["bias"] = t2j(sd[prefix + "to_patch_embedding.1.bias"])
    enc["pos_embedding"] = t2j(sd[prefix + "pos_embedding"])
    enc["space_token"] = t2j(sd[prefix + "space_token"])
    enc["temporal_token"] = t2j(sd[prefix + "temporal_token"])

    for which in ("space_transformer", "temporal_transformer"):
        dst = enc[which]
        for i in range(depth):
            a = f"{prefix}{which}.layers.{i}.0."
            f = f"{prefix}{which}.layers.{i}.1."
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
        dst["final_norm"]["scale"] = t2j(sd[prefix + which + ".norm.weight"])
        dst["final_norm"]["bias"] = t2j(sd[prefix + which + ".norm.bias"])


def load_ts_encoder(enc, bs_enc, sd, prefix: str, n_layers: int):
    """Copy a reference TransformerEncoder state_dict subtree into my
    TransformerEncoder0D param + batch_stats dicts."""
    def conv_w(name):
        return t2j(sd[name]).transpose(2, 1, 0)

    enc["filter1"]["kernel"] = conv_w(prefix + "filter.0.weight")
    enc["filter1"]["bias"] = t2j(sd[prefix + "filter.0.bias"])
    enc["filter2"]["kernel"] = conv_w(prefix + "filter.1.weight")
    enc["filter2"]["bias"] = t2j(sd[prefix + "filter.1.bias"])
    enc["filter_bn"]["scale"] = t2j(sd[prefix + "filter.2.weight"])
    enc["filter_bn"]["bias"] = t2j(sd[prefix + "filter.2.bias"])
    bs_enc["filter_bn"] = {"mean": t2j(sd[prefix + "filter.2.running_mean"]),
                           "var": t2j(sd[prefix + "filter.2.running_var"])}

    for i in range(n_layers):
        pref = f"{prefix}transformer_encoder.layers.{i}."
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

    enc["connector"]["kernel"] = t2j(sd[prefix + "connector.0.weight"]).T
    enc["connector"]["bias"] = t2j(sd[prefix + "connector.0.bias"])
    enc["connector_ln"]["scale"] = t2j(sd[prefix + "connector.1.weight"])
    enc["connector_ln"]["bias"] = t2j(sd[prefix + "connector.1.bias"])
