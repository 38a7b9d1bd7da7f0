import dataclasses

from .cnn_lstm import CnnLSTM
from .fusion import TFN, MultiModalConcat, MultiModalGB, TFNGB
from .mlstm_fcn import MLSTMFCN
from .r2plus1d import R2Plus1DClassifier, R2Plus1DNet
from .resnet3d import Bottleneck3D, ResStage
from .slowfast import SlowFast, SlowFastEncoder
from .subbn import (SubBatchNorm, aggregate_batch_stats,
                    aggregate_subbn_stats, reset_bn_splits_long_cycle)
from .ts_transformer import Transformer0D, TransformerEncoder0D
from .vivit import ViViT, ViViTEncoder


def build_0d_model(name: str, cfg, dtype=None):
    """0D model factory (reference train_0D_network.py:222-265 dispatch)."""
    kwargs = dataclasses.asdict(cfg)
    if dtype is not None:
        kwargs["dtype"] = dtype
    if name == "Transformer":
        return Transformer0D(**kwargs)
    if name == "CnnLSTM":
        return CnnLSTM(**kwargs)
    if name == "MLSTM_FCN":
        return MLSTMFCN(**kwargs)
    raise ValueError(f"unknown 0D model: {name}")


def build_video_model(name: str, cfg, dtype=None):
    """Video model factory (reference train_vision_network.py:226-263 dispatch)."""
    kwargs = dataclasses.asdict(cfg)
    if dtype is not None:
        kwargs["dtype"] = dtype
    if name == "ViViT":
        kwargs.pop("alpha", None)
        nd = kwargs.pop("norm_dtype", "float32")
        if nd is not None and not isinstance(nd, str):
            kwargs["norm_dtype"] = nd         # already a dtype object
        elif nd in ("bfloat16", "bf16"):
            import jax.numpy as jnp
            kwargs["norm_dtype"] = jnp.bfloat16
        return ViViT(**kwargs)
    if name == "R2Plus1D":
        return R2Plus1DClassifier(**kwargs)
    if name == "SlowFast":
        return SlowFast(**kwargs)
    raise ValueError(f"unknown video model: {name}")
