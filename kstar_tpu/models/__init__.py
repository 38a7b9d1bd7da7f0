from .cnn_lstm import CnnLSTM
from .mlstm_fcn import MLSTMFCN
from .ts_transformer import Transformer0D, TransformerEncoder0D


def build_0d_model(name: str, cfg, dtype=None):
    """0D model factory (reference train_0D_network.py:222-265 dispatch)."""
    import jax.numpy as jnp
    import dataclasses

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
