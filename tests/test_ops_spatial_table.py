"""Fused spatial-table kernel (ops/spatial_table.py) vs the flax scan path.

Runs the Pallas kernel in interpreter mode on the CPU mesh and checks it
reproduces models/vivit.py spatial_cls for every offset, plus the
VideoSweeper integration fallback logic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kstar_tpu.models.vivit import ViViT
from kstar_tpu.ops.spatial_table import (extract_spatial_weights,
                                         find_spatial_params, spatial_table,
                                         spatial_table_xla)

SEQ_LEN = 5
T = 12
IMG, PATCH = 32, 16          # 4 patches + cls = 5 tokens
DIM, DEPTH, HEADS, DH = 32, 2, 2, 16


@pytest.fixture(scope="module")
def vivit_setup():
    model = ViViT(image_size=IMG, patch_size=PATCH, n_frames=SEQ_LEN,
                  dim=DIM, depth=DEPTH, n_heads=HEADS, d_head=DH,
                  dtype=jnp.float32)
    key = jax.random.key(0)
    x0 = jnp.zeros((1, SEQ_LEN, IMG, IMG, 3), jnp.float32)
    variables = model.init({"params": key, "noise": key, "dropout": key},
                           x0, train=False)
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.standard_normal((T, 4, DIM)), jnp.float32)
    return model, variables, tokens


@pytest.mark.parametrize("attn_mode", ["batched", "paired"])
def test_kernel_matches_spatial_cls(vivit_setup, attn_mode):
    model, variables, tokens = vivit_setup
    vars_ = {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})}
    ref = np.asarray(spatial_table_xla(model, vars_, tokens, SEQ_LEN),
                     np.float32)

    weights = extract_spatial_weights(variables["params"], SEQ_LEN,
                                      depth=DEPTH, dtype=jnp.float32)
    tokens5 = jnp.pad(tokens, ((0, 0), (1, 0), (0, 0)))
    got = np.asarray(
        spatial_table(tokens5, weights, SEQ_LEN, depth=DEPTH, n_heads=HEADS,
                      d_head=DH, block_f=4, compute_dtype=jnp.float32,
                      attn_mode=attn_mode, interpret=True), np.float32)

    assert got.shape == ref.shape == (SEQ_LEN, T, DIM)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_kernel_matches_spatial_cls_smaller_crop(vivit_setup):
    """A sweep crop below the training image size yields fewer patch tokens
    than the positional embedding holds; the model prefix-slices pos
    (models/vivit.py:219) and the kernel must mirror that (regression: the
    CLI extras path crashed with a (F, 17, D) + (1, 65, D) broadcast when
    synthetic frames were smaller than --image_size)."""
    model, variables, tokens = vivit_setup
    vars_ = {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})}
    small = tokens[:, :2]                       # 2 patches < the model's 4
    ref = np.asarray(spatial_table_xla(model, vars_, small, SEQ_LEN),
                     np.float32)

    weights = extract_spatial_weights(variables["params"], SEQ_LEN,
                                      depth=DEPTH, dtype=jnp.float32)
    small3 = jnp.pad(small, ((0, 0), (1, 0), (0, 0)))
    got = np.asarray(
        spatial_table(small3, weights, SEQ_LEN, depth=DEPTH, n_heads=HEADS,
                      d_head=DH, block_f=4, compute_dtype=jnp.float32,
                      interpret=True), np.float32)

    assert got.shape == ref.shape == (SEQ_LEN, T, DIM)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_find_spatial_params_nested(vivit_setup):
    model, variables, _ = vivit_setup
    flat = find_spatial_params(variables["params"])
    assert flat is not None and "space_transformer" in flat
    nested = {"a": {"b": variables["params"]}}
    assert find_spatial_params(nested) is flat or \
        find_spatial_params(nested)["space_transformer"] is flat["space_transformer"]
    assert find_spatial_params({"x": {"y": 1}}) is None


def test_sweeper_falls_back_without_fused(vivit_setup):
    """On the CPU backend the sweeper must keep the XLA scan (fused off)."""
    from kstar_tpu.infer.continuous import VideoSweeper

    model, variables, _ = vivit_setup
    sweeper = VideoSweeper(model, variables["params"],
                           variables.get("batch_stats", {}),
                           SEQ_LEN, IMG, batch_size=8,
                           compute_dtype=jnp.float32)
    assert not sweeper._fused_table_active  # auto mode on CPU

    rng = np.random.default_rng(2)
    frames = rng.integers(0, 255, size=(T + SEQ_LEN + 4, IMG, IMG, 3),
                          dtype=np.uint8)
    starts = np.arange(4, dtype=np.int64)
    probs = sweeper.sweep(frames, starts)
    assert probs.shape == (4,)
    assert np.isfinite(probs).all()


def test_sweeper_fused_flag_matches_scan(vivit_setup):
    """Forcing use_fused_table=True on CPU runs the kernel via interpret=False
    CPU lowering is unsupported, so instead check the fused table function
    directly against the scan through the sweeper's embed path."""
    model, variables, tokens = vivit_setup
    vars_ = {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})}
    weights = extract_spatial_weights(variables["params"], SEQ_LEN,
                                      depth=DEPTH, dtype=jnp.float32)
    # pad T=12 to block_f=8 multiple (16) with edge frames, as the sweeper does
    tokens5 = jnp.pad(tokens, ((0, 0), (1, 0), (0, 0)))
    pad = (-T) % 8
    padded = jnp.concatenate(
        [tokens5, jnp.broadcast_to(tokens5[-1:], (pad,) + tokens5.shape[1:])])
    got = np.asarray(
        spatial_table(padded, weights, SEQ_LEN, depth=DEPTH, n_heads=HEADS,
                      d_head=DH, block_f=8, compute_dtype=jnp.float32,
                      interpret=True)[:, :T], np.float32)
    ref = np.asarray(spatial_table_xla(model, vars_, tokens, SEQ_LEN), np.float32)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)
