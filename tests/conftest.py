"""Test configuration: force an 8-device virtual CPU mesh so sharding tests
run hermetically without TPU hardware.

Note: the environment pre-imports jax via sitecustomize with
JAX_PLATFORMS=axon, so plain env mutation is too late — use
jax.config.update before any backend is initialized.
"""

import os

# Persistent XLA compile cache shared by in-process tests AND the CLI
# subprocess tests (they inherit os.environ): the suite compiles the same
# tiny-model programs in every subprocess, and warm cache hits cut a
# multi-minute CLI test to seconds on reruns. Keyed by program hash, so a
# code change that alters a traced program simply misses and recompiles.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache_cpu_tests"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

if os.environ.get("KSTAR_REAL_TPU") == "1":
    # escape hatch for the hardware-gated tests (e.g. the 210 fps
    # streaming-budget assertion): run against the real chip instead of
    # the virtual CPU mesh
    import jax
else:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pandas as pd
import pytest

from kstar_tpu.data import synthetic


@pytest.fixture(scope="session")
def tiny_dataset():
    """8 synthetic shots, 64x64 frames, shared across tests."""
    return synthetic.make_dataset(n_shots=8, n_frames=192, height=64, width=64, seed=0)


@pytest.fixture(scope="session")
def tiny_normal_dataset():
    """4 disruptive + 2 non-disruptive shots (ramp-down, no quench) for the
    --train_with_normal paths."""
    return synthetic.make_dataset(n_shots=4, n_frames=192, height=64,
                                  width=64, seed=0, n_normal=2)
