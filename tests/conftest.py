"""Test configuration: force an 8-device virtual CPU mesh so sharding tests
run hermetically without TPU hardware."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pandas as pd
import pytest

from kstar_tpu.data import synthetic


@pytest.fixture(scope="session")
def tiny_dataset():
    """8 synthetic shots, 64x64 frames, shared across tests."""
    return synthetic.make_dataset(n_shots=8, n_frames=192, height=64, width=64, seed=0)
