"""Single-process exercises of the multi-host utilities (parallel/multihost.py).

On one process, ``host_batch_slice`` must cover the whole batch and
``global_batch_from_local`` must reproduce ``put_batch`` semantics: a
batch-sharded global array whose gathered value equals the host data
(the reference's DistributedSampler + DDP feeding role,
reference src/distributed.py:205-246).
"""

import jax
import numpy as np

from kstar_tpu.config import MeshConfig
from kstar_tpu.parallel import (global_batch_from_local, host_batch_slice,
                                init_multihost, make_mesh)


def test_host_batch_slice_single_process():
    s = host_batch_slice(32)
    assert (s.start, s.stop) == (0, 32)


def test_global_batch_from_local_single_process():
    init_multihost()  # no-op on a single process
    mesh = make_mesh(MeshConfig(data=8, model=1))
    batch = {
        "video": np.arange(16 * 3, dtype=np.float32).reshape(16, 3),
        "labels": np.arange(16, dtype=np.int32),
    }
    out = global_batch_from_local(mesh, batch)
    for key, val in batch.items():
        arr = out[key]
        assert arr.shape == val.shape
        # sharded over the data axis: 8 addressable shards, one per device
        assert len(arr.addressable_shards) == 8
        assert arr.addressable_shards[0].data.shape[0] == val.shape[0] // 8
        np.testing.assert_array_equal(np.asarray(arr), val)
