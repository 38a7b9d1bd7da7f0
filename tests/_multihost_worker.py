"""Worker process for the REAL 2-process multihost test (test_multihost.py).

Each of two localhost processes owns 2 virtual CPU devices; together they
form a data=4 mesh. Every process runs this script: rendezvous through
``init_multihost`` (the reference's MASTER_ADDR/PORT + mp.spawn role,
reference src/distributed.py:205-246), feed ONLY the local slice of the
deterministic global batch via ``global_batch_from_local``, run two dp
train steps, and print both losses. The parent asserts the printed losses
match the single-process values — so the gradient all-reduce across
processes is checked by step 2's loss, not just the forward.

Usage: python _multihost_worker.py <port> <process_id>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    port, pid = sys.argv[1], int(sys.argv[2])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from kstar_tpu.parallel import (global_batch_from_local, host_batch_slice,
                                    init_multihost, make_mesh,
                                    replicate_tree_multihost)

    init_multihost(f"localhost:{port}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4 and jax.local_device_count() == 2

    from kstar_tpu.config import MeshConfig
    mesh = make_mesh(MeshConfig(data=4, model=1))

    state, step_args, train_step = build_step(
        mesh_put=lambda tree: replicate_tree_multihost(mesh, tree))
    batch, labels = make_global_batch()

    sl = host_batch_slice(len(labels))
    gbatch = global_batch_from_local(mesh, {"x": batch[sl], "y": labels[sl]})

    for i in range(2):
        state, loss, _ = train_step(state, gbatch["x"], gbatch["y"], *step_args)
        print(f"LOSS{i} {float(loss):.8f}", flush=True)


def make_global_batch():
    import numpy as np
    rng = np.random.default_rng(7)
    batch = rng.normal(size=(16, 21, 6)).astype(np.float32)
    labels = (np.arange(16) % 2).astype(np.int32)
    return batch, labels


def build_step(mesh_put=None):
    """Deterministic tiny MLSTM-FCN state + step (shared with the
    single-process reference computation in the parent test)."""
    import jax
    import jax.numpy as jnp

    from kstar_tpu.config import LossConfig, MLSTMFCNConfig, OptimConfig
    from kstar_tpu.models import build_0d_model
    from kstar_tpu.train import create_train_state, make_train_step

    cfg = MLSTMFCNConfig(n_features=6, fcn_dim=8, seq_len=21, lstm_dim=8,
                         lstm_n_layers=1, noise_std=0.0)
    model = build_0d_model("MLSTM_FCN", cfg)
    x0 = jnp.zeros((4, 21, 6), jnp.float32)
    state = create_train_state(model, x0, jax.random.key(0), OptimConfig(lr=1e-3))
    if mesh_put is not None:
        state = mesh_put(state)
    loss_cfg = LossConfig(loss_type="Focal")
    w = jnp.ones(2)
    m = jnp.asarray([0.3, 0.1])
    gb = jnp.zeros(3)
    return state, (w, m, gb), make_train_step(model, loss_cfg)


if __name__ == "__main__":
    main()
