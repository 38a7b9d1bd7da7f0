"""Device-side preprocessing hooks for the epoch drivers.

``DevicePreprocessor`` is the ``put`` hook passed to fit()/run_*_epoch: it
moves the raw uint8 video batch to the device and runs the jitted
crop/augment/normalize pipeline (data/augment.py) there, replacing the
reference's CPU DataLoader-worker transform stack (reference
src/dataset.py:124-144, hot loop 1).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AugmentConfig
from .augment import preprocess_batch


class DevicePreprocessor:
    """put hook: (batch, labels) -> (device batch, labels).

    Handles raw video arrays and multimodal {'video', '0D'} dicts; 0D data
    passes straight through (already float). train=True applies the
    probability-gated augmentations with a fresh fold of the stream key.
    """

    def __init__(self, crop_size: int, cfg: Optional[AugmentConfig] = None,
                 train: bool = True, out_dtype=jnp.bfloat16, seed: int = 0,
                 mesh=None):
        import threading

        self.crop_size = crop_size
        self.cfg = cfg or AugmentConfig()
        self.train = train
        self.out_dtype = out_dtype
        self._key = jax.random.key(seed)
        self._counter = 0
        self._lock = threading.Lock()   # counter bump is atomic even when a
        # preprocessor is shared across trial/prefetch threads (advisor r3)
        self.mesh = mesh  # shard the batch axis over the mesh's data axis

    def _next_key(self):
        with self._lock:
            self._counter += 1
            c = self._counter
        return jax.random.fold_in(self._key, c)

    def _put(self, x):
        if self.mesh is not None:
            from ..parallel.mesh import put_batch
            return put_batch(self.mesh, x)
        return jnp.asarray(x)

    def _video(self, v: np.ndarray):
        return preprocess_batch(self._next_key(), self._put(v), self.crop_size,
                                self.cfg, self.train, self.out_dtype)

    def __call__(self, batch_and_labels: Tuple):
        batch, labels = batch_and_labels
        if isinstance(batch, dict):
            out = dict(batch)
            out["video"] = self._video(batch["video"])
            out["0D"] = self._put(batch["0D"])
            return out, self._put(labels)
        return self._video(batch), self._put(labels)
