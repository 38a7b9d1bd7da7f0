"""Real-time streaming prediction: one frame in, one probability out.

The deployment mode behind the reference's "real-time experiment" GIFs
(reference generate_real_time_experiment,
src/visualization/visualize_application.py:190-351), restructured for
serving: a device-resident rolling window buffer is updated in place with
each arriving frame (donated — no reallocation), the window forward runs in
the same jitted step, and the alarm fires on threshold crossing after the
startup-suppression window. Frame-to-alarm latency = one step latency.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FPS, PIXEL_MEAN_BGR


class StreamingPredictor:
    """Push frames (or 0D samples) one at a time; get p_disrupt back."""

    def __init__(self, model, params, batch_stats, seq_len: int = 21,
                 crop_size: int = 128, threshold: float = 0.5,
                 compute_dtype=jnp.bfloat16, fps: float = FPS,
                 suppress_s: float = 1.0, modality: str = "video",
                 n_features: int = 18):
        self.seq_len = seq_len
        self.crop_size = crop_size
        self.threshold = threshold
        self.fps = fps
        self.suppress_n = int(fps * suppress_s)
        self.modality = modality
        self.n_frames_seen = 0
        self.alarm_time: Optional[float] = None

        variables = {"params": params, "batch_stats": batch_stats}
        mean = jnp.asarray(PIXEL_MEAN_BGR, compute_dtype)

        if modality == "video":
            buf_shape = (seq_len, crop_size, crop_size, 3)
            self._buffer = jnp.zeros(buf_shape, jnp.uint8)

            def step(buffer, frame_u8):
                buffer = jnp.concatenate([buffer[1:], frame_u8[None]], axis=0)
                x = (buffer.astype(compute_dtype) - mean)[None]
                logits = model.apply(variables, x, train=False)
                p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[0, 0]
                return buffer, p
        else:
            self._buffer = jnp.zeros((seq_len, n_features), jnp.float32)

            def step(buffer, sample):
                buffer = jnp.concatenate([buffer[1:], sample[None]], axis=0)
                logits = model.apply(variables, buffer[None], train=False)
                p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[0, 0]
                return buffer, p

        self._step = jax.jit(step, donate_argnums=(0,))

    def _prep(self, frame: np.ndarray) -> jnp.ndarray:
        if self.modality != "video":
            return jnp.asarray(frame, jnp.float32)
        H, W = frame.shape[0], frame.shape[1]
        if H > self.crop_size:
            y0 = H // 2 - self.crop_size // 2
            x0 = W // 2 - self.crop_size // 2
            frame = frame[y0:y0 + self.crop_size, x0:x0 + self.crop_size]
        return jnp.asarray(frame, jnp.uint8)

    def push(self, frame: np.ndarray) -> Tuple[float, bool]:
        """Feed one frame / 0D sample. Returns (p_disrupt, alarm_now).

        The first seq_len pushes fill the buffer (probability reported but a
        window of stale zeros contributes); startup suppression zeroes
        alarms within the first second, like the offline path."""
        self._buffer, p = self._step(self._buffer, self._prep(frame))
        p = float(p)
        self.n_frames_seen += 1

        suppressed = self.n_frames_seen <= max(self.suppress_n, self.seq_len)
        alarm = (not suppressed) and p > self.threshold
        if alarm and self.alarm_time is None:
            self.alarm_time = self.n_frames_seen / self.fps
        return p, alarm

    def reset(self) -> None:
        self._buffer = jnp.zeros_like(self._buffer)
        self.n_frames_seen = 0
        self.alarm_time = None
