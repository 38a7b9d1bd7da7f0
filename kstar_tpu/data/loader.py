"""Host-side batch iteration: samplers, static-shape batching, device prefetch.

Replaces the reference's torch DataLoader + ImbalancedDatasetSampler
(reference src/utils/sampler.py:5-35, num_workers=4 cv2 pipelines) with
vectorized gathers and an optional double-buffered host->device prefetcher.
Batch shapes are static: train batches drop the remainder; eval batches pad
with wraparound and carry a validity mask so jitted steps never recompile.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional, Tuple

import numpy as np


class ImbalancedSampler:
    """Inverse class-frequency sampling with replacement
    (reference ImbalancedDatasetSampler, src/utils/sampler.py:5-35)."""

    def __init__(self, labels: np.ndarray, num_samples: Optional[int] = None):
        labels = np.asarray(labels)
        counts = np.bincount(labels, minlength=int(labels.max(initial=0)) + 1).astype(np.float64)
        counts[counts == 0] = 1.0
        self.weights = 1.0 / counts[labels]
        self.weights /= self.weights.sum()
        self.num_samples = num_samples or len(labels)
        self.n = len(labels)

    def sample(self, rng: np.random.Generator) -> np.ndarray:
        return rng.choice(self.n, size=self.num_samples, replace=True, p=self.weights)


def epoch_batches(
    n: int,
    batch_size: int,
    rng: Optional[np.random.Generator] = None,
    sampler: Optional[ImbalancedSampler] = None,
    shuffle: bool = True,
    drop_last: bool = True,
) -> Iterator[np.ndarray]:
    """Yield index arrays of exactly ``batch_size`` (drop_last) or padded with
    wraparound plus caller-side masking (see ``eval_batches``)."""
    if sampler is not None:
        order = sampler.sample(rng or np.random.default_rng())
    elif shuffle:
        order = (rng or np.random.default_rng()).permutation(n)
    else:
        order = np.arange(n)

    if len(order) == 0:
        return
    if len(order) < batch_size:
        # dataset smaller than one batch: never yield nothing — emit a single
        # wraparound-padded batch so training still takes steps
        reps = -(-batch_size // len(order))
        yield np.tile(order, reps)[:batch_size]
        return

    for i in range(0, len(order) - (batch_size - 1 if drop_last else 0), batch_size):
        chunk = order[i : i + batch_size]
        if len(chunk) < batch_size:
            chunk = np.concatenate([chunk, order[: batch_size - len(chunk)]])
        yield chunk


def eval_batches(n: int, batch_size: int) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Sequential fixed-size batches with a validity mask for the padded tail."""
    for i in range(0, n, batch_size):
        idx = np.arange(i, min(i + batch_size, n))
        mask = np.ones(batch_size, dtype=bool)
        if len(idx) < batch_size:
            mask[len(idx):] = False
            idx = np.concatenate([idx, np.zeros(batch_size - len(idx), dtype=np.int64)])
        yield idx, mask


def _relay(producer_body: Callable, depth: int):
    """Shared producer-thread scaffolding for the batch generators.

    Guarantees: the sentinel is ALWAYS enqueued (even when the producer body
    raises — the exception re-raises in the consumer), and an abandoned
    consumer (the generator is closed or garbage-collected mid-epoch, e.g.
    a train step raised) unblocks the producer instead of leaving it parked
    forever on a full queue with device batches pinned in HBM: every put is
    a timeout loop checking the stop event that the consumer's ``finally``
    sets."""
    import queue as _queue
    import threading

    q: "_queue.Queue" = _queue.Queue(maxsize=depth)
    SENTINEL = object()
    stop = threading.Event()
    err: list = []

    def send(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except _queue.Full:
                continue
        return False

    def run():
        try:
            producer_body(send, stop)
        except BaseException as e:  # noqa: BLE001 — relayed to consumer
            err.append(e)
        finally:
            send(SENTINEL)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is SENTINEL:
                break
            yield item
    finally:
        stop.set()
        t.join(timeout=5.0)
    if err:
        raise err[0]


def threaded_batches(dataset, index_iter, put: Optional[Callable] = None,
                     depth: int = 4):
    """Background-thread batch gathering: host window gathers (and optional
    device puts) run ahead of consumption so TPU steps never wait on IO —
    the single-process replacement for torch DataLoader workers."""
    indices = list(index_iter)

    def body(send, stop):
        for idx in indices:
            if stop.is_set():
                return
            item = dataset.batch(idx)
            if put is not None:
                item = put(item)
            if not send(item):
                return

    yield from _relay(body, depth)


def grouped_batches(dataset, index_iter, k: int, put: Optional[Callable] = None,
                    depth: int = 4, put_stack: Optional[Callable] = None):
    """Group the index stream into stacks of ``k`` batches for multi-step
    dispatch (train/loop.py make_scan_steps): yields ``('stack', (batch,
    labels))`` with shapes (k, B, ...) for each full group — gathered in ONE
    vectorized ``dataset.batch`` call over the concatenated indices — then
    ``('single', (batch, labels))`` for the remainder batches, which the
    caller runs through the already-compiled per-step program. Host gathers
    (and optional device puts) run in a background thread like
    ``threaded_batches``. ``put_stack`` (default: ``put``) handles the
    stacked (k, B, ...) items — on a mesh the BATCH axis is axis 1 there,
    so a data-parallel caller MUST pass a P(None, 'data') put
    (parallel.put_stack): letting a batch-axis-sharding ``put`` default in
    for the stack would silently shard the scan/STEP axis instead,
    triggering a full reshard + collectives inside every dispatch. The
    CLIs wire this; when ``put_stack`` is omitted, the first stacked item
    is inspected and a STEP-axis-sharded result raises instead of silently
    resharding every dispatch (advisor finding, round 3)."""
    defaulted = put_stack is None
    if defaulted:
        put_stack = put
    indices = list(index_iter)
    n_full = len(indices) // k

    def gather_stack(group):
        batch, labels = dataset.batch(np.concatenate(group))
        shp = lambda a: a.reshape((k, -1) + a.shape[1:])
        batch = ({kk: shp(v) for kk, v in batch.items()} if isinstance(batch, dict)
                 else shp(batch))
        return batch, labels.reshape(k, -1)

    def check_step_axis_sharding(item) -> None:
        """Raise if a defaulted ``put`` sharded axis 0 — the scan/STEP axis —
        of a (K, B, ...) stack over a multi-device mesh axis."""
        import jax

        for a in jax.tree.leaves(item):
            sh = getattr(a, "sharding", None)
            spec = getattr(sh, "spec", None)
            if spec is None or getattr(a, "ndim", 0) < 2 or len(spec) == 0:
                continue
            names = spec[0] if isinstance(spec[0], tuple) else (spec[0],)
            names = [n for n in names if n is not None]
            if names and any(sh.mesh.shape.get(n, 1) > 1 for n in names):
                raise ValueError(
                    "grouped_batches: `put` sharded the scan/STEP axis of a "
                    f"(k={k}, B, ...) stack over mesh axis {names} — every "
                    "dispatch would reshard with collectives. Pass a stack-"
                    "aware put_stack (e.g. parallel.put_stack: batch axis 1 "
                    "over 'data').")

    def body(send, stop):
        for i in range(n_full):
            if stop.is_set():
                return
            item = gather_stack(indices[i * k:(i + 1) * k])
            if put_stack is not None:
                item = put_stack(item)
                if defaulted and i == 0:
                    check_step_axis_sharding(item)
            if not send(("stack", item)):
                return
        for idx in indices[n_full * k:]:
            if stop.is_set():
                return
            item = dataset.batch(idx)
            if put is not None:
                item = put(item)
            if not send(("single", item)):
                return

    yield from _relay(body, depth)


def prefetch_to_device(iterator, put: Callable, depth: int = 2):
    """Double-buffer host batches onto the device: keep ``depth`` batches in
    flight so host gather overlaps TPU compute (replaces DataLoader
    pin_memory/num_workers overlap on the GPU reference)."""
    import collections

    queue = collections.deque()
    for item in iterator:
        queue.append(put(item))
        if len(queue) >= depth:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
