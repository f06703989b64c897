"""Input pipeline: super-batch assembly + background prefetch.

The training step consumes whole gradient-accumulation windows
(iter_size, micro_bs, H, W, 3) in one jit call, so the loader builds
those directly.  A small background thread pool keeps the next window
ready while the device computes (the reference relies on torch
DataLoader workers, reference data_module.py:26-39).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Tuple

import numpy as np

from adlm_tpu.data.dataset import SegmentationDataset


def device_prefetch(iterable, depth: int = 2):
    """Overlap host→device transfers with compute.

    Eagerly converts the numpy-array leaves of the next ``depth`` items
    to device arrays (device transfers are ASYNC — measured ~40 ms to
    enqueue vs ~1.2 s to complete for a 50 MB batch through the remote
    relay, CLAUDE.md) so the upload of batch n+1 runs while the
    consumer computes on batch n.  Without this, a sequential
    upload→compute→fetch loop is transfer-bound: full-res eval batches
    upload at ~42 MB/s through the relay, 5× slower than the compute.
    Non-array items (counts, metadata) pass through untouched.
    """
    import collections

    import jax
    import jax.numpy as jnp

    q: "collections.deque" = collections.deque()
    it = iter(iterable)

    def put(item):
        q.append(jax.tree.map(
            lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x,
            item))

    try:
        for _ in range(depth):
            put(next(it))
    except StopIteration:
        pass
    while q:
        out = q.popleft()
        try:
            put(next(it))
        except StopIteration:
            pass
        yield out


_PROC_DS: Optional[SegmentationDataset] = None


def _proc_worker_init(cfg, split_key: str, data_path: Optional[str]):
    """Build the dataset ONCE per loader process (spawn context — a
    fork would inherit JAX's threads and can deadlock)."""
    global _PROC_DS
    _PROC_DS = SegmentationDataset(cfg, split_key, data_path=data_path)


def _proc_worker_get(index: int, seed: int):
    return _PROC_DS.get_train_item(index, seed)


def sample_seed(seed: int, counter: int) -> int:
    """Per-sample augmentation seed: a pure function of the loader seed
    and the global sample counter.  Makes the augmentation stream
    deterministic under any thread scheduling and exactly replayable
    from any window (checkpoint/resume stores only the window index)."""
    return (seed + 1) * (1 << 40) + counter


def superbatch_iterator(dataset: SegmentationDataset, iter_size: int,
                        batch_size: int, steps: int,
                        seed: int = 0, n_jobs: int = 1,
                        start_window: int = 0, mode: str = "thread"
                        ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yields windows ``start_window .. steps-1`` of
    (iter_size, batch_size, H, W, 3) / (iter_size, batch_size, H, W),
    sampling the dataset cyclically in shuffled epochs.  ``n_jobs`` > 1
    loads samples through a pool, the analogue of the reference's
    DataLoader workers (dataloader_n_jobs in its configs, reference
    data_module.py:26-39):

    * ``mode="thread"`` — a thread pool; the native augment kernel
      releases the GIL, but the python-side np.load/stack work doesn't,
      so threads cap out near one core's throughput.
    * ``mode="process"`` — spawn-context worker processes, each with
      its own dataset + native lib: no GIL, scales with cores on real
      multi-core TPU hosts (a v5e-8 host has >200 vCPUs; this repo's
      dev host has ONE core, so scaling cannot be demonstrated here —
      see PERF.md for the per-core arithmetic).  Identical output
      stream: augmentation is seeded per sample, not per worker.

    The epoch permutation stream is a function of ``seed`` alone and
    per-sample augmentation draws are a function of (seed, sample
    counter) — so ``start_window > 0`` reproduces EXACTLY the windows a
    fresh run would have produced, by fast-forwarding the index stream
    without touching the data (mid-phase resume, train/pipeline.py)."""
    rng = np.random.RandomState(seed)
    order = rng.permutation(len(dataset))
    pos = 0
    per_window = iter_size * batch_size
    counter = 0

    def next_index() -> int:
        nonlocal pos, order, counter
        if pos >= len(order):
            order = rng.permutation(len(dataset))
            pos = 0
        i = int(order[pos])
        pos += 1
        counter += 1
        return i

    # fast-forward past completed windows (index draws only, no IO)
    for _ in range(start_window * per_window):
        next_index()

    pool = None
    if n_jobs > 1 and mode == "process":
        import multiprocessing
        from concurrent.futures import ProcessPoolExecutor
        pool = ProcessPoolExecutor(
            max_workers=n_jobs,
            mp_context=multiprocessing.get_context("spawn"),
            initializer=_proc_worker_init,
            initargs=(dataset.cfg, dataset.split_key, dataset.data_path))
        get_items = lambda idxs, seeds: list(
            pool.map(_proc_worker_get, idxs, seeds))
    elif n_jobs > 1:
        pool = ThreadPoolExecutor(max_workers=n_jobs)
        get_items = lambda idxs, seeds: list(
            pool.map(dataset.get_train_item, idxs, seeds))
    else:
        get_items = lambda idxs, seeds: [
            dataset.get_train_item(i, s) for i, s in zip(idxs, seeds)]
    try:
        for _ in range(start_window, steps):
            base = counter
            idxs = [next_index() for _ in range(per_window)]
            seeds = [sample_seed(seed, base + j)
                     for j in range(per_window)]
            items = get_items(idxs, seeds)
            images = [im for im, _ in items]
            labels = [lb for _, lb in items]
            h, w = images[0].shape[:2]
            img_arr = np.stack(images).reshape(iter_size, batch_size,
                                               h, w, 3)
            lab_arr = np.stack(labels).reshape(iter_size, batch_size, h, w)
            yield img_arr, lab_arr
    finally:
        if pool is not None:
            pool.shutdown(wait=False)


class BatchLoader:
    """Wraps an iterator with a background prefetch thread.

    Call :meth:`close` (or break out of iteration and let the caller's
    ``finally`` close it) to stop the worker — otherwise an abandoned
    loader pins its prefetched batches in memory behind a blocked
    ``q.put`` for the life of the process.
    """

    def __init__(self, it: Iterator, prefetch: int = 2):
        self._q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._done = object()
        self._stop = threading.Event()
        self._it = it

        def put_retry(item) -> bool:
            while not self._stop.is_set():
                try:
                    self._q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for item in it:
                    if not put_retry(item):
                        return
            finally:
                # the sentinel must use the same retry loop: a
                # put_nowait on a full queue would silently drop it and
                # hang the consumer after it drains the queue
                put_retry(self._done)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def close(self) -> None:
        """Stop the prefetch worker and release the wrapped iterator."""
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5)
        close_it = getattr(self._it, "close", None)
        if close_it is not None:
            close_it()

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is self._done:
                return
            yield item
