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
_PROC_SHM = None  # (SharedMemory, img views, lab views) in the worker


class _ShmRing:
    """Preallocated shared-memory sample slots for the process-mode
    loader's RETURN PATH.

    A ProcessPoolExecutor result pickles through a pipe: ~3.2 MB per
    flagship sample, serialized twice and copied through the OS pipe
    buffer — measured 41 img/s at ×2 workers vs 156 for threads ×4
    (PERF.md round 4), i.e. the hop ate the multi-core win.  Here the
    worker writes the augmented (wh, ww, 3) f32 window + (wh, ww) i32
    label straight into its task's preallocated slot and returns only
    the slot index; the parent memcpys out of the slot (~0.5 ms/sample,
    the only remaining serial cost).  One slot per sample of a window:
    the parent drains the whole map() before issuing the next window,
    so slots are never reused while in flight.
    """

    def __init__(self, n_slots: int, img_shape, lab_shape):
        from multiprocessing import shared_memory
        self.img_shape = tuple(img_shape)
        self.lab_shape = tuple(lab_shape)
        self.img_nbytes = int(np.prod(self.img_shape)) * 4  # f32
        self.lab_nbytes = int(np.prod(self.lab_shape)) * 4  # i32
        self.slot_nbytes = self.img_nbytes + self.lab_nbytes
        self.n_slots = n_slots
        self.shm = shared_memory.SharedMemory(
            create=True, size=max(1, n_slots * self.slot_nbytes))
        self.name = self.shm.name

    def views(self, slot: int):
        off = slot * self.slot_nbytes
        img = np.ndarray(self.img_shape, np.float32,
                         buffer=self.shm.buf, offset=off)
        lab = np.ndarray(self.lab_shape, np.int32,
                         buffer=self.shm.buf,
                         offset=off + self.img_nbytes)
        return img, lab

    def close(self, unlink: bool):
        # view lifetimes: callers must not hold views past close()
        self.shm.close()
        if unlink:
            try:
                self.shm.unlink()
            except FileNotFoundError:  # pragma: no cover
                pass


def _proc_worker_init(cfg, split_key: str, data_path: Optional[str],
                      shm_name: Optional[str] = None,
                      img_shape=None, lab_shape=None, n_slots: int = 0):
    """Build the dataset ONCE per loader process (spawn context — a
    fork would inherit JAX's threads and can deadlock) and attach to
    the parent's shared-memory sample ring."""
    global _PROC_DS, _PROC_SHM
    _PROC_DS = SegmentationDataset(cfg, split_key, data_path=data_path)
    _PROC_SHM = None
    if shm_name is not None:
        from multiprocessing import shared_memory
        shm = shared_memory.SharedMemory(name=shm_name)
        # NOTE: no resource_tracker.unregister here — spawn children
        # inherit the PARENT'S tracker process, so the attach's
        # re-register is a set no-op and the parent's unlink() performs
        # the single unregister; a child-side unregister would race it
        # (observed as tracker KeyError noise at shutdown)
        ring = _ShmRing.__new__(_ShmRing)
        ring.img_shape = tuple(img_shape)
        ring.lab_shape = tuple(lab_shape)
        ring.img_nbytes = int(np.prod(img_shape)) * 4
        ring.lab_nbytes = int(np.prod(lab_shape)) * 4
        ring.slot_nbytes = ring.img_nbytes + ring.lab_nbytes
        ring.n_slots = n_slots
        ring.shm = shm
        ring.name = shm_name
        _PROC_SHM = ring


def _proc_worker_get(index: int, seed: int):
    return _PROC_DS.get_train_item(index, seed)


def _proc_worker_get_shm(index: int, seed: int, slot: int):
    """Write the sample into its shared-memory slot; ship only the slot
    index (or fall back to pickling if the item doesn't fit the ring's
    static slab geometry — never happens for windowed train items)."""
    img, lab = _PROC_DS.get_train_item(index, seed)
    ring = _PROC_SHM
    if (ring is None or img.shape != ring.img_shape
            or lab.shape != ring.lab_shape):
        return img, lab  # pragma: no cover — shape drift safety net
    iv, lv = ring.views(slot)
    np.copyto(iv, img)
    np.copyto(lv, lab.astype(np.int32, copy=False))
    return slot


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
    ring = None
    if n_jobs > 1 and mode == "process":
        import multiprocessing
        from concurrent.futures import ProcessPoolExecutor
        # shared-memory return path: one slot per window sample; the
        # worker ships a slot INDEX instead of a ~3.2 MB pickle (the
        # hop that capped ×2 process workers at 41 img/s, PERF.md)
        wh, ww = dataset.cfg.window_size
        ring = _ShmRing(per_window, (wh, ww, 3), (wh, ww))
        pool = ProcessPoolExecutor(
            max_workers=n_jobs,
            mp_context=multiprocessing.get_context("spawn"),
            initializer=_proc_worker_init,
            initargs=(dataset.cfg, dataset.split_key, dataset.data_path,
                      ring.name, ring.img_shape, ring.lab_shape,
                      ring.n_slots))
        get_items = lambda idxs, seeds: list(
            pool.map(_proc_worker_get_shm, idxs, seeds,
                     range(len(idxs))))
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
            if ring is not None:
                # parent-side cost is one memcpy per sample out of the
                # slot (the map() is fully drained, so every slot is
                # quiescent); slots are reused next window
                wh, ww = ring.img_shape[:2]
                img_arr = np.empty((per_window, wh, ww, 3), np.float32)
                lab_arr = np.empty((per_window, wh, ww), np.int32)
                for j, it in enumerate(items):
                    if isinstance(it, tuple):  # pragma: no cover
                        img_arr[j], lab_arr[j] = it[0], it[1]
                    else:
                        iv, lv = ring.views(it)
                        img_arr[j] = iv
                        lab_arr[j] = lv
                yield (img_arr.reshape(iter_size, batch_size, wh, ww, 3),
                       lab_arr.reshape(iter_size, batch_size, wh, ww))
                continue
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
        if ring is not None:
            ring.close(unlink=True)


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
