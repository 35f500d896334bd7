"""Host-side batch loaders feeding fixed-shape device batches.

XLA compiles one program per shape, so unlike the reference's torch
DataLoader (variable last batch), every batch here is padded to the full
batch size and carries a 0/1 validity mask; losses and accuracy counters
are mask-weighted, which reproduces the reference's exact dataset-level
statistics (reference divides by dataset size, e.g.
models/search/train_searchable/ntu.py:75-76).

``ArrayLoader`` serves in-memory numpy modalities (AV-MNIST style).
``MapLoader`` wraps an indexable dataset with a background prefetch thread
pool — the host-pipeline replacement for torch's worker processes
(SURVEY.md §2.1); heavy per-sample decode (NTU video) additionally goes
through the native C++ reader in mfas_tpu/data/cpp.
"""

from __future__ import annotations

import queue
import threading

import numpy as np


class ResumableRng:
    """Shuffle/seed-stream RNG checkpointing, shared by every loader: a
    crash-resumed search must replay the uncrashed run's batch orders and
    per-sample transform seeds, so the loaders' RNG position is part of
    the search state (searcher._save_state)."""

    def rng_state(self):
        return self._rng.get_state()

    def set_rng_state(self, state):
        self._rng.set_state(state)


class ArrayLoader(ResumableRng):
    """Batches over parallel in-memory arrays.

    arrays: dict name -> np.ndarray with equal leading dim.
    Yields dicts of numpy arrays plus ``_mask`` (float32 0/1) and pads the
    final batch to ``batch_size``.
    """

    def __init__(self, arrays: dict, batch_size: int, shuffle: bool = False,
                 seed: int = 0, indices=None):
        self.arrays = arrays
        first = next(iter(arrays.values()))
        self.indices = np.arange(len(first)) if indices is None else np.asarray(indices)
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self._rng = np.random.RandomState(seed)

    @property
    def dataset_size(self):
        return len(self.indices)

    def __len__(self):
        return -(-len(self.indices) // self.batch_size)

    def __iter__(self):
        idx = self.indices.copy()
        if self.shuffle:
            self._rng.shuffle(idx)
        bs = self.batch_size
        for start in range(0, len(idx), bs):
            take = idx[start:start + bs]
            n = len(take)
            mask = np.zeros((bs,), np.float32)
            mask[:n] = 1.0
            if n < bs:  # pad by repeating the first row (masked out anyway)
                take = np.concatenate([take, np.repeat(take[:1], bs - n)])
            batch = {k: v[take] for k, v in self.arrays.items()}
            batch["_mask"] = mask
            yield batch


def chunked_device_put(x, n_chunks, min_bytes=1 << 20):
    """H2D transfer split into ``n_chunks`` device_puts along the leading
    axis, re-joined ON DEVICE by a concatenate.

    The experiment interface for transports that serialize one large
    device_put against program execution (observed on the remote-tunneled
    single-chip backend: e2e epoch ~= step + transfer even with a prefetch
    thread): N smaller transfers *can* slot into gaps between dispatched
    step programs where a monolithic put cannot — if the serialization
    lives in the loader's single blocking put. If epoch time is unchanged,
    the serialization is the transport's. bench.py's e2e section records
    both (``e2e_train_clips_per_s_chunked``); on a locally-attached device
    this only adds a device-side concat copy, so the default stays off
    (enable per-engine via ``h2d_chunks`` / env MFAS_H2D_CHUNKS).

    Small arrays (labels, masks, < ``min_bytes``) and arrays with fewer
    rows than chunks go through one plain put."""
    import jax
    import jax.numpy as jnp

    x = np.asarray(x)
    if n_chunks <= 1 or x.nbytes < min_bytes or x.shape[0] < n_chunks:
        return jnp.asarray(x)
    pieces = np.array_split(x, n_chunks, axis=0)
    return jnp.concatenate([jax.device_put(p) for p in pieces], axis=0)


def prefetch_to_device(iterator, size=2, sharding=None, place=None):
    """Host->device prefetch on a background thread: batch N+1's host
    collation and (async) H2D transfer run while the consumer dispatches
    step N — the pinned-memory double-buffer replacement (SURVEY §2.1).

    ``place(batch)`` maps a host batch to what the consumer should receive
    (device arrays, optionally extra host-side scalars); the default
    converts every value with jnp.asarray and applies ``sharding``."""
    import jax
    import jax.numpy as jnp

    if place is None:
        def place(batch):
            def put(x):
                if sharding is not None:
                    # collective-free under multi-process meshes — a plain
                    # device_put here would issue a process_allgather from
                    # THIS producer thread and deadlock against the main
                    # thread's step collectives (parallel/mesh.py)
                    from mfas_tpu.parallel.mesh import device_put_global
                    return device_put_global(x, sharding)
                return jnp.asarray(x)
            return {k: put(v) for k, v in batch.items()}

    q: queue.Queue = queue.Queue(maxsize=max(1, size))
    stop = threading.Event()

    def producer():
        try:
            for batch in iterator:
                if stop.is_set():
                    return
                q.put(("item", place(batch)))
        except BaseException as e:
            q.put(("error", e))
        else:
            q.put(None)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                return
            kind, payload = item
            if kind == "error":
                raise payload
            yield payload
    finally:
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass


class MapLoader(ResumableRng):
    """Indexable-dataset loader with threaded prefetch.

    dataset: object with __len__ and __getitem__(i) -> dict of np arrays.
    Samples are fetched by ``num_workers`` threads (the dataset's heavy
    lifting — video decode, skeleton parse — releases the GIL inside cv2 /
    the C++ reader) and collated into padded fixed-shape batches.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 seed: int = 0, num_workers: int = 4, prefetch: int = 2,
                 deterministic: bool = False):
        """deterministic=True runs fully synchronously on the caller's
        thread — the single-threaded test mode of SURVEY §5.2."""
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.num_workers = max(1, int(num_workers))
        # clamp: queue.Queue(0) would be UNBOUNDED, collating the whole
        # dataset ahead of the consumer
        self.prefetch = max(1, int(prefetch))
        self.deterministic = deterministic
        self._rng = np.random.RandomState(seed)

    @property
    def dataset_size(self):
        return len(self.dataset)

    def __len__(self):
        return -(-len(self.dataset) // self.batch_size)

    def _fetch(self, i, seed=None):
        if seed is not None:
            return self.dataset.getitem_seeded(int(i), int(seed))
        return self.dataset[int(i)]

    def __iter__(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(idx)
        # per-sample transform seeds, drawn on this (single) thread in a
        # fixed order: random augmentations become reproducible no matter
        # how the worker threads are scheduled. Only for datasets that
        # speak the protocol — others keep their own RNG semantics.
        if hasattr(self.dataset, "getitem_seeded"):
            seeds = self._rng.randint(0, 2**31 - 1, size=len(idx))
        else:
            seeds = [None] * len(idx)
        bs = self.batch_size
        batches = [list(zip(idx[s:s + bs], seeds[s:s + bs]))
                   for s in range(0, len(idx), bs)]

        def collate(samples):
            n = len(samples)
            while len(samples) < bs:
                samples.append(samples[0])
            batch = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
            mask = np.zeros((bs,), np.float32)
            mask[:n] = 1.0
            batch["_mask"] = mask
            return batch

        if self.deterministic:
            for take in batches:
                yield collate([self._fetch(i, sd) for i, sd in take])
            return

        # Per-SAMPLE fan-out over a thread pool (torch's num_workers
        # equivalent, SURVEY §2.1): up to ``prefetch+1`` batches of sample
        # futures stay in flight while batches are collated and yielded
        # strictly in order. cv2 / the C++ reader release the GIL, so the
        # threads genuinely overlap decode.
        from concurrent.futures import ThreadPoolExecutor

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                with ThreadPoolExecutor(self.num_workers) as ex:
                    import collections
                    window: collections.deque = collections.deque()
                    nxt = 0
                    while nxt < len(batches) and len(window) <= self.prefetch:
                        window.append([ex.submit(self._fetch, i, sd)
                                       for i, sd in batches[nxt]])
                        nxt += 1
                    while window:
                        futs = window.popleft()
                        samples = [f.result() for f in futs]
                        if nxt < len(batches):
                            window.append([ex.submit(self._fetch, i, sd)
                                           for i, sd in batches[nxt]])
                            nxt += 1
                        if stop.is_set():
                            # early consumer close: drop the queued work —
                            # without cancelling, the executor's __exit__
                            # would decode up to prefetch+1 batches of
                            # samples nobody will read
                            for futs_left in window:
                                for f in futs_left:
                                    f.cancel()
                            ex.shutdown(wait=False, cancel_futures=True)
                            return
                        q.put(("batch", collate(samples)))
            except BaseException as e:  # propagate to the consumer
                q.put(("error", e))
            else:
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                kind, payload = item
                if kind == "error":
                    raise payload
                yield payload
        finally:
            stop.set()
            # drain so the producer isn't blocked on a full queue forever
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
