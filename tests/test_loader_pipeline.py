"""Host input pipeline: MapLoader worker fan-out, prefetch_to_device, and
the population dev-feature cache token (SURVEY §2.1 DataLoader-workers
replacement)."""

import threading
import time

import numpy as np
import pytest

from mfas_tpu.data.loader import ArrayLoader, MapLoader, prefetch_to_device


class _RecordingDataset:
    """__getitem__ records which thread fetched each index."""

    def __init__(self, n, delay=0.0, fail_at=None):
        self.n = n
        self.delay = delay
        self.fail_at = fail_at
        self.threads = {}
        self._lock = threading.Lock()

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if self.fail_at is not None and i == self.fail_at:
            raise ValueError(f"boom at {i}")
        if self.delay:
            time.sleep(self.delay)
        with self._lock:
            self.threads[i] = threading.get_ident()
        return {"x": np.full((3,), i, np.float32),
                "label": np.int32(i % 7)}


def test_maploader_order_and_padding_match_deterministic():
    ds = _RecordingDataset(13)
    ref = list(MapLoader(ds, 4, num_workers=1, deterministic=True))
    out = list(MapLoader(ds, 4, num_workers=4, prefetch=2))
    assert len(out) == len(ref) == 4
    for a, b in zip(out, ref):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    # final batch padded + masked
    np.testing.assert_array_equal(out[-1]["_mask"], [1, 0, 0, 0])


def test_maploader_fans_out_across_worker_threads():
    ds = _RecordingDataset(16, delay=0.02)
    list(MapLoader(ds, 4, num_workers=4, prefetch=2))
    used = set(ds.threads.values())
    assert len(used) >= 2, f"expected >1 worker thread, saw {used}"
    assert threading.get_ident() not in used, "fetched on consumer thread"


def test_maploader_worker_exception_propagates():
    ds = _RecordingDataset(8, fail_at=5)
    with pytest.raises(ValueError, match="boom at 5"):
        list(MapLoader(ds, 4, num_workers=2))


def test_maploader_early_break_does_not_hang():
    ds = _RecordingDataset(64, delay=0.001)
    it = iter(MapLoader(ds, 4, num_workers=2, prefetch=1))
    next(it)
    it.close()  # generator finalizer must unblock the producer


def test_prefetch_to_device_values_and_order():
    data = {"x": np.arange(24, dtype=np.float32).reshape(12, 2),
            "label": np.arange(12, dtype=np.int32)}
    loader = ArrayLoader(data, 4)
    direct = list(loader)
    fetched = list(prefetch_to_device(loader, size=2))
    assert len(fetched) == len(direct)
    for a, b in zip(fetched, direct):
        for k in b:
            np.testing.assert_array_equal(np.asarray(a[k]), b[k])


def test_prefetch_to_device_propagates_errors():
    def gen():
        yield {"x": np.zeros(2, np.float32)}
        raise RuntimeError("producer died")

    it = prefetch_to_device(gen(), size=2)
    next(it)
    with pytest.raises(RuntimeError, match="producer died"):
        next(it)


def test_dev_cache_token_new_loader_invalidates():
    """A fresh loader object must never be served another loader's cached
    features (the id()-reuse hazard)."""
    from mfas_tpu.search.population import PopulationTrainer

    class L:
        pass

    a, b = L(), L()
    ta = PopulationTrainer._loader_token(a)
    tb = PopulationTrainer._loader_token(b)
    assert ta != tb
    assert PopulationTrainer._loader_token(a) == ta  # stable per object
    del a
    c = L()
    assert PopulationTrainer._loader_token(c) not in (ta,)


def test_dev_cache_used_and_invalidated_end_to_end():
    """Same loader object -> backbone features computed once; new loader
    object -> recomputed."""
    from mfas_tpu.search.population import PopulationSpec, PopulationTrainer
    from tests.test_avmnist_vertical import make_args, synthetic_avmnist
    from tests.test_population_trainer import build

    args = make_args(drpt=0.0)
    spec, extractor, btree = build(args)
    trainer = PopulationTrainer(spec, extractor.apply, btree)
    calls = {"n": 0}
    real = trainer._features

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    trainer._features = counting
    data = synthetic_avmnist(16)
    loader = ArrayLoader(data, 8)
    list(trainer._dev_batches(loader, ("image", "audio"), "label"))
    first = calls["n"]
    assert first == 2
    list(trainer._dev_batches(loader, ("image", "audio"), "label"))
    assert calls["n"] == first  # served from cache
    loader2 = ArrayLoader(data, 8)
    list(trainer._dev_batches(loader2, ("image", "audio"), "label"))
    assert calls["n"] == 2 * first  # new object -> recomputed


def test_parallel_loader_reproducible_with_random_transforms(tmp_path):
    """Random augmentations under multi-worker fan-out: two same-seed
    loaders yield identical batches (per-sample transform seeds drawn on
    the producer thread — thread scheduling cannot perturb the draws)."""
    import numpy as np

    from mfas_tpu.data.loader import MapLoader
    from mfas_tpu.data.ntu import AugCrop, Compose, NormalizeLen

    class SyntheticSkel:
        """NTU-shaped dataset with a random temporal crop."""

        def __init__(self, n=12):
            rs = np.random.RandomState(0)
            self.data = rs.randn(n, 3, 100, 25, 2).astype(np.float32)
            self.tfm = Compose([AugCrop(seed=0),
                                NormalizeLen((1, 32))])

        def __len__(self):
            return len(self.data)

        def __getitem__(self, i):
            return self._get(i)

        def getitem_seeded(self, i, seed):
            return self._get(i, np.random.RandomState(seed))

        def _get(self, i, rng=None):
            sample = {"rgb": np.zeros([1], np.float32),
                      "ske": self.data[i], "label": np.int32(i % 3)}
            return self.tfm(sample, rng=rng) if rng is not None \
                else self.tfm(sample)

    def run():
        loader = MapLoader(SyntheticSkel(), 4, shuffle=True, seed=7,
                           num_workers=4)
        return [{k: np.asarray(v) for k, v in b.items()}
                for _ in range(2) for b in loader]     # two epochs

    a, b = run(), run()
    assert len(a) == len(b)
    for ba, bb in zip(a, b):
        for k in ba:
            np.testing.assert_array_equal(ba[k], bb[k], err_msg=k)


def test_packed_ntu_bare_transform_gets_per_sample_rng(tmp_path):
    """PackedNTU must honor the accepts_rng protocol for a BARE transform
    (not just Compose) like ntu.NTU does — otherwise seeded loading
    silently falls back to the shared thread-raced RNG."""
    from mfas_tpu.data import ntu as ntu_data
    from mfas_tpu.data.ntu_pack import PackedNTU, make_synthetic_packed_ntu
    import types

    # >=64 skeleton frames: below that AugCrop is a documented no-op and
    # different seeds could not differ
    make_synthetic_packed_ntu(str(tmp_path), n=3, frames=80, h=8, w=8)
    args = types.SimpleNamespace(modality="both", no_norm=False)
    ds = PackedNTU(str(tmp_path), transform=ntu_data.AugCrop(seed=0),
                   args=args)
    a = ds.getitem_seeded(1, 123)
    b = ds.getitem_seeded(1, 123)
    np.testing.assert_array_equal(a["rgb"], b["rgb"])
    # a different seed draws a different temporal crop of the video (the
    # packed skeleton stream is 32 frames, below AugCrop's 64-frame
    # threshold) — proving the rng reaches the bare transform instead of
    # the shared instance RNG
    c = ds.getitem_seeded(1, 456)
    assert a["rgb"].shape != c["rgb"].shape or \
        not np.array_equal(a["rgb"], c["rgb"])


def test_chunked_device_put_matches_plain_put():
    """chunked_device_put (the H2D-serialization experiment, bench e2e
    section) is a pure placement strategy: values, dtype, and shape must
    be identical to a single jnp.asarray, for chunked large arrays,
    small-array passthrough, and fewer-rows-than-chunks passthrough."""
    import jax.numpy as jnp

    from mfas_tpu.data.loader import chunked_device_put

    big = np.random.RandomState(0).randint(
        0, 255, (16, 64, 64, 3), np.uint8)
    got = chunked_device_put(big, 4, min_bytes=1024)
    assert got.dtype == jnp.uint8 and got.shape == big.shape
    np.testing.assert_array_equal(np.asarray(got), big)

    small = np.arange(16, dtype=np.float32)
    got_small = chunked_device_put(small, 4, min_bytes=1024)
    np.testing.assert_array_equal(np.asarray(got_small), small)

    short = np.random.randn(2, 1024, 1024).astype(np.float32)
    got_short = chunked_device_put(short, 4, min_bytes=1024)
    np.testing.assert_array_equal(np.asarray(got_short), short)


def test_engine_h2d_chunks_trains_identically():
    """An engine with h2d_chunks set must produce the exact same training
    trajectory as the default single-put placement (same params after an
    epoch) — the strategy changes transfer granularity, nothing else."""
    import types

    import jax
    import jax.numpy as jnp

    from mfas_tpu.core.module import partition
    from mfas_tpu.core.optim import adam_init
    from mfas_tpu.core.sched import FixedScheduler
    from mfas_tpu.engine.classifier import ClassifierEngine
    from mfas_tpu.fusion import avmnist as fa

    args = types.SimpleNamespace(channels=4, num_outputs=10,
                                 inner_representation_size=8, drpt=0.0,
                                 multitask=False, alphas=False,
                                 batchnorm=False)
    rs = np.random.RandomState(0)
    n = 32                  # audio batches are 32*112*112*4 B = 1.6 MB --
    data = {"image": rs.randn(n, 1, 28, 28).astype(np.float32),
            "audio": rs.randn(n, 1, 112, 112).astype(np.float32),
            "label": rs.randint(0, 10, n).astype(np.int64)}

    results = {}
    for chunks in (None, 4):
        model = fa.Searchable_Audio_Image_Net(args, np.array([[4, 2, 0]]))
        tree = model.init(0)
        engine = ClassifierEngine(model, input_keys=("image", "audio"),
                                  h2d_chunks=chunks)
        # -- above chunked_device_put's 1 MB floor, so the engine path
        # genuinely chunks (image/label stay single-put: mixed placement)
        loaders = {"train": ArrayLoader(data, n, shuffle=True, seed=1),
                   "dev": ArrayLoader(data, n)}
        acc, best = engine.train_track_acc(
            tree, None, loaders, {k: n for k in loaders},
            FixedScheduler(1e-2), num_epochs=1, seed=0)
        results[chunks] = (acc, best)

    assert results[None][0] == results[4][0]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        results[None][1], results[4][1])
