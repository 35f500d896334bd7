"""HBM-resident train-feature bank (SURVEY.md §7.2.6, opt-in
``--cache_features``): frozen-backbone train features are extracted once
(eval mode, deterministic) into per-sample device arrays; later epochs and
populations gather shuffled batches straight from the bank."""

import numpy as np

import jax.numpy as jnp

from mfas_tpu.core.sched import FixedScheduler
from mfas_tpu.data.loader import ArrayLoader
from mfas_tpu.fusion import avmnist as fa
from mfas_tpu.search.population import PopulationTrainer
from mfas_tpu.search.trainers import PopulationSearchTrainer
from tests.test_avmnist_vertical import make_args, synthetic_avmnist
from tests.test_population_trainer import build

CONFS = [np.array([[4, 2, 0]]), np.array([[0, 0, 1]]),
         np.array([[2, 1, 0], [4, 2, 0]])]


def test_bank_matches_direct_eval_features():
    """Bank rows == eval-mode features computed directly, final-batch
    padding rows dropped (bank N == dataset_size)."""
    args = make_args(drpt=0.0)
    spec, extractor, btree = build(args)
    data = synthetic_avmnist(21)            # 21 % 8 != 0: padded last batch
    loader = ArrayLoader(data, 8)

    trainer = PopulationTrainer(spec, extractor.apply, btree,
                                cache_train_features=True)
    bank = trainer._build_train_bank(loader, ("image", "audio"), "label")
    assert int(bank["fa"].shape[0]) == 21
    np.testing.assert_array_equal(np.asarray(bank["label"]), data["label"])

    inputs = (jnp.asarray(data["image"]), jnp.asarray(data["audio"]))
    fa_, fb_, lb_, la_ = trainer._features(btree, inputs,
                                           jnp.zeros(2, jnp.uint32),
                                           train=False)
    np.testing.assert_allclose(np.asarray(bank["fa"]), np.asarray(fa_),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(bank["lb"]), np.asarray(lb_),
                               rtol=1e-5, atol=1e-6)


def test_bank_batches_cover_dataset_with_mask():
    args = make_args(drpt=0.0)
    spec, extractor, btree = build(args)
    data = synthetic_avmnist(21)
    loader = ArrayLoader(data, 8)
    trainer = PopulationTrainer(spec, extractor.apply, btree,
                                cache_train_features=True)
    bank = trainer._build_train_bank(loader, ("image", "audio"), "label")
    rs = np.random.RandomState(0)
    seen = []
    total_mask = 0.0
    for fa_, fb_, lb_, la_, label, wmask in trainer._bank_batches(bank, 8, rs):
        assert fa_.shape[0] == 8 and wmask.shape == (8,)
        m = np.asarray(wmask)
        seen.extend(np.asarray(label)[m > 0].tolist())
        total_mask += float(m.sum())
    assert total_mask == 21                  # every sample counted once
    assert sorted(seen) == sorted(data["label"].tolist())


def test_bank_trains_and_is_reused_across_populations():
    """Second population reuses the bank: zero extractor calls after the
    first build (+ the dev cache already covers the dev split)."""
    args = make_args(drpt=0.0, epochs=2)
    spec, extractor, btree = build(args)
    data = synthetic_avmnist(32)
    loaders = {"train": ArrayLoader(data, 8, shuffle=True, seed=1),
               "dev": ArrayLoader(data, 8)}
    sizes = {k: v.dataset_size for k, v in loaders.items()}

    trainer = PopulationTrainer(spec, extractor.apply, btree,
                                cache_train_features=True)
    # count host-level invocations of the compiled feature program (one per
    # backbone forward pass)
    calls = {"n": 0}
    inner_features = trainer._features

    def counting_features(*a, **kw):
        calls["n"] += 1
        return inner_features(*a, **kw)

    trainer._features = counting_features
    sched = FixedScheduler(1e-2)
    accs, _, _ = trainer.train_population(CONFS, loaders, sizes, sched,
                                          num_epochs=3,
                                          input_keys=("image", "audio"))
    assert len(accs) == 3 and all(0.0 <= a <= 1.0 for a in accs)
    first = calls["n"]
    # bank build: 4 train batches; dev cache: 4 dev batches — one forward
    # per batch, never per-epoch
    assert first == 8
    accs2, _, _ = trainer.train_population(CONFS[:2], loaders, sizes,
                                           FixedScheduler(1e-2), num_epochs=3,
                                           input_keys=("image", "audio"))
    assert len(accs2) == 2
    assert calls["n"] == first   # no new backbone forwards at all

    # training on the bank actually learns (same criterion as the
    # non-cached trainer test)
    accs3, _, _ = trainer.train_population(CONFS, loaders, sizes,
                                           FixedScheduler(1e-2), num_epochs=6,
                                           input_keys=("image", "audio"))
    assert max(accs3) > 0.2


def test_fused_epoch_scan_matches_per_batch_path():
    """The fused lax.scan epoch program (one dispatch per epoch) and the
    per-batch dispatch loop are the same computation: with dropout off,
    identical shuffles (same RandomState call sequence) and identical LR
    sequences give matching dev accuracies and near-identical final
    parameters."""
    args = make_args(drpt=0.0, epochs=2)
    spec, extractor, btree = build(args)
    data = synthetic_avmnist(21)            # ragged final batch on purpose

    results = {}
    for fused in (False, True):
        # fresh loaders per path: the bank's row order is the loader's
        # next iteration order, and a shared shuffling loader would hand
        # the two trainers different orders
        loaders = {"train": ArrayLoader(data, 8, shuffle=True, seed=1),
                   "dev": ArrayLoader(data, 8)}
        sizes = {k: v.dataset_size for k, v in loaders.items()}
        trainer = PopulationTrainer(spec, extractor.apply, btree,
                                    cache_train_features=True,
                                    fused_epochs=fused)
        accs, params, _ = trainer.train_population(
            CONFS, loaders, sizes, FixedScheduler(1e-2), num_epochs=3,
            input_keys=("image", "audio"), seed=5)
        results[fused] = (accs, params)

    accs_loop, params_loop = results[False]
    accs_scan, params_scan = results[True]
    np.testing.assert_allclose(accs_scan, accs_loop, atol=1e-6)
    import jax
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-6),
        params_loop, params_scan)


def test_cache_features_flag_via_search_trainer():
    args = make_args(drpt=0.0, epochs=1)
    spec, extractor, btree = build(args)
    data = synthetic_avmnist(16)
    loaders = {"train": ArrayLoader(data, 8, shuffle=True, seed=1),
               "dev": ArrayLoader(data, 8)}
    pop = PopulationSearchTrainer(spec, extractor, btree,
                                  input_keys=("image", "audio"),
                                  cache_features=True)
    accs = pop(CONFS[:2], fa.Searchable_Audio_Image_Net, loaders, args)
    assert len(accs) == 2 and all(0.0 <= a <= 1.0 for a in accs)
    assert pop.trainer._train_bank is not None


def test_bank_batch_grouped_extraction_identical():
    """--bank_batch groups loader batches for the eval-mode backbone
    forward (larger MXU batches); the bank and the dev feature stream must
    be identical to the ungrouped path, including the ragged tail group."""

    args = make_args(drpt=0.0)
    spec, extractor, btree = build(args)
    data = synthetic_avmnist(21)             # 3 loader batches: group 2 + 1
    keys = ("image", "audio")

    banks, devs, calls = {}, {}, {}
    for bb in (None, 16):
        trainer = PopulationTrainer(spec, extractor.apply, btree,
                                    cache_train_features=True, bank_batch=bb)
        n_calls = {"n": 0}
        inner = trainer._features

        def counting(*a, _inner=inner, _n=n_calls, **kw):
            _n["n"] += 1
            return _inner(*a, **kw)

        trainer._features = counting
        banks[bb] = trainer._build_train_bank(
            ArrayLoader(data, 8), keys, "label")
        devs[bb] = [tuple(np.asarray(x) for x in item)
                    for item in trainer._dev_batches(
                        ArrayLoader(data, 8), keys, "label")]
        calls[bb] = n_calls["n"]

    for k in banks[None]:
        np.testing.assert_allclose(np.asarray(banks[16][k]),
                                   np.asarray(banks[None][k]),
                                   rtol=1e-5, atol=1e-6)
    assert len(devs[16]) == len(devs[None]) == 3   # per-batch stream kept
    for a, b in zip(devs[16], devs[None]):
        for x, y in zip(a, b):
            np.testing.assert_allclose(x, y, rtol=1e-5, atol=1e-6)
    # 3 batches ungrouped = 3+3 calls; grouped = (2 groups)+(2 groups)
    assert calls[None] == 6 and calls[16] == 4
    # eval extraction draws NOTHING from the trajectory stream (constant
    # key — values are never consumed in eval mode), so bank_batch cannot
    # change a search trajectory, and a crash-resumed rebuild replays the
    # uncrashed run's exact dropout keys


def test_feature_dtype_default_logic():
    """bf16 is the default under --cache_features; --f32_features opts out;
    --bf16_features forces it without the bank (VERDICT r3 next-5)."""
    import types

    from mfas_tpu.search.searchers import _feature_dtype

    def a(**kw):
        return types.SimpleNamespace(**kw)

    assert _feature_dtype(a()) is None
    assert _feature_dtype(a(cache_features=True)) == "bfloat16"
    assert _feature_dtype(a(cache_features=True, f32_features=True)) is None
    assert _feature_dtype(a(bf16_features=True)) == "bfloat16"
    assert _feature_dtype(a(bf16_features=True, f32_features=True)) is None


def test_bf16_features_ranking_agreement():
    """The study behind the bf16-under---cache_features default: train the
    SAME candidate set (identical seeds, shuffles, LR) with f32 and bf16
    frozen features and measure candidate-accuracy ranking agreement.
    Candidate scoring only ever consumes frozen features (reference
    models/search/ntu_searchable.py:59-62), so this rho is the entire
    risk surface of the dtype switch. Measured value recorded in
    docs/PARITY.md."""
    import dataclasses

    from tests.test_population_weightsharing import _spearman

    rows = fa.get_possible_layer_configurations(0)
    confs = [np.asarray([r]) for r in rows[::3]]          # 10 candidates
    args = make_args(drpt=0.0)
    spec, extractor, btree = build(args)
    data = synthetic_avmnist(96)

    accs = {}
    for dt in (None, "bfloat16"):
        loaders = {"train": ArrayLoader(data, 8, shuffle=True, seed=1),
                   "dev": ArrayLoader(data, 8)}
        sizes = {k: v.dataset_size for k, v in loaders.items()}
        trainer = PopulationTrainer(
            dataclasses.replace(spec, feature_dtype=dt),
            extractor.apply, btree, cache_train_features=True)
        a, _, _ = trainer.train_population(
            confs, loaders, sizes, FixedScheduler(1e-2), num_epochs=4,
            input_keys=("image", "audio"), seed=3)
        accs[dt] = np.asarray(a)

    rho = _spearman(accs[None], accs["bfloat16"])
    print(f"bf16-vs-f32 feature ranking: rho={rho:.3f} "
          f"f32={accs[None]} bf16={accs['bfloat16']}")
    # the measured value (PARITY.md) is ~1.0; the floor guards against a
    # real ranking regression while tolerating tiny-scale tie noise
    assert rho > 0.7, (rho, accs)


def test_bf16_feature_bank_trains():
    """--bf16_features + --cache_features (the recommended fast search
    config): the bank stores bfloat16, the fused scan casts gathers back
    to f32, training proceeds and learns."""
    import dataclasses

    args = make_args(drpt=0.0)
    spec, extractor, btree = build(args)
    spec = dataclasses.replace(spec, feature_dtype="bfloat16")
    data = synthetic_avmnist(32)
    loaders = {"train": ArrayLoader(data, 8, shuffle=True, seed=1),
               "dev": ArrayLoader(data, 8)}
    sizes = {k: v.dataset_size for k, v in loaders.items()}
    trainer = PopulationTrainer(spec, extractor.apply, btree,
                                cache_train_features=True)
    accs, params, _ = trainer.train_population(
        CONFS, loaders, sizes, FixedScheduler(1e-2), num_epochs=6,
        input_keys=("image", "audio"), seed=0)
    assert trainer._train_bank["fa"].dtype == jnp.bfloat16
    assert all(np.isfinite(a) and 0.0 <= a <= 1.0 for a in accs)
    assert max(accs) > 0.2            # learns, like the f32 bank test


def test_quantize_rows_roundtrip():
    """Symmetric-int8 row quantization: per-row relative error bounded by
    half a quantization step of that row's absmax (0.5/127), including
    rows with wildly different scales and all-zero padded rows."""
    from mfas_tpu.search.population import _quantize_rows

    rs = np.random.RandomState(0)
    x = rs.randn(6, 3, 32).astype(np.float32)
    x[0] *= 1e3
    x[1] *= 1e-4
    x[2, 1] = 0.0                      # an all-zero (padded) row
    q, s = _quantize_rows(jnp.asarray(x))
    assert q.dtype == jnp.int8 and s.shape == (6, 3, 1)
    back = np.asarray(q, np.float32) * np.asarray(s)
    row_max = np.abs(x).max(axis=-1, keepdims=True)
    bound = np.broadcast_to(row_max * (0.5 / 127.0) + 1e-12, x.shape)
    np.testing.assert_array_less(np.abs(back - x), bound)


def test_int8_bank_trains_and_stores_int8():
    """--int8_feature_bank: values land int8 with per-row f32 scales (2x
    the bf16 bank's capacity), the fused epoch dequantizes after the
    gather, training proceeds and learns."""
    import dataclasses

    args = make_args(drpt=0.0)
    spec, extractor, btree = build(args)
    spec = dataclasses.replace(spec, feature_dtype="bfloat16")
    data = synthetic_avmnist(32)
    loaders = {"train": ArrayLoader(data, 8, shuffle=True, seed=1),
               "dev": ArrayLoader(data, 8)}
    sizes = {k: v.dataset_size for k, v in loaders.items()}
    trainer = PopulationTrainer(spec, extractor.apply, btree,
                                cache_train_features=True, int8_bank=True)
    accs, params, _ = trainer.train_population(
        CONFS, loaders, sizes, FixedScheduler(1e-2), num_epochs=6,
        input_keys=("image", "audio"), seed=0)
    bank = trainer._train_bank
    assert bank["fa"].dtype == jnp.int8
    assert bank["fa_scale"].dtype == jnp.float32
    assert bank["fa_scale"].shape == bank["fa"].shape[:2] + (1,)
    assert all(np.isfinite(a) and 0.0 <= a <= 1.0 for a in accs)
    assert max(accs) > 0.2

    # the non-fused per-batch path trains off the same quantized bank
    # (its DEV scoring uses the unquantized dev cache rather than a dev
    # bank, so accuracies are close but not bit-equal to the fused path)
    trainer2 = PopulationTrainer(spec, extractor.apply, btree,
                                 cache_train_features=True, int8_bank=True,
                                 fused_epochs=False)
    accs2, _, _ = trainer2.train_population(
        CONFS, loaders, sizes, FixedScheduler(1e-2), num_epochs=6,
        input_keys=("image", "audio"), seed=0)
    assert all(np.isfinite(a) and 0.0 <= a <= 1.0 for a in accs2)
    assert max(accs2) > 0.2


def test_int8_bank_ranking_agreement():
    """The study gating --int8_feature_bank: identical candidates, seeds,
    shuffles and LR; the ONLY change is int8 storage of the (bf16-default)
    bank. Candidate scoring only ever consumes frozen features (reference
    models/search/ntu_searchable.py:59-62), so ranking agreement is the
    entire risk surface. Measured value recorded in docs/PARITY.md."""
    import dataclasses

    from tests.test_population_weightsharing import _spearman

    rows = fa.get_possible_layer_configurations(0)
    confs = [np.asarray([r]) for r in rows[::3]]          # 10 candidates
    args = make_args(drpt=0.0)
    spec, extractor, btree = build(args)
    spec = dataclasses.replace(spec, feature_dtype="bfloat16")
    data = synthetic_avmnist(96)

    accs = {}
    for int8 in (False, True):
        loaders = {"train": ArrayLoader(data, 8, shuffle=True, seed=1),
                   "dev": ArrayLoader(data, 8)}
        sizes = {k: v.dataset_size for k, v in loaders.items()}
        trainer = PopulationTrainer(spec, extractor.apply, btree,
                                    cache_train_features=True,
                                    int8_bank=int8)
        a, _, _ = trainer.train_population(
            confs, loaders, sizes, FixedScheduler(1e-2), num_epochs=4,
            input_keys=("image", "audio"), seed=3)
        accs[int8] = np.asarray(a)

    rho = _spearman(accs[False], accs[True])
    print(f"int8-vs-bf16 bank ranking: rho={rho:.3f} "
          f"bf16={accs[False]} int8={accs[True]}")
    assert rho > 0.7, (rho, accs)
