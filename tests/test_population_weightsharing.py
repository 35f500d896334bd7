"""Population-mode weight sharing: inject/extract round-trips through the
padded slots with true shapes, and the search trainer threads the store."""

import numpy as np

import jax.numpy as jnp

from mfas_tpu.core.sched import FixedScheduler
from mfas_tpu.data.loader import ArrayLoader
from mfas_tpu.fusion import avmnist as fa
from mfas_tpu.fusion.layers import shared_weight_key
from mfas_tpu.search.population import (PopulationSpec, PopulationTrainer,
                                        extract_shared_states,
                                        init_population,
                                        inject_shared_states)
from mfas_tpu.search.trainers import PopulationSearchTrainer
from tests.test_avmnist_vertical import make_args, synthetic_avmnist
from tests.test_population_trainer import build


def test_extract_inject_roundtrip():
    args = make_args()
    spec, _, _ = build(args)
    confs = [np.array([[4, 2, 0], [1, 1, 1]]), np.array([[0, 0, 0]])]
    params, bn = init_population(confs, spec, seed=0)

    store = {}
    extract_shared_states(params, bn, confs, spec, store)
    # keys follow the reference scheme
    k0 = shared_weight_key(0, spec.sizes_a[4] + spec.sizes_b[2],
                           spec.hidden, 0)
    assert k0 in store
    assert store[k0]["0"]["weight"].shape == (
        spec.hidden, spec.sizes_a[4] + spec.sizes_b[2])

    # wipe and re-inject: padded weights must be restored exactly
    params2, bn2 = init_population(confs, spec, seed=99)
    params3, bn3 = inject_shared_states(params2, bn2, confs, spec, store)
    np.testing.assert_allclose(np.asarray(params3["W"]),
                               np.asarray(params["W"]), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(params3["b"]),
                               np.asarray(params["b"]), rtol=1e-6, atol=1e-7)


def test_population_weightsharing_carries_across_calls():
    args = make_args(drpt=0.0, epochs=1)
    args.weightsharing = True
    args.population_weightsharing = True
    spec, extractor, btree = build(args)
    data = synthetic_avmnist(32)
    loaders = {"train": ArrayLoader(data, 8, shuffle=True, seed=1),
               "dev": ArrayLoader(data, 8)}

    trainer = PopulationSearchTrainer(spec, extractor, btree,
                                      input_keys=("image", "audio"))
    shared = {}
    conf = np.array([[4, 2, 0]])
    accs1 = trainer([conf], fa.Searchable_Audio_Image_Net, loaders, args,
                    state_dict=shared)
    assert shared, "store should be populated after the first call"
    key = shared_weight_key(0, spec.sizes_a[4] + spec.sizes_b[2],
                            spec.hidden, 0)
    w_after_first = shared[key]["0"]["weight"].copy()

    # second call with the same conf must START from the stored weights
    # (inject) and update them again (extract)
    accs2 = trainer([conf], fa.Searchable_Audio_Image_Net, loaders, args,
                    state_dict=shared)
    # extract-after: real training (lr > 0) must update the stored weights
    assert not np.array_equal(shared[key]["0"]["weight"], w_after_first)
    assert len(accs1) == len(accs2) == 1

    # inject-before: with lr == 0 the extracted weights are EXACTLY the
    # injected ones — pins that the store actually flows into the model
    # (a silent inject no-op would extract fresh random init instead)
    import copy as _copy
    frozen_args = _copy.copy(args)
    frozen_args.eta_max = frozen_args.eta_min = 0.0
    before = shared[key]["0"]["weight"].copy()
    trainer([conf], fa.Searchable_Audio_Image_Net, loaders, frozen_args,
            state_dict=shared)
    np.testing.assert_array_equal(shared[key]["0"]["weight"], before)


# --------------------------------------------------------------------------
# ranking effect of the population weight-sharing approximation
# (VERDICT r2 item 9; measured numbers recorded in docs/PARITY.md)
# --------------------------------------------------------------------------
def _spearman(a, b):
    """Spearman rho with average ranks (accuracies are discrete -> ties)."""

    def ranks(x):
        x = np.asarray(x, np.float64)
        order = np.argsort(x, kind="stable")
        r = np.empty(len(x))
        r[order] = np.arange(len(x), dtype=np.float64)
        # average tied groups
        for v in np.unique(x):
            m = x == v
            r[m] = r[m].mean()
        return r

    ra, rb = ranks(a), ranks(b)
    ra -= ra.mean()
    rb -= rb.mean()
    denom = np.sqrt((ra ** 2).sum() * (rb ** 2).sum())
    return float((ra * rb).sum() / denom) if denom else 0.0


def _ws_loaders(n=96):
    data = synthetic_avmnist(n)
    return {"train": ArrayLoader(data, 8, shuffle=True, seed=1),
            "dev": ArrayLoader(data, 8)}


def _level01_confs():
    """Level-0 single-row confs + a level-1 set that repeats row shapes, so
    weight sharing has stored entries to inject."""
    rows = fa.get_possible_layer_configurations(0)
    level0 = [np.asarray([r]) for r in rows[::3]]          # 10 of 30 rows
    level1 = [np.concatenate([level0[i], level0[(i + 1) % len(level0)]])
              for i in range(0, len(level0), 2)]           # 5 two-row confs
    return level0, level1


def test_population_ws_isolated_effect_and_ranking():
    """Isolate the approximation: two POPULATION runs, identical seeds and
    batches, differing ONLY in whether the shared store is injected —
    the level-1 TRAINED PARAMETERS must change (sharing has a real effect;
    the discrete dev accuracy may or may not flip at this tiny scale) and
    the level-1 candidate sets are identical by construction, so any rank
    disagreement measured here is attributable to weight sharing alone."""
    level0, level1 = _level01_confs()
    args = make_args(drpt=0.0, epochs=1)
    spec, extractor, btree = build(args)
    loaders = _ws_loaders()
    sizes = {k: v.dataset_size for k, v in loaders.items()}

    def run(ws_on):
        from mfas_tpu.core.sched import FixedScheduler

        trainer = PopulationTrainer(spec, extractor.apply, btree)
        store = {} if ws_on else None
        a0, _, _ = trainer.train_population(
            level0, loaders, sizes, FixedScheduler(1e-3), num_epochs=1,
            input_keys=("image", "audio"), seed=1, shared_state_dict=store)
        a1, params1, _ = trainer.train_population(
            level1, loaders, sizes, FixedScheduler(1e-3), num_epochs=1,
            input_keys=("image", "audio"), seed=2, shared_state_dict=store)
        return (np.asarray(a0), np.asarray(a1),
                {k: np.asarray(v) for k, v in params1.items()})

    a0_on, a1_on, p_on = run(True)
    a0_off, a1_off, p_off = run(False)

    # same seeds/batches: level-0 must agree exactly (store starts empty,
    # inject is a no-op) — proves the two runs differ only by sharing
    np.testing.assert_allclose(a0_on, a0_off, rtol=0, atol=1e-6)
    # level-1 trained weights must NOT be identical: injected level-0
    # weights change the starting point (if this ever fails, sharing
    # became a silent no-op)
    diff = max(np.abs(p_on[k] - p_off[k]).max() for k in p_on)
    assert diff > 1e-4, diff
    rho = _spearman(a1_on, a1_off)
    # rankings with/without the head start broadly agree on a learnable
    # task (measured value recorded in PARITY.md). The floor only guards
    # against anti-correlation regressions.
    assert rho > 0.0, (rho, a1_on, a1_off)
    print(f"isolated pop-ws effect: max param delta {diff:.4f}, "
          f"level-1 ranking rho={rho:.3f}")


def test_population_ws_vs_sequential_ws_ranking():
    """The approximation vs the faithful scheme (reference
    ntu_searchable.py:74-92 propagates the store candidate-to-candidate
    WITHIN a level; the population mode injects before / extracts after
    the whole level): train the same candidate sets through both trainers
    and measure ranking agreement. Measured values are documented in
    docs/PARITY.md §known-deviations."""
    from mfas_tpu.search.trainers import SequentialSearchTrainer

    level0, level1 = _level01_confs()

    args_p = make_args(drpt=0.0, epochs=1, weightsharing=True)
    args_p.population_weightsharing = True
    spec, extractor, btree = build(args_p)
    pop = PopulationSearchTrainer(spec, extractor, btree,
                                  input_keys=("image", "audio"))
    shared_p = {}
    loaders = _ws_loaders()
    p0 = pop(level0, fa.Searchable_Audio_Image_Net, loaders, args_p,
             state_dict=shared_p)
    p1 = pop(level1, fa.Searchable_Audio_Image_Net, loaders, args_p,
             state_dict=shared_p)

    args_s = make_args(drpt=0.0, epochs=1, weightsharing=True)
    seq = SequentialSearchTrainer(
        {"rgbnet": btree["rgbnet"], "audnet": btree["audnet"]},
        ("image", "audio"))
    shared_s = {}
    loaders = _ws_loaders()
    s0 = seq(level0, fa.Searchable_Audio_Image_Net, loaders, args_s,
             state_dict=shared_s)
    s1 = seq(level1, fa.Searchable_Audio_Image_Net, loaders, args_s,
             state_dict=shared_s)

    # both schemes populate the same key space
    assert set(shared_p) == set(shared_s)
    rho0 = _spearman(p0, s0)
    rho1 = _spearman(p1, s1)
    # the two schemes differ numerically (init seeds, common-random-number
    # batches, intra-level propagation) — this measures how much of the
    # RANKING survives. Guard against systematic anti-correlation only;
    # the measured magnitudes live in PARITY.md.
    assert rho0 > -0.5 and rho1 > -0.5, (rho0, rho1)
    print(f"ranking agreement pop-ws vs seq-ws: level0 rho={rho0:.3f} "
          f"level1 rho={rho1:.3f}")
