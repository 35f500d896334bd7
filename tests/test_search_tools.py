"""Unit tests for the search primitives (SURVEY.md §4.1/§4.4)."""

import types

import numpy as np
import pytest

from mfas_tpu.search import tools
from mfas_tpu.search.surrogate import SimpleRecurrentSurrogate, SurrogateDataloader
from mfas_tpu.fusion import avmnist as fa, ntu as fn


def args_ns(**kw):
    d = dict(initial_temperature=10.0, final_temperature=0.2,
             temperature_decay=4.0, epochs_surrogate=20, lr_surrogate=1e-3)
    d.update(kw)
    return types.SimpleNamespace(**d)


def test_temperature_schedule_golden():
    a = args_ns()
    # golden values of (T0-Tf)*exp(-(it+1)^2/sigma^2)+Tf
    for it in range(8):
        want = (10.0 - 0.2) * np.exp(-((it + 1.0) ** 2) / 16.0) + 0.2
        assert tools.compute_temperature(it, a) == want
    assert abs(tools.compute_temperature(0, a) - 9.406248) < 1e-5
    assert abs(tools.compute_temperature(11, a) - 0.2) < 2e-3


def test_merge_unfold_counts_ntu():
    rows = fn.get_possible_layer_configurations(0)
    assert len(rows) == 32
    first = tools.merge_unfolded_with_sampled([], rows, 0)
    assert len(first) == 32 and first[0].shape == (1, 3)
    # 15 sampled one-row confs unfolded at layer 1 -> 15*32 = 480 candidates
    sampled = [np.array([[i % 4, i % 4, i % 2]]) for i in range(15)]
    second = tools.merge_unfolded_with_sampled(sampled, rows, 1)
    assert len(second) == 480 and second[0].shape == (2, 3)
    # substitution when layer < len(prev): same length, row replaced
    prev = [np.array([[0, 0, 0], [1, 1, 1]])]
    sub = tools.merge_unfolded_with_sampled(prev, [[3, 3, 1]], 0)
    assert sub[0].shape == (2, 3)
    np.testing.assert_array_equal(sub[0][0], [3, 3, 1])
    np.testing.assert_array_equal(sub[0][1], [1, 1, 1])


def test_sample_k_reproducible_and_temperature_sharpens():
    confs = [np.array([[i, 0, 0]]) for i in range(10)]
    accs = np.linspace(0.1, 1.0, 10)

    np.random.seed(7)
    a = tools.sample_k_configurations(confs, accs, 3, 10.0)
    np.random.seed(7)
    b = tools.sample_k_configurations(confs, accs, 3, 10.0)
    assert all(np.array_equal(x, y) for x, y in zip(a, b))

    # at very low temperature, sampling concentrates on the best confs
    np.random.seed(0)
    cold = [tools.sample_k_configurations(confs, accs, 1, 0.01)[0][0, 0]
            for _ in range(20)]
    assert np.mean(np.array(cold) >= 8) > 0.9


def test_surrogate_dataloader_dedup_keeps_max():
    d = SurrogateDataloader()
    c = np.array([[1, 2, 0]])
    d.add_datum(c, 0.4)
    d.add_datum(c, 0.7)
    d.add_datum(c, 0.5)
    d.add_datum(np.array([[1, 2, 0], [0, 0, 1]]), 0.9)
    confs, accs = d.get_data()
    assert len(confs) == 2  # two seq-length groups
    assert confs[0].shape == (1, 1, 3) and accs[0][0, 0] == np.float32(0.7)
    assert confs[1].shape == (2, 1, 3)
    assert len(d) == 2

    best_confs, best_accs, idx = d.get_k_best(1)
    assert best_accs[0] == 0.9 and best_confs[0].shape == (2, 3)

    # state round-trip
    d2 = SurrogateDataloader.from_state(d.state())
    c2, a2 = d2.get_data()
    for x, y in zip(c2, confs):
        np.testing.assert_array_equal(x, y)


def test_get_k_best_zero_and_empty_store():
    """k=0 must return NOTHING (argpartition's [-0:] slice returned
    everything) and an empty store must not crash — callers clamp with
    min(k, len(store)), which is exactly 0 on a fresh search state
    (e.g. tools/search_report.py on a zero-iteration state)."""
    d = SurrogateDataloader()
    confs, accs, idx = d.get_k_best(0)          # empty store, k=0
    assert confs == [] and accs == [] and len(idx) == 0
    confs, accs, idx = d.get_k_best(5)          # empty store, k>0
    assert confs == [] and accs == [] and len(idx) == 0
    d.add_datum(np.array([[1, 2, 0]]), 0.4)
    confs, accs, idx = d.get_k_best(0)          # k=0, nonempty store
    assert confs == [] and accs == []
    confs, accs, idx = d.get_k_best(10)         # k > store size: clamp
    assert len(confs) == 1 and np.isclose(accs[0], 0.4)


def test_surrogate_learns_ranking():
    surr = SimpleRecurrentSurrogate(16, 3, 16, seed=0)
    d = SurrogateDataloader()
    rs = np.random.RandomState(0)
    # synthetic truth: accuracy grows with first column of first row
    for _ in range(40):
        L = rs.randint(1, 4)
        conf = rs.randint(0, 4, size=(L, 3))
        acc = 0.2 + 0.15 * conf[0, 0] + 0.01 * rs.randn()
        d.add_datum(conf, float(np.clip(acc, 0, 1)))
    confs, accs = d.get_data()
    loss0 = surr.fit(confs, accs, num_epochs=1, lr=1e-3)
    loss1 = surr.fit(confs, accs, num_epochs=200, lr=1e-3)
    assert loss1 < loss0

    lo = surr.eval_model(np.array([[0, 0, 0]]))
    hi = surr.eval_model(np.array([[3, 0, 0]]))
    assert hi > lo


def test_surrogate_batched_eval_matches_per_conf():
    """eval_models (one dispatch per bucket) must agree with the per-conf
    eval_model path for mixed sequence lengths — batching only changes
    the batch axis, never a prediction."""
    surr = SimpleRecurrentSurrogate(8, 3, 8, seed=3, max_seq_len=4)
    rs = np.random.RandomState(0)
    confs = [rs.randint(0, 4, (L, 3)) for L in (1, 3, 2, 4, 1, 2, 3)]
    batched = surr.eval_models(confs)
    single = [surr.eval_model(c) for c in confs]
    np.testing.assert_allclose(batched, single, rtol=1e-5, atol=1e-6)
    assert surr.eval_models([]) == []
    # tools routes through the batched path for the real surrogate
    import mfas_tpu.search.tools as tools
    np.testing.assert_allclose(
        tools.predict_accuracies_with_surrogate(confs, surr), batched,
        rtol=0, atol=0)


def test_surrogate_length_masking_is_exact():
    """Padded+length-masked prediction must equal the unpadded one: the
    LSTM state at step l-1 is independent of later (padded) inputs."""
    import jax.numpy as jnp
    from mfas_tpu.core.module import Ctx

    surr = SimpleRecurrentSurrogate(8, 3, 8, seed=0, max_seq_len=4)
    conf = np.array([[1, 2, 0], [3, 0, 1]], np.float32)

    # direct unpadded forward through the net
    seq = jnp.asarray(conf[:, None, :])
    want = float(surr.net.apply(surr.params, Ctx(), seq)[0, 0])
    got = surr.eval_model(conf)
    assert got == pytest.approx(want, abs=1e-6)

    # garbage in the padding slots must not change the result
    seq_pad = np.zeros((4, 1, 3), np.float32)
    seq_pad[:2, 0] = conf
    seq_pad[2:] = 99.0
    got_pad = float(surr.net.apply(surr.params, Ctx(), jnp.asarray(seq_pad),
                                   jnp.asarray([2]))[0, 0])
    assert got_pad == pytest.approx(want, abs=1e-6)


def test_randsearch_sampler_layer_spaces():
    import random
    spaces = {0: [[0, 0, 0]], 1: [[1, 1, 1]], 2: [[2, 2, 2]], 3: [[3, 3, 3]]}
    get = lambda i: spaces[i]  # noqa: E731
    random.seed(0)
    np.random.seed(0)
    confs = tools.sample_k_configurations_directly(8, 4, get)
    for c in confs:
        for layer, row in enumerate(c):
            np.testing.assert_array_equal(row, spaces[layer][0])
    # legacy mode reproduces the reference's stale-index behavior
    random.seed(0)
    np.random.seed(0)
    legacy = tools.sample_k_configurations_directly(8, 4, get, legacy_bug=True)
    for c in legacy:
        for row in c:
            np.testing.assert_array_equal(row, spaces[3][0])
