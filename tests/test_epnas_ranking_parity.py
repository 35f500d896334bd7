"""Ranking-parity tests for the EPNAS loop (SURVEY.md §4.4): with a fixed
numpy seed and a scripted candidate-accuracy function, the sequence of
sampled configurations must match the reference loop
(models/searchable.py:48-137), because sampler formulas and global-RNG call
order are preserved bit-for-bit.

Two oracles, strongest first:
  * the reference's OWN ``ModelSearcher._epnas`` imported from
    /root/reference and driven with the same scripted train function and a
    deterministic surrogate stub (source of truth);
  * an in-file transliteration of the same loop (kept as a fast
    torch-free cross-check).
"""

import sys
import types

import numpy as np
import pytest

import mfas_tpu.search.tools as tools
from mfas_tpu.search.searcher import ModelSearcher
from mfas_tpu.search.surrogate import SimpleRecurrentSurrogate

REF = "/root/reference"


def make_args():
    return types.SimpleNamespace(
        search_iterations=2, max_progression_levels=3, num_samples=4,
        initial_temperature=10.0, final_temperature=0.2, temperature_decay=4.0,
        epochs_surrogate=5, lr_surrogate=1e-3, verbose=False,
        search_state=None)


def scripted_acc(conf):
    """Deterministic fake accuracy in (0,1), sensitive to the whole conf."""
    c = np.asarray(conf, np.float64)
    return float(0.3 + 0.4 * (np.sin(c.sum() * 0.7) * 0.5 + 0.5) / (1 + 0.1 * len(c)))


def get_layer_confs(progression_index):
    return [[a, b, n] for a in range(3) for b in range(2) for n in range(2)]


class _NullSurrogate:
    """Predicts from the scripted function so the device-side surrogate's
    float behavior can't affect the RNG-order parity being tested."""

    def eval_model(self, conf, device=None):
        return scripted_acc(conf)

    def fit(self, confs, accs, num_epochs, lr):
        return 0.0


def reference_epnas_trace(args):
    """Independent transliteration of the reference loop's sampling
    behavior; records every sampled conf set."""
    temperature = args.initial_temperature
    sampled = []
    trace = []
    for si in range(args.search_iterations):
        for pi in range(args.max_progression_levels):
            rows = get_layer_confs(pi)
            merged = tools.merge_unfolded_with_sampled(sampled, rows, pi)
            accs = [scripted_acc(c) for c in merged]
            # both branches sample identically w.r.t. the global RNG
            sampled = tools.sample_k_configurations(merged, accs,
                                                    args.num_samples, temperature)
            trace.append([np.asarray(c).copy() for c in sampled])
            iteration = si * args.search_iterations + pi
            temperature = tools.compute_temperature(iteration, args)
    return trace


def test_epnas_sampled_sequence_matches_reference_trace():
    args = make_args()

    trace_sampled = []
    real_trained = []

    def train_sampled_fun(confs, model_type, dataloaders, a, device,
                          state_dict=None):
        real_trained.append([np.asarray(c).copy() for c in confs])
        return [scripted_acc(c) for c in confs]

    class Searcher(ModelSearcher):
        def search(self):
            return self._epnas(
                None, {"model": _NullSurrogate()}, None,
                {"train_sampled_fun": train_sampled_fun,
                 "get_layer_confs": get_layer_confs})

    # patch sampling to also record what the searcher sampled
    orig_sample = tools.sample_k_configurations

    def recording_sample(confs, accs, k, t):
        out = orig_sample(confs, accs, k, t)
        trace_sampled.append([np.asarray(c).copy() for c in out])
        return out

    tools.sample_k_configurations = recording_sample
    try:
        np.random.seed(1234)
        s_data = Searcher(args).search()
    finally:
        tools.sample_k_configurations = orig_sample

    np.random.seed(1234)
    want = reference_epnas_trace(args)

    assert len(trace_sampled) == len(want) == 6
    for ours, ref in zip(trace_sampled, want):
        assert len(ours) == len(ref)
        for a, b in zip(ours, ref):
            np.testing.assert_array_equal(a, b)

    # first step trains ALL 12 unfoldings; later steps train K=4 samples
    assert [len(t) for t in real_trained] == [12, 4, 4, 4, 4, 4]

    # surrogate dataloader accumulated every real-trained conf
    n_unique = len({np.asarray(c).tobytes() + bytes([len(c)])
                    for batch in real_trained for c in batch})
    assert len(s_data) == n_unique


@pytest.fixture(scope="module")
def ref_searchable():
    """Import the reference's models/searchable.py (read-only). Its import
    graph needs torchvision (not installed — interface stub only; the
    searcher constructors that would use it are never called) and the
    broken ``models.aux.scheduler`` module (SURVEY §2 bug list)."""
    torch = pytest.importorskip("torch")
    if "models.searchable" in sys.modules and hasattr(
            sys.modules["models.searchable"], "ModelSearcher"):
        import models.search.tools as ref_tools
        return types.SimpleNamespace(S=sys.modules["models.searchable"],
                                     tools=ref_tools, torch=torch)

    from tests.ref_stubs import (install_aux_scheduler_stub,
                                 install_torchvision_stub)
    install_torchvision_stub()
    install_aux_scheduler_stub()

    # the reference's top-level ``datasets`` package collides with the
    # installed huggingface ``datasets``: import with REF at the FRONT of
    # sys.path and any previously imported hf modules parked aside, then
    # restore, keeping only the reference modules we hold references to
    parked = {k: sys.modules.pop(k) for k in list(sys.modules)
              if k == "datasets" or k.startswith("datasets.")}
    sys.path.insert(0, REF)
    try:
        import models.auxiliary.inflated_resnet as ref_inflated
        # zero egress: the reference downloads ImageNet weights on use
        ref_inflated.load_pretrained_2D_weights = lambda *a, **k: None

        import models.search.tools as ref_tools
        import models.searchable as ref_searchable_mod
    finally:
        sys.path.remove(REF)
        for k in list(sys.modules):
            if k == "datasets" or k.startswith("datasets."):
                del sys.modules[k]
        sys.modules.update(parked)
    return types.SimpleNamespace(S=ref_searchable_mod, tools=ref_tools,
                                 torch=torch)


def test_epnas_sampled_sequence_matches_reference_own_loop(ref_searchable):
    """Drive the reference's actual ``ModelSearcher._epnas``
    (/root/reference/models/searchable.py:48-137) and the rebuild's with
    identical np.random seeds, a shared scripted train function, and
    deterministic surrogate stubs; the sampled-configuration sequences,
    the trained-candidate sequences, and the final surrogate datasets
    must agree exactly."""
    torch = ref_searchable.torch
    args = make_args()

    class RefStubSurrogate(torch.nn.Module):
        """torch-side deterministic surrogate: predictions are scripted;
        the trainable parameter only exists so the reference's Adam +
        train_simple_surrogate run unmodified (they touch torch RNG only,
        never numpy — the parity axis under test)."""

        def __init__(self):
            super().__init__()
            self.p = torch.nn.Parameter(torch.zeros(1))

        def forward(self, x):
            # x: (seq_len, N, 3) -> (N, 1), connected to self.p for backward
            return torch.zeros(x.shape[1], 1) + self.p

        def eval_model(self, conf, device=None):
            return scripted_acc(conf)

    ref_trained, ref_sampled = [], []

    def ref_train(confs, model_type, dataloaders, a, device, state_dict=None):
        ref_trained.append([np.asarray(c).copy() for c in confs])
        return [scripted_acc(c) for c in confs]

    ref_tools = ref_searchable.tools
    orig_ref_sample = ref_tools.sample_k_configurations

    def ref_recording_sample(confs, accs, k, t):
        out = orig_ref_sample(confs, accs, k, t)
        ref_sampled.append([np.asarray(c).copy() for c in out])
        return out

    ref_tools.sample_k_configurations = ref_recording_sample
    try:
        np.random.seed(1234)
        searcher = ref_searchable.S.ModelSearcher(args)
        ref_sdata = searcher._epnas(
            None,
            {"model": RefStubSurrogate(), "criterion": torch.nn.MSELoss()},
            None,
            {"train_sampled_fun": ref_train,
             "get_layer_confs": get_layer_confs},
            "cpu")
    finally:
        ref_tools.sample_k_configurations = orig_ref_sample

    # ---- rebuild side, identical seed/script
    our_trained, our_sampled = [], []

    def our_train(confs, model_type, dataloaders, a, device, state_dict=None):
        our_trained.append([np.asarray(c).copy() for c in confs])
        return [scripted_acc(c) for c in confs]

    class Searcher(ModelSearcher):
        def search(self):
            return self._epnas(
                None, {"model": _NullSurrogate()}, None,
                {"train_sampled_fun": our_train,
                 "get_layer_confs": get_layer_confs})

    orig_sample = tools.sample_k_configurations

    def recording_sample(confs, accs, k, t):
        out = orig_sample(confs, accs, k, t)
        our_sampled.append([np.asarray(c).copy() for c in out])
        return out

    tools.sample_k_configurations = recording_sample
    try:
        np.random.seed(1234)
        our_sdata = Searcher(args).search()
    finally:
        tools.sample_k_configurations = orig_sample

    # sampled sequences identical, step by step
    assert len(our_sampled) == len(ref_sampled) == 6
    for ours, theirs in zip(our_sampled, ref_sampled):
        assert len(ours) == len(theirs)
        for a, b in zip(ours, theirs):
            np.testing.assert_array_equal(a, b)

    # the real-trained candidate sets agree (so would every train cost)
    assert len(our_trained) == len(ref_trained)
    for ours, theirs in zip(our_trained, ref_trained):
        for a, b in zip(ours, theirs):
            np.testing.assert_array_equal(a, b)

    # final surrogate datasets agree: same size, same top-5 confs/accs
    assert len(our_sdata) == sum(
        len(d) for d in ref_sdata._dict_data.values())
    k = 5
    our_confs, our_accs, _ = our_sdata.get_k_best(k)
    ref_confs, ref_accs, _ = ref_sdata.get_k_best(k)
    for a, b in zip(our_confs, ref_confs):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(our_accs, np.float64),
                               np.asarray(ref_accs, np.float64))


def test_randsearch_sampled_sequence_matches_reference_own_loop(
        ref_searchable):
    """Drive the reference's actual ``ModelSearcher._randsearch``
    (/root/reference/models/searchable.py:139-174) — including the stale
    loop-index bug in sample_k_configurations_directly (tools.py:112,
    every layer draws from the LAST level's table) — against the
    rebuild's with ``legacy_randsearch_bug=True``: the python-random and
    numpy-random call orders must line up exactly."""
    import random

    args = make_args()
    args.randsearch = True
    args.legacy_randsearch_bug = True

    def make_train(rec):
        def train(confs, model_type, dataloaders, a, device,
                  state_dict=None):
            rec.append([np.asarray(c).copy() for c in confs])
            return [scripted_acc(c) for c in confs]
        return train

    ref_trained, our_trained = [], []

    np.random.seed(77)
    random.seed(99)
    searcher = ref_searchable.S.ModelSearcher(args)
    ref_sdata = searcher._randsearch(
        None, None, {"train_sampled_fun": make_train(ref_trained),
                     "get_layer_confs": get_layer_confs}, "cpu")

    class Searcher(ModelSearcher):
        def search(self):
            return self._randsearch(
                None, None, {"train_sampled_fun": make_train(our_trained),
                             "get_layer_confs": get_layer_confs})

    np.random.seed(77)
    random.seed(99)
    our_sdata = Searcher(args).search()

    assert len(our_trained) == len(ref_trained) == \
        args.search_iterations * args.max_progression_levels
    for ours, theirs in zip(our_trained, ref_trained):
        assert len(ours) == len(theirs)
        for a, b in zip(ours, theirs):
            np.testing.assert_array_equal(a, b)
    assert len(our_sdata) == sum(
        len(g) for g in ref_sdata._dict_data.values())


def test_epnas_with_real_surrogate_runs():
    """Smoke: the full loop with the JAX LSTM surrogate end-to-end."""
    args = make_args()
    args.search_iterations, args.max_progression_levels = 1, 2

    def train_sampled_fun(confs, model_type, dataloaders, a, device,
                          state_dict=None):
        return [scripted_acc(c) for c in confs]

    class Searcher(ModelSearcher):
        def search(self):
            surr = SimpleRecurrentSurrogate(8, 3, 8, seed=0)
            return self._epnas(
                None, {"model": surr}, None,
                {"train_sampled_fun": train_sampled_fun,
                 "get_layer_confs": get_layer_confs})

    np.random.seed(0)
    s_data = Searcher(args).search()
    confs, accs, _ = s_data.get_k_best(3)
    assert len(confs) == 3
    assert all(0.0 < a < 1.0 for a in accs)
