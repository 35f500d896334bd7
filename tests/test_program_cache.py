"""Process-level compiled-program sharing (population.population_programs,
surrogate._surrogate_programs).

A fresh searcher in a warm process must not re-enter compilation: trainers
constructed with an equal (program_key, spec, mesh) share one jitted
program set. Safety property pinned here: the shared programs hold NO
device arrays — weights always enter as arguments — so a second trainer
with different backbone WEIGHTS (same architecture) gets its own numbers
through the first trainer's programs.
"""

import types

import numpy as np
import pytest

import jax.numpy as jnp

from mfas_tpu.core.module import Ctx
from mfas_tpu.search.population import (PopulationSpec, PopulationTrainer,
                                        pad_taps, population_programs)
from mfas_tpu.search.surrogate import SimpleRecurrentSurrogate


def _avmnist_setup(seed):
    from mfas_tpu.fusion.avmnist import AVMnistFeatureExtractor, tap_sizes

    args = types.SimpleNamespace(channels=4, num_outputs=5,
                                 inner_representation_size=8, drpt=0.0,
                                 multitask=False, alphas=False,
                                 batchnorm=False)
    extractor = AVMnistFeatureExtractor(args)
    tree = extractor.init(seed)
    sizes_a, sizes_b = tap_sizes(args)
    spec = PopulationSpec(
        sizes_a=tuple(sizes_a), sizes_b=tuple(sizes_b), hidden=8,
        num_outputs=5, max_rows=2)
    return extractor, tree, spec


def test_equal_key_shares_programs_weights_stay_per_instance():
    ex1, tree1, spec = _avmnist_setup(0)
    ex2, tree2, _ = _avmnist_setup(1)          # new instance, new weights
    key = ("avmnist-test", 4, 5)
    t1 = PopulationTrainer(spec, ex1.apply, tree1, program_key=key)
    t2 = PopulationTrainer(spec, ex2.apply, tree2, program_key=key)

    # one compiled-program set between them
    assert t1._features is t2._features
    assert t1._train_epoch is t2._train_epoch
    assert t1._train_step is t2._train_step

    # ... but each trainer's numbers come from ITS backbone weights
    rs = np.random.RandomState(3)
    inputs = (jnp.asarray(rs.randn(2, 1, 28, 28).astype(np.float32)),
              jnp.asarray(rs.randn(2, 1, 112, 112).astype(np.float32)))
    rng = jnp.zeros(2, jnp.uint32)
    fa1, *_ = t1._features(tree1, inputs, rng, train=False)
    fa2, *_ = t2._features(tree2, inputs, rng, train=False)
    assert not np.allclose(np.asarray(fa1), np.asarray(fa2))

    # and match a direct (unshared) forward of that extractor
    taps_a, _, _, _ = ex2.apply(tree2, Ctx(train=False), inputs)
    want = np.asarray(pad_taps(taps_a, spec.cmax_a))
    np.testing.assert_allclose(np.asarray(fa2), want, rtol=1e-6, atol=1e-6)


def test_no_key_means_no_sharing():
    ex1, tree1, spec = _avmnist_setup(0)
    t1 = PopulationTrainer(spec, ex1.apply, tree1)
    t2 = PopulationTrainer(spec, ex1.apply, tree1)
    assert t1._features is not t2._features


def test_different_spec_or_key_not_shared():
    ex1, tree1, spec = _avmnist_setup(0)
    spec2 = PopulationSpec(sizes_a=spec.sizes_a, sizes_b=spec.sizes_b,
                           hidden=16, num_outputs=5, max_rows=2)
    key = ("avmnist-test2", 4, 5)
    t1 = PopulationTrainer(spec, ex1.apply, tree1, program_key=key)
    t2 = PopulationTrainer(spec2, ex1.apply, tree1, program_key=key)
    t3 = PopulationTrainer(spec, ex1.apply, tree1,
                           program_key=("other", 4, 5))
    assert t1._features is not t2._features
    assert t1._features is not t3._features
    # factory returns the same host for the same triple
    assert population_programs(spec, ex1.apply, None, None, key) \
        is population_programs(spec, ex1.apply, None, None, key)


def test_surrogate_programs_shared_params_private():
    s1 = SimpleRecurrentSurrogate(10, 3, 10, seed=0, max_seq_len=2)
    s2 = SimpleRecurrentSurrogate(10, 3, 10, seed=1, max_seq_len=2)
    s3 = SimpleRecurrentSurrogate(12, 3, 10, seed=0, max_seq_len=2)
    assert s1._predict is s2._predict
    assert s1._fit_scan is s2._fit_scan
    assert s1._predict is not s3._predict

    conf = np.array([[1.0, 2.0, 0.0]], np.float32)
    v1, v2 = s1.eval_model(conf), s2.eval_model(conf)
    assert v1 != v2                      # per-instance params (seeds differ)

    # training updates only the trained instance
    before = s1.eval_model(conf)
    s2.fit([conf[:, None, :]], [np.array([[0.9]], np.float32)],
           num_epochs=3, lr=1e-2)
    assert s1.eval_model(conf) == pytest.approx(before)
