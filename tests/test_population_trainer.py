"""Tests for the vmap population trainer (SURVEY.md §7.3 hard part 1):
padded/masked population training must behave like per-candidate training."""

import types

import numpy as np
import pytest

import jax.numpy as jnp

from mfas_tpu.core.module import Ctx, tree_set
from mfas_tpu.core.sched import FixedScheduler, LRCosineAnnealingScheduler
from mfas_tpu.data.loader import ArrayLoader
from mfas_tpu.fusion import avmnist as fa
from mfas_tpu.search.population import (PopulationSpec, PopulationTrainer,
                                        encode_confs, init_population)
from mfas_tpu.search.trainers import PopulationSearchTrainer, SequentialSearchTrainer
from tests.test_avmnist_vertical import make_args, synthetic_avmnist


def build(args):
    spec = PopulationSpec(
        sizes_a=tuple(fa.tap_sizes(args)[0]), sizes_b=tuple(fa.tap_sizes(args)[1]),
        hidden=args.inner_representation_size, num_outputs=args.num_outputs,
        max_rows=4, batchnorm=False, drpt=args.drpt,
        use_alphas=args.alphas, multitask=args.multitask)
    extractor = fa.AVMnistFeatureExtractor(args)
    btree = extractor.init(0)
    return spec, extractor, btree


def test_encode_and_init_shapes():
    args = make_args()
    spec, _, _ = build(args)
    confs = [np.array([[0, 0, 0]]),
             np.array([[4, 2, 1], [1, 1, 0], [2, 0, 1]])]
    enc = encode_confs(confs, spec)
    assert enc["sel_a"].shape == (2, 4)
    np.testing.assert_array_equal(enc["row_mask"][0], [1, 0, 0, 0])
    np.testing.assert_array_equal(enc["row_mask"][1], [1, 1, 1, 0])

    params, bn = init_population(confs, spec, seed=0)
    P, R = 2, 4
    H, In = spec.hidden, spec.in_max
    assert params["W"].shape == (P, R, H, In)
    # padded input columns of candidate 0, row 0 are zero:
    w = np.asarray(params["W"][0, 0])
    na, nb = spec.sizes_a[0], spec.sizes_b[0]
    assert np.all(w[:, na:spec.cmax_a] == 0)          # audio padding
    assert np.all(w[:, spec.cmax_a + nb:] == 0)       # image padding + prev
    assert np.any(w[:, :na] != 0)
    # true-fan-in bound: row0 of candidate 1 has fan_in 16ch+4ch
    b = 1.0 / np.sqrt(16 * args.channels + 4 * args.channels)
    w1 = np.asarray(params["W"][1, 0])
    assert np.abs(w1).max() <= b + 1e-7


def test_population_matches_single_candidate_forward():
    """A population of one conf must compute exactly the Searchable net's
    forward (eval mode, no dropout/alphas), modulo the padding machinery."""
    args = make_args(drpt=0.0)
    spec, extractor, btree = build(args)
    conf = np.array([[4, 2, 0], [0, 1, 1]])

    net = fa.Searchable_Audio_Image_Net(args, conf)
    tree = net.init(0)
    # share the SAME backbone weights
    tree = tree_set(tree, "rgbnet", btree["rgbnet"])
    tree = tree_set(tree, "audnet", btree["audnet"])

    trainer = PopulationTrainer(spec, extractor.apply, btree)
    params, bn_state = init_population([conf], spec, seed=3)
    # copy the net's fusion weights into the padded population slots
    W = np.asarray(params["W"]).copy()
    B_ = np.asarray(params["b"]).copy()
    ca, cb, H = spec.cmax_a, spec.cmax_b, spec.hidden
    for r in range(2):
        lw = np.asarray(tree["fusion_layers"][str(r)]["0"]["weight"])
        lb = np.asarray(tree["fusion_layers"][str(r)]["0"]["bias"])
        na = spec.sizes_a[conf[r, 0]]
        nb = spec.sizes_b[conf[r, 1]]
        W[0, r] = 0.0
        W[0, r, :, :na] = lw[:, :na]
        W[0, r, :, ca:ca + nb] = lw[:, na:na + nb]
        if r > 0:
            W[0, r, :, ca + cb:] = lw[:, na + nb:]
        B_[0, r] = lb
    params["W"] = jnp.asarray(W)
    params["b"] = jnp.asarray(B_)
    params["cls_w"] = jnp.asarray(tree["central_classifier"]["weight"])[None]
    params["cls_b"] = jnp.asarray(tree["central_classifier"]["bias"])[None]

    data = synthetic_avmnist(6)
    inputs = (jnp.asarray(data["image"]), jnp.asarray(data["audio"]))
    want = np.asarray(net(tree, Ctx(train=False), inputs))

    fa_, fb_, lb_, la_ = trainer._features(btree, inputs,
                                           jnp.zeros(2, jnp.uint32), train=False)
    enc = {k: jnp.asarray(v) for k, v in encode_confs([conf], spec).items()}
    from mfas_tpu.search.population import _candidate_forward
    got, _ = _candidate_forward(spec,
                                {k: v[0] for k, v in params.items()},
                                {"mean": jnp.zeros((4, H)), "var": jnp.ones((4, H))},
                                {k: v[0] for k, v in enc.items()},
                                fa_, fb_, False,
                                jnp.zeros(2, jnp.uint32))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_population_trains_and_beats_chance():
    args = make_args(drpt=0.0)
    spec, extractor, btree = build(args)
    data = synthetic_avmnist(64)
    loaders = {"train": ArrayLoader(data, 8, shuffle=True, seed=1),
               "dev": ArrayLoader(data, 8)}
    sizes = {k: v.dataset_size for k, v in loaders.items()}

    confs = [np.array([[4, 2, 0]]), np.array([[0, 0, 1]]),
             np.array([[2, 1, 0], [4, 2, 0]])]
    trainer = PopulationTrainer(spec, extractor.apply, btree)
    sched = FixedScheduler(1e-2)
    accs, params, bn = trainer.train_population(
        confs, loaders, sizes, sched, num_epochs=6,
        input_keys=("image", "audio"))
    assert len(accs) == 3
    assert max(accs) > 0.2  # memorization beats 0.1 chance


def test_population_trainer_as_train_sampled_fun():
    args = make_args(drpt=0.0, epochs=2)
    spec, extractor, btree = build(args)
    data = synthetic_avmnist(32)
    loaders = {"train": ArrayLoader(data, 8, shuffle=True, seed=1),
               "dev": ArrayLoader(data, 8)}

    pop = PopulationSearchTrainer(spec, extractor, btree,
                                  input_keys=("image", "audio"))
    confs = [np.array([[4, 2, 0]]), np.array([[1, 1, 1]])]
    accs = pop(confs, fa.Searchable_Audio_Image_Net, loaders, args)
    assert len(accs) == 2 and all(0.0 <= a <= 1.0 for a in accs)
