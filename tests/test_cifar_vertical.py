"""CIFAR micro-cell vertical tests."""

import types

import numpy as np
import pytest

import jax.numpy as jnp

from mfas_tpu.core import Ctx, flatten_tree
from mfas_tpu.data.cifar import (CifarLoader, cutout, load_cifar10_arrays,
                                 make_synthetic_cifar, random_crop_flip)
from mfas_tpu.fusion import cifar as fc
from mfas_tpu.models import enas_cell as E


def cifar_args(**kw):
    d = dict(num_outputs=10, planes=8, net_str=[1, 2, 1], img_size=32,
             drop_path=0.1, drop_prob=0.2, batchsize=8, epochs=1,
             eta_max=1e-3, eta_min=1e-6, Ti=1, Tm=2, verbose=False,
             weightsharing=False, use_dataparallel=False)
    d.update(kw)
    return types.SimpleNamespace(**d)


def test_layer_conf_enumeration():
    rows = fc.get_possible_layer_configurations(0)
    # 5*4 op pairs (op1 != op2) x 2x2 connections
    assert len(rows) == 20 * 4
    assert all(r[0] != r[1] for r in rows)
    assert all(-2 <= r[2] < 0 and -2 <= r[3] < 0 for r in rows)
    rows2 = fc.get_possible_layer_configurations(2)
    assert len(rows2) == 20 * 16


def test_create_op_variants():
    for t in range(10):
        op = E.CreateOp(t, 4, 4)
        tree = op.init(0)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 8, 8), jnp.float32)
        out = op(tree, Ctx(train=False), x)
        assert out.shape == (2, 4, 8, 8)


def test_factorized_reduction_halves_spatial():
    fr = E.FactorizedReduction(4, 8)
    tree = fr.init(0)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 8, 8), jnp.float32)
    out = fr(tree, Ctx(train=False), x)
    assert out.shape == (2, 8, 4, 4)


def test_droppath_semantics():
    dp = E.DropPath(keep_prob=0.0)  # always drop
    x = jnp.ones((2, 3))
    out, dropped = dp({}, Ctx(train=True, rng=0), x)
    assert bool(dropped) is True
    np.testing.assert_array_equal(np.asarray(out), 0.0)
    # but not when the sibling already dropped
    out2, _ = dp({}, Ctx(train=True, rng=0), x, other_dropped=True)
    assert np.all(np.asarray(out2) != 0.0)
    # eval mode: identity
    out3, d3 = dp({}, Ctx(train=False), x)
    np.testing.assert_array_equal(np.asarray(out3), np.asarray(x))


def test_micro_cnn_forward_search_and_fixed():
    args = cifar_args()
    conf = np.array([[0, 1, -2, -1], [2, 3, -2, 0]])
    net = fc.Searchable_MicroCNN(args, conf)
    tree = net.init(0)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 3, 32, 32), jnp.float32)
    out, iout = net(tree, Ctx(train=True, rng=0), x)
    assert out.shape == (2, 10) and iout.shape == (2, 10)

    args2 = cifar_args()
    fixed = fc.Searchable_MicroCNN(args2, conf, fixed=True)
    ftree = fixed.init(0)
    fout, fiout = fixed(ftree, Ctx(train=False), x)
    assert fout.shape == (2, 10)
    assert args2.planes == 16  # doubled at the reduction point (fixed mode)


def test_cifar_data_pipeline(tmp_path):
    make_synthetic_cifar(str(tmp_path), n_per_batch=10)
    arrays = load_cifar10_arrays(str(tmp_path), train=True)
    assert arrays["image"].shape == (50, 3, 32, 32)
    rng = np.random.RandomState(0)
    aug = random_crop_flip(arrays["image"][:4], rng)
    assert aug.shape == (4, 3, 32, 32)
    cut = cutout(arrays["image"][:2], rng, length=8)
    assert (cut == 0).sum() >= 2 * 3 * 16  # holes zeroed

    loader = CifarLoader(arrays, 16, train=True)
    batch = next(iter(loader))
    assert batch["image"].shape == (16, 3, 32, 32)
    assert batch["_mask"].sum() == 16


def test_cifar_search_trainer_end_to_end(tmp_path):
    from mfas_tpu.search.trainers import CifarSearchTrainer
    make_synthetic_cifar(str(tmp_path), n_per_batch=8)
    arrays = load_cifar10_arrays(str(tmp_path), train=True)
    args = cifar_args(weightsharing=True)
    loaders = {"train": CifarLoader(arrays, 8, train=True,
                                    indices=np.arange(0, 32)),
               "dev": CifarLoader(arrays, 8, indices=np.arange(32, 40))}
    trainer = CifarSearchTrainer()
    shared = {}
    confs = [np.array([[0, 1, -2, -1]]), np.array([[1, 2, -1, -2]])]
    accs = trainer(confs, fc.Searchable_MicroCNN, loaders, args,
                   state_dict=shared)
    assert len(accs) == 2 and all(0 <= a <= 1 for a in accs)
    assert any(k.startswith("op1.") for k in shared)
    assert "input_conv" in shared
