"""NTU hand-built fusion baselines (reference models/central/ntu.py:186-297)
smoke tests on tiny shapes."""

import types

import numpy as np
import pytest

import jax.numpy as jnp

from mfas_tpu.core import Ctx, flatten_tree
from mfas_tpu.models.ntu import GMU, CentralNet, LateFusion


def ntu_args(**kw):
    d = dict(num_outputs=60, vid_len=(2, 32), drpt=0.2, num_classes=60)
    d.update(kw)
    return types.SimpleNamespace(**d)


def _inputs(b=1):
    rs = np.random.RandomState(0)
    rgb = jnp.asarray(rs.randn(b, 2, 64, 64, 3), jnp.float32)
    ske = jnp.asarray(rs.randn(b, 3, 32, 25, 2), jnp.float32)
    return rgb, ske


def test_late_fusion_forward():
    args = ntu_args()
    net = LateFusion(args)
    tree = net.init(0)
    out = net(tree, Ctx(train=False), _inputs())
    assert out.shape == (1, 60)


def test_gmu_forward():
    args = ntu_args()
    net = GMU(args)
    tree = net.init(0)
    out = net(tree, Ctx(train=False), _inputs())
    assert out.shape == (1, 60)
    # gate sized from the flattened-out7 tap: 256*(32//16)^2 = 1024 at the
    # default window; equals the reference's hardcoded 256 at window<=16
    flat = flatten_tree(tree)
    assert flat["skel_redu.0.weight"].shape == (128, 1024)
    assert flat["ponderation.0.weight"].shape == (1, 2048 + 1024)
    args16 = ntu_args(vid_len=(2, 16))
    flat16 = flatten_tree(GMU(args16).init(0))
    assert flat16["skel_redu.0.weight"].shape == (128, 256)
    assert flat16["ponderation.0.weight"].shape == (1, 2048 + 256)


def test_gmu_uses_out7_tap_not_fc7():
    """Pin the tap identity: zeroing fc7/fc8 weights must NOT change the
    GMU output (the gate reads the pre-fc7 flattened map out7)."""
    args = ntu_args(drpt=0.0)
    net = GMU(args)
    tree = net.init(0)
    # random-init ResNet activations (~1e2) saturate the sigmoid gate and
    # drown the skeleton branch below float32 resolution; zero the gate's
    # visual columns so z is driven by the skeleton tap alone and the test
    # can observe which tap feeds it
    w = tree["ponderation"]["0"]["weight"]
    tree["ponderation"]["0"]["weight"] = w.at[:, :2048].set(0.0)
    inputs = _inputs()
    base = np.asarray(net(tree, Ctx(train=False), inputs))

    import copy
    t2 = copy.deepcopy(tree)
    t2["skeleton"]["fc8"]["weight"] = jnp.zeros_like(
        t2["skeleton"]["fc8"]["weight"])
    t2["skeleton"]["fc7"]["0"]["weight"] = jnp.zeros_like(
        t2["skeleton"]["fc7"]["0"]["weight"])
    out = np.asarray(net(t2, Ctx(train=False), inputs))
    np.testing.assert_array_equal(out, base)

    # ...while zeroing conv6 (which feeds out7) MUST change it
    t3 = copy.deepcopy(tree)
    t3["skeleton"]["conv6"]["0"]["weight"] = jnp.zeros_like(
        t3["skeleton"]["conv6"]["0"]["weight"])
    out3 = np.asarray(net(t3, Ctx(train=False), inputs))
    assert not np.allclose(out3, base)


def test_centralnet_forward_and_param_keys():
    args = ntu_args()
    net = CentralNet(args)
    tree = net.init(0)
    flat = flatten_tree(tree)
    # ParameterList-style keys (torch: alphas_a.0 etc.)
    assert "alphas_a.0" in flat and flat["alphas_a.0"].shape == (1,)
    assert "central_conv.0.0.weight" in flat
    # the central column's geometry (conv4/2 stages + 7x7 avgpool) needs the
    # full 224x224 resolution the reference ran at; single frame keeps the
    # CPU cost down
    args2 = ntu_args(vid_len=(1, 32))
    net2 = CentralNet(args2)
    tree2 = net2.init(0)
    rs = np.random.RandomState(0)
    rgb = jnp.asarray(rs.randn(1, 1, 224, 224, 3), jnp.float32)
    ske = jnp.asarray(rs.randn(1, 3, 32, 25, 2), jnp.float32)
    out = net2(tree2, Ctx(train=False), (rgb, ske))
    assert out.shape == (1, 60)
