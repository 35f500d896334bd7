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
