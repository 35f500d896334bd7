"""NTU backbone shape/tap contracts (SURVEY.md §4.2) on tiny inputs."""

import types

import numpy as np
import pytest

import jax.numpy as jnp

from mfas_tpu.core import Ctx, flatten_tree
from mfas_tpu.models.inflate import inflate_resnet_state, inflate_weight
from mfas_tpu.models.ntu import Skeleton, Visual
from mfas_tpu.models.resnet3d import inflated_resnet50


def ntu_args(**kw):
    d = dict(num_outputs=60, vid_len=(2, 32), drpt=0.2, num_classes=60)
    d.update(kw)
    return types.SimpleNamespace(**d)


def test_skeleton_hcn_tap_contract():
    """Channel dims of the last four hidden taps must equal
    [128, 256, vid_len[1]*32, 512] (ntu_searchable.py:291)."""
    args = ntu_args()
    ske = Skeleton(args)
    tree = ske.init(0)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 3, 32, 25, 2), jnp.float32)
    hidden, logits = ske(tree, Ctx(train=False), x)

    assert len(hidden) == 8
    taps = hidden[-4:]
    assert taps[0].shape == (2, 128, 4, 4)     # conv5 (win!=8 has pool)
    assert taps[1].shape == (2, 256, 2, 2)     # conv6
    assert taps[2].shape == (2, 32 * 32)       # out7 flattened = vid_len[1]*32
    assert taps[3].shape == (2, 512)           # fc7 embedding
    assert logits.shape == (2, 60)

    # state_dict key layout matches the torch module structure
    flat = flatten_tree(tree)
    for k in ("conv1.0.weight", "conv2.weight", "conv3.0.weight",
              "conv4.0.weight", "conv1m.0.weight", "conv5.0.weight",
              "conv6.0.weight", "fc7.0.weight", "fc8.weight"):
        assert k in flat, k
    assert flat["fc7.0.weight"].shape == (512, 1024)


def test_skeleton_window8_variant():
    args = ntu_args(vid_len=(2, 8))
    ske = Skeleton(args)
    tree = ske.init(0)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 3, 8, 25, 2), jnp.float32)
    hidden, logits = ske(tree, Ctx(train=False), x)
    # win==8: conv5 has no pool; lin = 256 * max((8//16)^2, 1) = 256
    assert hidden[-2].shape == (1, 256)
    assert logits.shape == (1, 60)


def test_visual_tap_contract_small():
    """fm channel dims [512, 1024, 2048] + pooled 2048
    (ntu_searchable.py:292)."""
    args = ntu_args()
    vis = Visual(args)
    tree = vis.init(0)
    x = jnp.asarray(np.random.RandomState(1).randn(1, 2, 64, 64, 3), jnp.float32)
    fm1, fm2, fm3, fm4, pooled, logits = vis(tree, Ctx(train=False), x)
    assert fm1.shape == (1, 256, 2, 16, 16)
    assert fm2.shape == (1, 512, 2, 8, 8)
    assert fm3.shape == (1, 1024, 2, 4, 4)
    assert fm4.shape == (1, 2048, 2, 2, 2)
    assert pooled.shape == (1, 2048)
    assert logits.shape == (1, 60)


def test_hcn_motion_branch_matches_torch():
    """Motion = temporal diff re-interpolated to T (reference
    models/central/ntu.py:131-135), torch as oracle."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as TF
    from mfas_tpu.models.ntu import hcn_motion

    rs = np.random.RandomState(0)
    x = rs.randn(2, 3, 16, 25, 2).astype(np.float32)
    N, C, T, V, M = x.shape

    xt = torch.from_numpy(x)
    motion = xt[:, :, 1:] - xt[:, :, :-1]
    motion = motion.permute(0, 1, 4, 2, 3).contiguous().view(N, C * M, T - 1, V)
    motion = TF.interpolate(motion, size=(T, V), mode="bilinear",
                            align_corners=False)
    want = motion.view(N, C, M, T, V).permute(0, 1, 3, 4, 2).numpy()

    got = np.asarray(hcn_motion(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_center_inflation_property():
    w2d = np.random.RandomState(0).randn(4, 3, 3, 3).astype(np.float32)
    w3d = inflate_weight(w2d, 3, "center")
    assert w3d.shape == (4, 3, 3, 3, 3)
    np.testing.assert_array_equal(w3d[:, :, 1], w2d)
    assert np.all(w3d[:, :, 0] == 0) and np.all(w3d[:, :, 2] == 0)
    mean = inflate_weight(w2d, 3, "mean")
    np.testing.assert_allclose(mean[:, :, 0], w2d / 3, rtol=1e-6)


def test_inflated_resnet_framewise_equivalence():
    """With center inflation, an untrained inflated net on a time-replicated
    clip computes every frame independently and identically."""
    net = inflated_resnet50()
    template = flatten_tree(net.init(0))

    # fabricate a '2D torchvision' state_dict: squeeze the time axis
    flat2d = {}
    rs = np.random.RandomState(0)
    for k, v in template.items():
        v = np.asarray(v)
        if v.ndim == 5:
            flat2d[k] = rs.randn(v.shape[0], v.shape[1], v.shape[3],
                                 v.shape[4]).astype(np.float32) * 0.05
        elif k.endswith("running_var"):
            flat2d[k] = np.ones_like(v)
        elif v.ndim >= 1:
            flat2d[k] = rs.randn(*v.shape).astype(np.float32) * 0.05
        else:
            flat2d[k] = v
    flat2d["fc.weight"] = rs.randn(1000, 2048).astype(np.float32)  # dropped
    flat2d["fc.bias"] = rs.randn(1000).astype(np.float32)

    inflated = inflate_resnet_state(flat2d, template)
    assert "fc.weight" not in inflated
    from mfas_tpu.core.module import unflatten_tree
    tree = unflatten_tree({k: jnp.asarray(v) for k, v in inflated.items()})

    frame = np.random.RandomState(2).randn(1, 3, 1, 32, 32).astype(np.float32)
    clip = np.repeat(frame, 2, axis=2)
    fms_clip = net(tree, Ctx(train=False), jnp.asarray(clip))
    fms_single = net(tree, Ctx(train=False), jnp.asarray(frame))
    for fc, fs in zip(fms_clip, fms_single):
        np.testing.assert_allclose(np.asarray(fc[:, :, 0]),
                                   np.asarray(fs[:, :, 0]), rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(np.asarray(fc[:, :, 0]),
                                   np.asarray(fc[:, :, 1]), rtol=2e-3, atol=2e-4)


def test_searchable_net_end_to_end_tiny():
    from mfas_tpu.fusion.ntu import Searchable_Skeleton_Image_Net
    args = ntu_args(inner_representation_size=16, drpt=0.5, batchnorm=True,
                    multitask=True, alphas=True)
    conf = np.array([[3, 1, 1], [1, 3, 0]])
    net = Searchable_Skeleton_Image_Net(args, conf)
    tree = net.init(0)
    rgb = jnp.asarray(np.random.RandomState(0).randn(2, 2, 64, 64, 3), jnp.float32)
    ske = jnp.asarray(np.random.RandomState(1).randn(2, 3, 32, 25, 2), jnp.float32)
    out, vlog, slog = net(tree, Ctx(train=True, rng=0), (rgb, ske))
    assert out.shape == (2, 60) and vlog.shape == (2, 60) and slog.shape == (2, 60)

    flat = flatten_tree(tree)
    # fusion row 0: in = sizes_ske[3] + sizes_ims[1] = 512 + 1024
    assert flat["fusion_layers.0.0.weight"].shape == (16, 512 + 1024)
    # row 1 adds the hidden size: 256 + 2048 + 16
    assert flat["fusion_layers.1.0.weight"].shape == (16, 256 + 2048 + 16)
    assert "fusion_layers.0.2.running_mean" in flat  # batchnorm position
