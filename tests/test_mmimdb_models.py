"""MM-IMDB model family shape/contract tests."""

import types

import numpy as np
import pytest

import jax.numpy as jnp

from mfas_tpu.core import Ctx, flatten_tree
from mfas_tpu.core import functional as F
from mfas_tpu.models import mm_imdb as M


def imdb_args(**kw):
    d = dict(num_outputs=23, channels=16, fusetype="cat", fusingmix="11,24")
    d.update(kw)
    return types.SimpleNamespace(**d)


def test_maxout_mlp_shapes():
    args = imdb_args()
    net = M.MaxOut_MLP(args, first_hidden=32, number_input_feats=100)
    tree = net.init(0)
    x = jnp.asarray(np.random.RandomState(0).randn(4, 100), jnp.float32)
    o1, o3, o5 = net(tree, Ctx(train=False), x)
    assert o1.shape == (4, 32) and o3.shape == (4, 64) and o5.shape == (4, 23)
    flat = flatten_tree(tree)
    assert flat["op1.lin.weight"].shape == (32 * 5, 100)


def test_simple_recurrent_model_picks_last_valid_step():
    args = imdb_args(num_outputs=7)
    net = M.SimpleRecurrentModel(args, num_hidden=16, number_input_feats=10)
    tree = net.init(0)
    x = np.random.RandomState(0).randn(3, 12, 10).astype(np.float32)
    lens = np.array([12, 5, 1], np.int32)
    out = net(tree, Ctx(train=False), jnp.asarray(x), jnp.asarray(lens))
    assert out.shape == (3, 7)
    # changing padding beyond a sample's length must not change its output
    x2 = x.copy()
    x2[1, 6:] = 99.0
    out2 = net(tree, Ctx(train=False), jnp.asarray(x2), jnp.asarray(lens))
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(out2[1]),
                               rtol=1e-5, atol=1e-6)


def test_gp_vgg_taps_all_512():
    args = imdb_args()
    net = M.GP_VGG(args)
    tree = net.init(0)
    x = jnp.asarray(np.random.RandomState(1).randn(1, 3, 64, 64) * 0.1,
                    jnp.float32)
    g1, g2, g3, g4, logits = net(tree, Ctx(train=False), x)
    for g in (g1, g2, g3, g4):
        assert g.shape == (1, 512)
    assert logits.shape == (1, 23)
    flat = flatten_tree(tree)
    assert flat["vgg.0.weight"].shape == (64, 3, 3, 3)
    assert flat["vgg.34.weight"].shape == (512, 512, 3, 3)  # torchvision idx


def test_vggt_centralnet_v2_forward_and_alpha_keys():
    args = imdb_args(fusetype="wsum")
    net = M.VGGT_CentralNetV2(args, text_first_hidden=256)
    tree = net.init(0)
    flat = flatten_tree(tree)
    # bare nn.Parameter state keys (no suffix)
    assert flat["alpha1_feat1"].shape == (1, 512)
    assert flat["alpha_conv1"].shape == (1, 16)

    text = jnp.asarray(np.random.RandomState(0).randn(2, 300), jnp.float32)
    image = jnp.asarray(np.random.RandomState(1).randn(2, 3, 64, 64) * 0.1,
                        jnp.float32)
    t_out, im_out, fusion_out = net(tree, Ctx(train=False), text, image)
    assert fusion_out.shape == (2, 23)


def test_simplevt_centralnet_forward():
    args = imdb_args(fusingmix="11,23", fusetype="wsum")
    net = M.SimpleVT_CentralNet(args, text_first_hidden=128, image_channels=3)
    tree = net.init(0)
    text = jnp.asarray(np.random.RandomState(0).randn(2, 300), jnp.float32)
    image = jnp.asarray(np.random.RandomState(1).randn(2, 3, 64, 64), jnp.float32)
    t_out, im_out, fusion_out = net(tree, Ctx(train=False), text, image)
    assert fusion_out.shape == (2, 23)
    assert flatten_tree(tree)["alpha1_feat1"].shape == (1,)


def test_weighted_bce_matches_reference_formula():
    logits = np.random.RandomState(0).randn(4, 6).astype(np.float32)
    targets = (np.random.RandomState(1).rand(4, 6) > 0.5).astype(np.float32)
    w = 3.0
    x = 1.0 / (1.0 + np.exp(-logits))
    want = np.mean(w * targets * -np.log(x) + (1 - targets) * -np.log(1 - x))
    got = float(F.weighted_bce_with_logits(jnp.asarray(logits),
                                           jnp.asarray(targets), w))
    assert got == pytest.approx(want, rel=1e-5)
    # the stable logsumexp form is algebraically identical in-range
    got_stable = float(F.weighted_bce_with_logits(
        jnp.asarray(logits), jnp.asarray(targets), w, stable=True))
    assert got_stable == pytest.approx(want, rel=1e-5)


def test_weighted_bce_overflow_nan_parity_and_stable_opt_in():
    """The legacy form must NaN exactly where the reference NaNs (float32
    sigmoid saturates at |x|~90 -> log(0)*0 = NaN; the MM-IMDB NaN failsafe
    is load-bearing there, train_searchable/mmimdb.py:110-129). stable=True
    must return the exact finite value instead."""
    torch = pytest.importorskip("torch")
    import sys
    if "/root/reference" not in sys.path:
        sys.path.append("/root/reference")
    from models.auxiliary.aux_models import WeightedCrossEntropyWithLogits

    logits = np.array([[100.0, -100.0, 0.5]], np.float32)
    targets = np.array([[1.0, 0.0, 1.0]], np.float32)
    w = 2.0

    ref_loss = WeightedCrossEntropyWithLogits(w)(
        torch.from_numpy(logits), torch.from_numpy(targets))
    legacy = F.weighted_bce_with_logits(jnp.asarray(logits),
                                        jnp.asarray(targets), w)
    assert bool(torch.isnan(ref_loss)), "oracle changed: expected NaN"
    assert np.isnan(float(legacy)), "legacy form must reproduce the NaN"

    stable = float(F.weighted_bce_with_logits(
        jnp.asarray(logits), jnp.asarray(targets), w, stable=True))
    # exact values: softplus(-100)*2 ~ 7.4e-44 ~ 0; softplus(-100) ~ 0;
    # third element w*softplus(-0.5)
    want = np.mean([0.0, 0.0, w * np.log1p(np.exp(-0.5))])
    assert stable == pytest.approx(want, rel=1e-5)
    assert np.isfinite(stable)


def test_vgg19_trunk_remap_against_torchvision_layout(tmp_path):
    """torchvision vgg19 'features.N.*' keys map onto GP_VGG's 'vgg.N.*'
    slots with matching shapes (conv indices 0,2,5,...,34)."""
    from mfas_tpu.core.module import tree_set, flatten_tree
    from mfas_tpu.models.vgg import remap_torchvision_vgg_keys
    import jax.numpy as jnp

    args = imdb_args()
    net = M.GP_VGG(args)
    tree = net.init(0)
    flat = flatten_tree(tree)

    conv_idx = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34]
    fake_tv = {}
    rs = np.random.RandomState(0)
    for i in conv_idx:
        w = flat[f"vgg.{i}.weight"]
        fake_tv[f"features.{i}.weight"] = rs.randn(*w.shape).astype(np.float32)
        fake_tv[f"features.{i}.bias"] = rs.randn(w.shape[0]).astype(np.float32)
    fake_tv["classifier.0.weight"] = rs.randn(4096, 25088).astype(np.float32)

    remapped = remap_torchvision_vgg_keys(fake_tv)
    assert "classifier.0.weight" not in remapped
    assert len(remapped) == 2 * len(conv_idx)
    for k, v in remapped.items():
        tree = tree_set(tree, k, jnp.asarray(v))
    flat2 = flatten_tree(tree)
    np.testing.assert_array_equal(np.asarray(flat2["vgg.34.weight"]),
                                  fake_tv["features.34.weight"])


def test_mmimdb_engine_trains(tmp_path):
    from mfas_tpu.core.sched import FixedScheduler
    from mfas_tpu.data.mm_imdb import MM_IMDB, MMIMDBLoader, make_synthetic_mmimdb
    from mfas_tpu.engine.mmimdb import MMIMDBEngine

    n = make_synthetic_mmimdb(str(tmp_path), "train", n=16, num_labels=8,
                              feat_dim=300)
    make_synthetic_mmimdb(str(tmp_path), "dev", n=8, num_labels=8, feat_dim=300)
    args = imdb_args(num_outputs=8, channels=8)
    net = M.SimpleVTNet(args, text_first_hidden=16, image_channels=3)
    tree = net.init(0)

    # average_text collapses text to one GloVe vector for the MLP text net
    loaders = {
        "train": MMIMDBLoader(MM_IMDB(str(tmp_path), stage="train",
                                      len_data=16, average_text=True),
                              8, shuffle=True),
        "dev": MMIMDBLoader(MM_IMDB(str(tmp_path), stage="dev", len_data=8,
                                    average_text=True), 8),
    }
    sizes = {"train": 16, "dev": 8}
    eng = MMIMDBEngine(net, pos_weight=2.0)
    f1, best = eng.train_track_f1(tree, None, loaders, sizes,
                                  FixedScheduler(1e-3), num_epochs=2)
    assert 0.0 <= f1 <= 1.0
