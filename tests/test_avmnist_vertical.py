"""End-to-end slice: AV-MNIST searchable fusion net on synthetic data
(SURVEY.md §4.6 / §7.2 step 2)."""

import types

import numpy as np
import pytest

import jax.numpy as jnp

from mfas_tpu.core import Ctx, flatten_tree
from mfas_tpu.core.sched import LRCosineAnnealingScheduler
from mfas_tpu.data.loader import ArrayLoader
from mfas_tpu.engine.classifier import ClassifierEngine
from mfas_tpu.fusion import avmnist as fa


def make_args(**kw):
    d = dict(channels=8, num_outputs=10, inner_representation_size=16,
             drpt=0.5, multitask=False, alphas=False, batchnorm=False,
             eta_max=1e-3, eta_min=1e-6, Ti=1, Tm=2, batchsize=8, epochs=1,
             verbose=False, weightsharing=False, use_dataparallel=False)
    d.update(kw)
    return types.SimpleNamespace(**d)


def synthetic_avmnist(n=64, seed=0):
    rs = np.random.RandomState(seed)
    label = rs.randint(0, 10, size=n)
    # images/audio carry a label-dependent mean so the task is learnable
    image = rs.randn(n, 1, 28, 28).astype(np.float32) + label[:, None, None, None] * 0.3
    audio = rs.randn(n, 1, 112, 112).astype(np.float32) * 0.1
    return {"image": image, "audio": audio, "label": label.astype(np.int32)}


def test_searchable_net_shapes_and_state_dict_keys():
    args = make_args()
    conf = np.array([[4, 2, 0], [0, 1, 1]])
    net = fa.Searchable_Audio_Image_Net(args, conf)
    tree = net.init(0)
    flat = flatten_tree(tree)

    # fusion head keys follow the torch layout
    assert "fusion_layers.0.0.weight" in flat
    assert "fusion_layers.1.0.weight" in flat
    assert "central_classifier.weight" in flat
    assert "alphas.0.alpha_x" in flat
    # tap-size contract (avmnist_searchable.py:291-297):
    # row0 in = 16ch + 4ch; row1 in = ch + 2ch + hidden
    assert flat["fusion_layers.0.0.weight"].shape == (16, 16 * 8 + 4 * 8)
    assert flat["fusion_layers.1.0.weight"].shape == (16, 8 + 2 * 8 + 16)

    batch = synthetic_avmnist(4)
    out = net(tree, Ctx(), (jnp.asarray(batch["image"]), jnp.asarray(batch["audio"])))
    assert out.shape == (4, 10)

    # multitask returns three heads
    args2 = make_args(multitask=True)
    net2 = fa.Searchable_Audio_Image_Net(args2, conf)
    out2 = net2(net2.init(0), Ctx(), (jnp.asarray(batch["image"]), jnp.asarray(batch["audio"])))
    assert len(out2) == 3 and out2[1].shape == (4, 10)


def test_possible_layer_configurations_count():
    confs = fa.get_possible_layer_configurations(0)
    assert len(confs) == 30  # 5*3*2
    assert confs[0] == [0, 0, 0] and confs[-1] == [4, 2, 1]


def test_avmnist_end_to_end_training_improves():
    # dropout off so the memorization signal is clean; BN running stats need
    # a few epochs of momentum-0.1 updates before eval-mode acc moves
    args = make_args(drpt=0.0)
    data = synthetic_avmnist(64)
    conf = np.array([[4, 2, 0]])
    net = fa.Searchable_Audio_Image_Net(args, conf)
    tree = net.init(0)

    loaders = {
        "train": ArrayLoader(data, batch_size=8, shuffle=True, seed=1),
        "dev": ArrayLoader(data, batch_size=8),
    }
    sizes = {k: v.dataset_size for k, v in loaders.items()}
    engine = ClassifierEngine(net, multitask=False,
                              input_keys=("image", "audio"))
    sched = LRCosineAnnealingScheduler(1e-2, 1e-6, 8, 2, sizes["train"] / 8)
    # train everything (tiny net): dev acc on the memorized set should beat chance
    acc, best_tree = engine.train_track_acc(
        tree, None, loaders, sizes, sched, num_epochs=8, print_loss=False)
    assert acc > 0.2  # chance is 0.1

    # the best-dev snapshot re-evaluated on the SAME loader in eval mode
    # must reproduce the best dev accuracy exactly (deterministic eval)
    test_acc = engine.test_track_acc(best_tree, loaders["dev"], sizes["dev"])
    assert test_acc == pytest.approx(acc, abs=1e-6)


def test_frozen_backbone_central_only_training():
    args = make_args()
    data = synthetic_avmnist(32)
    conf = np.array([[4, 2, 0]])
    net = fa.Searchable_Audio_Image_Net(args, conf)
    tree = net.init(0)
    before = flatten_tree(tree)

    loaders = {"train": ArrayLoader(data, batch_size=8, shuffle=True),
               "dev": ArrayLoader(data, batch_size=8)}
    sizes = {k: v.dataset_size for k, v in loaders.items()}
    engine = ClassifierEngine(net, input_keys=("image", "audio"))
    sched = LRCosineAnnealingScheduler(1e-3, 1e-6, 1, 2, sizes["train"] / 8)
    _, best = engine.train_track_acc(tree, net.central_params(), loaders,
                                     sizes, sched, num_epochs=1, print_loss=False)
    after = flatten_tree(best)
    # backbone conv weights untouched; fusion weights moved
    np.testing.assert_array_equal(np.asarray(before["rgbnet.conv1.weight"]),
                                  np.asarray(after["rgbnet.conv1.weight"]))
    assert not np.array_equal(np.asarray(before["fusion_layers.0.0.weight"]),
                              np.asarray(after["fusion_layers.0.0.weight"]))
    # backbone batchnorm running stats DO update in train mode (torch parity)
    assert not np.array_equal(np.asarray(before["rgbnet.bn1.running_mean"]),
                              np.asarray(after["rgbnet.bn1.running_mean"]))
