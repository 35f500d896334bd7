"""Convergence guarantee: the full training machinery (cosine-restart Adam,
BN, dropout, best-dev tracking) drives a strongly-separable synthetic
AV-MNIST task to high accuracy — beyond the >chance smoke checks."""

import numpy as np
import pytest

from mfas_tpu.core.sched import LRCosineAnnealingScheduler
from mfas_tpu.data.loader import ArrayLoader
from mfas_tpu.engine.classifier import ClassifierEngine
from mfas_tpu.fusion import avmnist as fa
from tests.test_avmnist_vertical import make_args


def separable_avmnist(n=128, seed=0):
    rs = np.random.RandomState(seed)
    label = rs.randint(0, 10, n)
    # strong class signal in both modalities
    image = rs.randn(n, 1, 28, 28).astype(np.float32) * 0.1
    image[np.arange(n), 0, label, :] += 2.0
    audio = rs.randn(n, 1, 112, 112).astype(np.float32) * 0.1
    audio[np.arange(n), 0, :, label * 4] += 2.0
    return {"image": image, "audio": audio, "label": label.astype(np.int32)}


@pytest.mark.slow
def test_training_converges_to_high_accuracy():
    args = make_args(drpt=0.0, channels=8, inner_representation_size=32)
    train = separable_avmnist(128, seed=0)
    dev = separable_avmnist(64, seed=1)

    net = fa.Searchable_Audio_Image_Net(args, np.array([[4, 2, 0]]))
    tree = net.init(0)
    loaders = {"train": ArrayLoader(train, 16, shuffle=True, seed=2),
               "dev": ArrayLoader(dev, 16)}
    sizes = {k: v.dataset_size for k, v in loaders.items()}
    engine = ClassifierEngine(net, input_keys=("image", "audio"))
    sched = LRCosineAnnealingScheduler(3e-3, 1e-6, 10, 2, sizes["train"] / 16)

    acc, best = engine.train_track_acc(tree, None, loaders, sizes, sched,
                                       num_epochs=12, print_loss=False)
    # held-out accuracy on a cleanly separable task
    assert acc > 0.8, acc
