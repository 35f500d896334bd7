"""ClassifierEngine under a data mesh: batch-sharded training on the
virtual 8-device mesh matches single-device results (the DataParallel
replacement, SURVEY §2.2/§5.8)."""

import numpy as np
import pytest

import jax

from mfas_tpu.core import flatten_tree
from mfas_tpu.core.sched import FixedScheduler
from mfas_tpu.data.loader import ArrayLoader
from mfas_tpu.engine.classifier import ClassifierEngine
from mfas_tpu.fusion import avmnist as fa
from mfas_tpu.parallel.mesh import make_mesh
from tests.test_avmnist_vertical import make_args, synthetic_avmnist


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_data_parallel_training_matches_single_device():
    args = make_args(drpt=0.0)
    data = synthetic_avmnist(32)
    conf = np.array([[4, 2, 0]])

    def run(mesh):
        net = fa.Searchable_Audio_Image_Net(args, conf)
        tree = net.init(0)
        loaders = {"train": ArrayLoader(data, 8, shuffle=False),
                   "dev": ArrayLoader(data, 8)}
        sizes = {k: v.dataset_size for k, v in loaders.items()}
        eng = ClassifierEngine(net, input_keys=("image", "audio"), mesh=mesh)
        acc, best = eng.train_track_acc(tree, None, loaders, sizes,
                                        FixedScheduler(1e-3), num_epochs=2,
                                        print_loss=False)
        return acc, flatten_tree(best)

    acc1, tree1 = run(None)
    acc8, tree8 = run(make_mesh(8))

    # note: BatchNorm under GSPMD computes GLOBAL batch stats, identical to
    # the single-device program — results must match to numerics
    assert acc8 == acc1
    # cross-shard reduction order perturbs low-order bits over many steps
    for k in tree1:
        np.testing.assert_allclose(np.asarray(tree8[k]), np.asarray(tree1[k]),
                                   rtol=2e-2, atol=5e-4, err_msg=k)
