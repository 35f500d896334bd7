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


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mmimdb_engine_mesh_matches_single_device(tmp_path):
    """MMIMDBEngine under the data mesh (main_found_mmimdb
    --use_dataparallel): best-dev F1, test F1, and final params match the
    single-device run."""
    from mfas_tpu.core.sched import LRCosineAnnealingScheduler
    from mfas_tpu.data.mm_imdb import MM_IMDB, MMIMDBLoader, \
        make_synthetic_mmimdb
    from mfas_tpu.engine.mmimdb import MMIMDBEngine
    from mfas_tpu.models import mm_imdb as M
    import types

    tmp = str(tmp_path)
    for stage, n in (("train", 16), ("dev", 8), ("test", 8)):
        make_synthetic_mmimdb(tmp, stage, n=n, feat_dim=300, num_labels=5)
    args = types.SimpleNamespace(num_outputs=5, channels=4)

    def run(mesh):
        model = M.SimpleVTNet(args, 8, 3)
        tree = model.init(0)
        loaders, sizes = {}, {}
        for stage, n in (("train", 16), ("dev", 8), ("test", 8)):
            ds = MM_IMDB(tmp, stage=stage, feat_dim=300, average_text=True,
                         len_data=n)
            loaders[stage] = MMIMDBLoader(ds, 8, shuffle=(stage == "train"),
                                          seed=0)
            sizes[stage] = len(ds)
        eng = MMIMDBEngine(model, mesh=mesh)
        sched = LRCosineAnnealingScheduler(1e-3, 1e-6, 1, 2,
                                           sizes["train"] / 8)
        f1, best = eng.train_track_f1(
            tree, None, {k: loaders[k] for k in ("train", "dev")}, sizes,
            sched, num_epochs=2, seed=0)
        test_f1 = eng.test_track_f1(best, loaders["test"])
        from mfas_tpu.core import flatten_tree
        return f1, test_f1, flatten_tree(best)

    f1_1, t1, tree1 = run(None)
    f1_8, t8, tree8 = run(make_mesh(8))
    assert f1_8 == pytest.approx(f1_1, abs=1e-9)
    assert t8 == pytest.approx(t1, abs=1e-9)
    for k in tree1:
        np.testing.assert_allclose(np.asarray(tree8[k]), np.asarray(tree1[k]),
                                   rtol=2e-2, atol=5e-4, err_msg=k)
