"""Resumable long-run training: interrupt after epoch E, resume, and end in
the same state as an uninterrupted run (same schedule, Adam moments,
best-dev tracking); dropout off so the RNG-stream caveat doesn't apply."""

import numpy as np

from mfas_tpu.core import flatten_tree
from mfas_tpu.core.sched import LRCosineAnnealingScheduler
from mfas_tpu.data.loader import ArrayLoader
from mfas_tpu.engine.classifier import ClassifierEngine
from mfas_tpu.fusion import avmnist as fa
from tests.test_avmnist_vertical import make_args, synthetic_avmnist


def _setup():
    args = make_args(drpt=0.0)
    data = synthetic_avmnist(32)
    net = fa.Searchable_Audio_Image_Net(args, np.array([[4, 2, 0]]))
    tree = net.init(0)
    # shuffle off: a resumed run cannot replay the interrupted run's
    # per-epoch shuffle stream; determinism here isolates the state logic
    loaders = {"train": ArrayLoader(data, 8, shuffle=False),
               "dev": ArrayLoader(data, 8)}
    sizes = {k: v.dataset_size for k, v in loaders.items()}
    return net, tree, loaders, sizes


def _sched(sizes):
    return LRCosineAnnealingScheduler(1e-3, 1e-6, 2, 2, sizes["train"] / 8)


def test_interrupted_training_resumes_identically(tmp_path):
    state = str(tmp_path / "train_state.checkpoint")

    # uninterrupted: 4 epochs
    net, tree, loaders, sizes = _setup()
    eng = ClassifierEngine(net, input_keys=("image", "audio"))
    acc_full, best_full = eng.train_track_acc(
        tree, None, loaders, sizes, _sched(sizes), num_epochs=4,
        print_loss=False)

    # interrupted: 2 epochs with state, then resume to 4
    net2, tree2, loaders2, sizes2 = _setup()
    eng2 = ClassifierEngine(net2, input_keys=("image", "audio"))
    eng2.train_track_acc(tree2, None, loaders2, sizes2, _sched(sizes2),
                         num_epochs=2, print_loss=False, state_path=state)

    net3, tree3, loaders3, sizes3 = _setup()
    eng3 = ClassifierEngine(net3, input_keys=("image", "audio"))
    acc_res, best_res = eng3.train_track_acc(
        tree3, None, loaders3, sizes3, _sched(sizes3), num_epochs=4,
        print_loss=False, state_path=state, resume=True)

    assert acc_res == acc_full
    ff, fr = flatten_tree(best_full), flatten_tree(best_res)
    for k in ff:
        np.testing.assert_allclose(np.asarray(fr[k]), np.asarray(ff[k]),
                                   rtol=2e-5, atol=2e-6, err_msg=k)
