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


def test_resume_under_mesh_matches_unmeshed(tmp_path):
    """Resume with --use_dataparallel: the loaded params/opt/best trees
    must be re-placed on the mesh (the fresh-start path replicates; a
    resumed run used to leave them as single-device arrays)."""
    from mfas_tpu.parallel.mesh import make_mesh

    state = str(tmp_path / "train_state.checkpoint")
    mesh = make_mesh(8)

    net, tree, loaders, sizes = _setup()
    eng = ClassifierEngine(net, input_keys=("image", "audio"))
    acc_full, best_full = eng.train_track_acc(
        tree, None, loaders, sizes, _sched(sizes), num_epochs=3,
        print_loss=False)

    net2, tree2, loaders2, sizes2 = _setup()
    eng2 = ClassifierEngine(net2, input_keys=("image", "audio"), mesh=mesh)
    eng2.train_track_acc(tree2, None, loaders2, sizes2, _sched(sizes2),
                         num_epochs=1, print_loss=False, state_path=state)

    net3, tree3, loaders3, sizes3 = _setup()
    eng3 = ClassifierEngine(net3, input_keys=("image", "audio"), mesh=mesh)
    acc_res, best_res = eng3.train_track_acc(
        tree3, None, loaders3, sizes3, _sched(sizes3), num_epochs=3,
        print_loss=False, state_path=state, resume=True)
    # loaded-and-replicated leaves must actually live on the mesh
    leaf = next(iter(flatten_tree(best_res).values()))
    assert len(getattr(leaf, "devices", lambda: [None])()) == 8

    assert acc_res == acc_full
    # meshed vs unmeshed reduction orders drift across epochs of Adam —
    # same tolerance as test_engine_mesh.py's meshed==single comparison
    ff, fr = flatten_tree(best_full), flatten_tree(best_res)
    for k in ff:
        np.testing.assert_allclose(np.asarray(fr[k]), np.asarray(ff[k]),
                                   rtol=2e-2, atol=5e-4, err_msg=k)


def test_per_leaf_adam_step_state_roundtrips(tmp_path):
    """adam_init(per_leaf_step=True) (CifarEngine / skip_disconnected
    engines) keeps one step count per leaf; save/load must preserve that
    TREE — flattening it to a scalar would silently demote torch's
    per-param bias corrections on resume (and the old writer crashed on
    the object-dtype array outright)."""
    import jax.numpy as jnp

    from mfas_tpu.core.optim import adam_init
    from mfas_tpu.runtime.train_state import (load_train_state,
                                              save_train_state)

    net, tree, loaders, sizes = _setup()
    trainable = {k: v for k, v in tree.items()}
    opt = adam_init(trainable, per_leaf_step=True)
    # advance two leaves' steps unevenly, like transient disconnection
    flat_steps = flatten_tree(opt["step"])
    keys = [k for k, v in flat_steps.items() if v is not None]
    from mfas_tpu.core.module import tree_set
    opt["step"] = tree_set(opt["step"], keys[0], jnp.asarray(3, jnp.int32))
    opt["step"] = tree_set(opt["step"], keys[1], jnp.asarray(7, jnp.int32))

    path = str(tmp_path / "ts.checkpoint")
    save_train_state(path, tree=tree, best_tree=tree, opt_state=opt,
                     scheduler=_sched(sizes), epoch=1, best_acc=0.5)
    st = load_train_state(path, tree_template=tree,
                          trainable_template=trainable,
                          scheduler=_sched(sizes))
    back = st["opt_state"]["step"]
    assert isinstance(back, dict), type(back)   # per-leaf tree preserved
    back_flat = flatten_tree(back)
    assert int(back_flat[keys[0]]) == 3
    assert int(back_flat[keys[1]]) == 7
    assert all(int(v) == 0 for k, v in back_flat.items()
               if v is not None and k not in (keys[0], keys[1]))


def test_donate_keeps_best_snapshot_alive():
    """donate=True invalidates the previous step's trainable buffers; the
    best-dev snapshot must own copies (ClassifierEngine._snapshot)."""
    net, tree, loaders, sizes = _setup()
    eng = ClassifierEngine(net, input_keys=("image", "audio"), donate=True)
    acc, best = eng.train_track_acc(tree, None, loaders, sizes,
                                    _sched(sizes), num_epochs=2,
                                    print_loss=False)
    # every leaf readable (a deleted donated buffer would raise here)
    for k, v in flatten_tree(best).items():
        np.asarray(v)

    net2, tree2, loaders2, sizes2 = _setup()
    eng2 = ClassifierEngine(net2, input_keys=("image", "audio"))
    acc2, best2 = eng2.train_track_acc(tree2, None, loaders2, sizes2,
                                       _sched(sizes2), num_epochs=2,
                                       print_loss=False)
    assert acc == acc2
    f1, f2 = flatten_tree(best), flatten_tree(best2)
    for k in f1:
        np.testing.assert_allclose(np.asarray(f1[k]), np.asarray(f2[k]),
                                   rtol=2e-5, atol=2e-6, err_msg=k)
