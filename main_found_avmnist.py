#!/usr/bin/env python3
"""Train/test a found AV-MNIST fusion architecture (BASELINE.json config #1).
The reference has no AV-MNIST entry point (SURVEY.md §1); this mirrors
main_found_ntu's two-phase recipe on the AV-MNIST vertical."""

import argparse
import os
import re
import time

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser(description='Modality optimization.')
    parser.add_argument('--checkpointdir', type=str, default='checkpoints/')
    parser.add_argument('--datadir', type=str, default='data/avmnist/')
    parser.add_argument('--audio_cp', type=str, default='')
    parser.add_argument('--rgb_cp', type=str, default='')
    parser.add_argument('--test_cp', type=str, default='')
    parser.add_argument('--num_outputs', type=int, default=10)
    parser.add_argument('--channels', type=int, default=32)
    parser.add_argument('--batchsize', type=int, default=128)
    parser.add_argument('--inner_representation_size', type=int, default=256)
    parser.add_argument('--epochs', type=int, default=70)
    parser.add_argument('--eta_max', type=float, default=0.001)
    parser.add_argument('--eta_min', type=float, default=0.000001)
    parser.add_argument('--Ti', type=int, default=5)
    parser.add_argument('--Tm', type=int, default=2)
    parser.add_argument('--use_dataparallel', action='store_true', default=False)
    parser.add_argument('--j', dest='num_workers', type=int, default=16)
    parser.add_argument('--no-verbose', dest='verbose', action='store_false',
                        default=True)
    parser.add_argument('--no-multitask', dest='multitask',
                        action='store_false', default=True)
    parser.add_argument('--alphas', action='store_true', default=False)
    parser.add_argument('--batchnorm', action='store_true', default=False)
    parser.add_argument("--drpt", action="store", default=0.4, dest="drpt",
                        type=float)
    parser.add_argument('--conf', type=int, help='conf to train', default=0)
    # additive flags
    parser.add_argument('--random_backbones', action='store_true', default=False)
    parser.add_argument('--save_checkpoint', action='store_true', default=False)
    parser.add_argument('--profile_dir', type=str, default='')
    from mfas_tpu.parallel.mesh import add_dist_args
    add_dist_args(parser)
    return parser.parse_args()


# found architectures from the MFAS paper's AV-MNIST experiments (taps are
# [audio_idx, image_idx, activation]); conf 0 is the common strong choice
# (deepest taps, sigmoid)
FOUND_CONFS = {
    0: np.array([[4, 2, 1], [4, 2, 0]]),
    1: np.array([[0, 0, 1], [4, 2, 0], [4, 2, 1]]),
    2: np.array([[4, 2, 1]]),
}


def main():
    from mfas_tpu.runtime.compile_cache import \
        enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    print("Training found AV-MNIST network")
    args = parse_args()
    # multi-host init must precede the first jax device query (no-op
    # without the --dist_* flags)
    from mfas_tpu.parallel.mesh import initialize_from_args
    initialize_from_args(args)
    print("The configuration of this run is:")
    print(args)

    import jax
    from mfas_tpu.core.module import tree_set
    from mfas_tpu.core.sched import LRCosineAnnealingScheduler
    from mfas_tpu.data.avmnist import load_avmnist_arrays
    from mfas_tpu.data.loader import ArrayLoader
    from mfas_tpu.engine.classifier import ClassifierEngine
    from mfas_tpu.fusion.avmnist import Searchable_Audio_Image_Net
    from mfas_tpu.parallel.mesh import data_mesh_from_args
    from mfas_tpu.runtime import checkpoint as ckpt
    from mfas_tpu.runtime.profiler import maybe_profile
    from mfas_tpu.search.searchers import _load_backbone_tree

    mesh = data_mesh_from_args(args)

    if args.conf not in FOUND_CONFS:
        raise SystemExit(
            f"--conf must be one of {sorted(FOUND_CONFS)} (got {args.conf})")
    configuration = FOUND_CONFS[args.conf]
    model = Searchable_Audio_Image_Net(args, configuration)
    tree = model.init(0)

    train_arrays = load_avmnist_arrays(args.datadir, "train")
    test_arrays = load_avmnist_arrays(args.datadir, "test")
    n = train_arrays["image"].shape[0]
    # reference split: train[0:50000] / dev[50000:55000]
    # (models/searchable.py:199-203); scaled down for smaller datasets
    if n >= 55000:
        dev_lo, dev_hi = 50000, 55000
    else:
        dev_lo, dev_hi = n - max(1, n // 8), n
    loaders = {
        "train": ArrayLoader(train_arrays, args.batchsize, shuffle=True,
                             indices=np.arange(0, dev_lo)),
        "dev": ArrayLoader(train_arrays, args.batchsize,
                           indices=np.arange(dev_lo, dev_hi)),
        "test": ArrayLoader(test_arrays, args.batchsize),
    }
    sizes = {k: v.dataset_size for k, v in loaders.items()}

    if args.test_cp:
        tree = ckpt.tree_from_state_dict(
            ckpt.load_state_dict(os.path.join(args.checkpointdir, args.test_cp)),
            tree)
    else:
        if args.rgb_cp:
            tree = tree_set(tree, "rgbnet", _load_backbone_tree(
                os.path.join(args.checkpointdir, args.rgb_cp), tree["rgbnet"],
                random_ok=args.random_backbones))
        if args.audio_cp:
            tree = tree_set(tree, "audnet", _load_backbone_tree(
                os.path.join(args.checkpointdir, args.audio_cp), tree["audnet"],
                random_ok=args.random_backbones))

    engine = ClassifierEngine(model, multitask=args.multitask,
                              input_keys=("image", "audio"), mesh=mesh)
    start_time = time.time()
    with maybe_profile(args.profile_dir):
        if not args.test_cp:
            nbpe = sizes["train"] / args.batchsize
            if args.verbose:
                print('Pretraining central weights: ')
                print(configuration)
            sched = LRCosineAnnealingScheduler(args.eta_max, args.eta_min,
                                               args.Ti, args.Tm, nbpe)
            _, tree = engine.train_track_acc(
                tree, model.central_params(),
                {k: loaders[k] for k in ("train", "dev")}, sizes, sched,
                num_epochs=1, print_loss=args.verbose)
            sched = LRCosineAnnealingScheduler(args.eta_max, args.eta_min,
                                               args.Ti, args.Tm, nbpe)
            best_acc, tree = engine.train_track_acc(
                tree, None, {k: loaders[k] for k in ("train", "dev")}, sizes,
                sched, num_epochs=args.epochs, print_loss=args.verbose)
            if args.verbose:
                print('Final val accuracy: ' + str(best_acc))
        test_acc = engine.test_track_acc(tree, loaders["test"], sizes["test"])

    elapsed = time.time() - start_time
    print('Training in {:.0f}m {:.0f}s'.format(elapsed // 60, elapsed % 60))
    print('Model Acc: {}'.format(test_acc))

    from mfas_tpu.parallel import mesh as pm
    if args.save_checkpoint and pm.is_primary_process():
        confstr = re.sub(r"_\n ", "_",
                         np.array2string(configuration, separator='_'))
        filename = os.path.join(
            args.checkpointdir,
            "final_avmnist_conf_" + confstr + "_" + str(test_acc) + ".checkpoint")
        ckpt.save(ckpt.state_dict_from_tree(tree), filename)
        print('Saved ' + filename)


if __name__ == "__main__":
    # benign-noise fd-2 filter for interactive runs (one shared policy —
    # proof of benignity in mfas_tpu/runtime/logfilter.py)
    from mfas_tpu.runtime.logfilter import run_filtered
    run_filtered(main)
