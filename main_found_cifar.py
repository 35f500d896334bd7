#!/usr/bin/env python3
"""Train/test a found CIFAR micro-cell architecture (FixedCell mode:
concat + 1x1 reduce, plane doubling at reductions, optional 0.4-weighted
auxiliary loss — reference cifar_searchable.py:161-285 fixed=True path;
the reference ships no CIFAR entry point, SURVEY.md §1)."""

import argparse
import time

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser(description='Found micro-cell training.')
    parser.add_argument('--checkpointdir', type=str, default='checkpoints/')
    parser.add_argument('--data_dir', type=str, default='data/cifar10/')
    parser.add_argument('--num_outputs', type=int, default=10)
    parser.add_argument('--batchsize', type=int, default=128)
    parser.add_argument('--planes', type=int, default=36)
    parser.add_argument('--net_str', type=int, nargs='+',
                        default=[1, 1, 2, 1, 1, 2, 1, 1])
    parser.add_argument('--img_size', type=int, default=32)
    parser.add_argument('--drop_path', type=float, default=0.1)
    parser.add_argument('--drop_prob', type=float, default=0.2)
    parser.add_argument('--epochs', type=int, default=120)
    parser.add_argument('--eta_max', type=float, default=0.001)
    parser.add_argument('--eta_min', type=float, default=0.000001)
    parser.add_argument('--Ti', type=int, default=5)
    parser.add_argument('--Tm', type=int, default=2)
    parser.add_argument('--use_intermediate', action='store_true', default=False,
                        help='add the 0.4-weighted auxiliary-head loss')
    parser.add_argument('--cutout', action='store_true', default=False)
    parser.add_argument('--use_dataparallel', action='store_true', default=False)
    parser.add_argument('--no-verbose', dest='verbose', action='store_false',
                        default=True)
    parser.add_argument('--conf', type=str,
                        default='0,1,-2,-1;2,3,-2,0',
                        help="rows 'op1,op2,conn1,conn2' separated by ';'")
    parser.add_argument('--save_checkpoint', action='store_true', default=False)
    from mfas_tpu.parallel.mesh import add_dist_args
    add_dist_args(parser)
    return parser.parse_args()


def main():
    from mfas_tpu.runtime.compile_cache import \
        enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    print("Training found CIFAR micro-cell network")
    args = parse_args()
    # multi-host init must precede the first jax device query (no-op
    # without the --dist_* flags)
    from mfas_tpu.parallel.mesh import initialize_from_args
    initialize_from_args(args)
    print("The configuration of this run is:")
    print(args)

    import jax
    from mfas_tpu.core.sched import LRCosineAnnealingScheduler
    from mfas_tpu.data.cifar import CifarLoader, load_cifar10_arrays
    from mfas_tpu.engine.cifar import CifarEngine
    from mfas_tpu.fusion.cifar import Searchable_MicroCNN
    from mfas_tpu.parallel.mesh import data_mesh_from_args
    from mfas_tpu.runtime import checkpoint as ckpt

    mesh = data_mesh_from_args(args)

    configuration = np.asarray(
        [[int(v) for v in row.split(',')] for row in args.conf.split(';')])
    model = Searchable_MicroCNN(args, configuration, fixed=True)
    tree = model.init(0)

    train_arrays = load_cifar10_arrays(args.data_dir, train=True)
    test_arrays = load_cifar10_arrays(args.data_dir, train=False)
    n = train_arrays["image"].shape[0]
    split = 45000 if n >= 50000 else n - max(1, n // 10)
    loaders = {
        "train": CifarLoader(train_arrays, args.batchsize, train=True,
                             indices=np.arange(0, split),
                             use_cutout=args.cutout),
        "dev": CifarLoader(train_arrays, args.batchsize,
                           indices=np.arange(split, min(n, 50000))),
        "test": CifarLoader(test_arrays, args.batchsize),
    }
    sizes = {k: v.dataset_size for k, v in loaders.items()}

    engine = CifarEngine(model, use_intermediate=args.use_intermediate,
                         mesh=mesh)
    sched = LRCosineAnnealingScheduler(args.eta_max, args.eta_min, args.Ti,
                                       args.Tm, sizes["train"] / args.batchsize)
    start = time.time()
    best_acc, tree = engine.train_track_acc(
        tree, None, {k: loaders[k] for k in ("train", "dev")}, sizes, sched,
        num_epochs=args.epochs, print_loss=args.verbose)
    test_acc = engine.test_track_acc(tree, loaders["test"], sizes["test"])
    elapsed = time.time() - start
    print('Training in {:.0f}m {:.0f}s'.format(elapsed // 60, elapsed % 60))
    print('Model Acc: {}'.format(test_acc))

    from mfas_tpu.parallel import mesh as pm
    if args.save_checkpoint and pm.is_primary_process():
        import os
        filename = os.path.join(args.checkpointdir,
                                f"cifar_micro_{test_acc:.4f}.checkpoint")
        ckpt.save(ckpt.state_dict_from_tree(tree), filename)
        print('Saved ' + filename)


if __name__ == "__main__":
    # benign-noise fd-2 filter for interactive runs (one shared policy —
    # proof of benignity in mfas_tpu/runtime/logfilter.py)
    from mfas_tpu.runtime.logfilter import run_filtered
    run_filtered(main)
