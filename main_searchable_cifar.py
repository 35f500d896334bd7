#!/usr/bin/env python3
"""EPNAS micro-cell search on CIFAR-10. The reference ships CifarSearcher
(models/searchable.py:270-317) and the cell machinery but no entry point
(SURVEY.md §1); this CLI supplies it with the flags the reference code
consumes (args.data_dir, args.planes, args.net_str, args.drop_path,
args.drop_prob, args.img_size — cifar_searchable.py:161-217)."""

import argparse
import time


def parse_args():
    parser = argparse.ArgumentParser(description='Micro-cell search.')
    parser.add_argument('--checkpointdir', type=str, default='checkpoints/')
    parser.add_argument('--data_dir', type=str, default='data/cifar10/')
    parser.add_argument('--num_outputs', type=int, default=10)
    parser.add_argument('--batchsize', type=int, default=128)
    parser.add_argument('--planes', type=int, default=36,
                        help='channels per cell op')
    parser.add_argument('--net_str', type=int, nargs='+',
                        default=[1, 1, 2, 1, 1, 2, 1, 1],
                        help='cell stack; 2 marks a reduction point')
    parser.add_argument('--img_size', type=int, default=32)
    parser.add_argument('--drop_path', type=float, default=0.1)
    parser.add_argument('--drop_prob', type=float, default=0.2)
    parser.add_argument('--epochs', type=int, default=3)
    parser.add_argument('--lr_surrogate', type=float, default=0.001)
    parser.add_argument('--epochs_surrogate', type=int, default=50)
    parser.add_argument('--eta_max', type=float, default=0.001)
    parser.add_argument('--eta_min', type=float, default=0.000001)
    parser.add_argument('--Ti', type=int, default=1)
    parser.add_argument('--Tm', type=int, default=2)
    parser.add_argument('--use_dataparallel', action='store_true', default=False)
    parser.add_argument('--num_workers', '--j', type=int, default=16)
    parser.add_argument('--max_fusions', type=int, dest="max_progression_levels",
                        default=4)
    parser.add_argument('--search_iterations', type=int, default=3)
    parser.add_argument('--num_samples', type=int, default=15)
    parser.add_argument('--initial_temperature', type=float, default=10.0)
    parser.add_argument('--final_temperature', type=float, default=0.2)
    parser.add_argument('--temperature_decay', type=float, default=4.0)
    parser.add_argument('--no-verbose', dest='verbose', action='store_false',
                        default=True)
    parser.add_argument('--weightsharing', action='store_true', default=False)
    parser.add_argument('--seed', type=int, default=None)
    parser.add_argument('--search_state', type=str, default='')
    parser.add_argument('--resume_search', action='store_true', default=False)
    parser.add_argument('--jsonl_log', type=str, default='')
    from mfas_tpu.parallel.mesh import add_dist_args
    add_dist_args(parser)
    return parser.parse_args()


def main():
    from mfas_tpu.runtime.compile_cache import \
        enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    args = parse_args()
    # multi-host init must precede the first jax device query (no-op
    # without the --dist_* flags)
    from mfas_tpu.parallel.mesh import initialize_from_args
    initialize_from_args(args)

    import numpy as np
    import jax
    from mfas_tpu.parallel.mesh import data_mesh_from_args
    from mfas_tpu.search.searchers import CifarSearcher

    from mfas_tpu.parallel.mesh import require_shared_seed
    require_shared_seed(args)
    if args.seed is not None:
        np.random.seed(args.seed)
        import random
        random.seed(args.seed)  # randsearch depth draws (stdlib)

    mesh = data_mesh_from_args(args)
    searcher = CifarSearcher(args, mesh=mesh, jsonl_log=args.jsonl_log or None)

    print("EPNAS for CIFAR-10 Started!!!!")
    start_time = time.time()
    surrogate_data = searcher.search()
    elapsed = time.time() - start_time
    print('Search complete in {:.0f}m {:.0f}s'.format(elapsed // 60, elapsed % 60))

    # tiny smoke runs can finish with <5 unique confs in the store
    k_best, k_accs, idx = surrogate_data.get_k_best(
        min(5, len(surrogate_data)))
    print('Now listing best architectures')
    for conf, acc in zip(k_best, k_accs):
        print(conf.tolist(), acc)


if __name__ == "__main__":
    # benign-noise fd-2 filter for interactive runs (one shared policy —
    # proof of benignity in mfas_tpu/runtime/logfilter.py)
    from mfas_tpu.runtime.logfilter import run_filtered
    run_filtered(main)
