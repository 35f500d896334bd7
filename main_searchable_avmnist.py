#!/usr/bin/env python3
"""MFAS search on AV-MNIST. The reference ships the AVMNISTSearcher
(models/searchable.py:184-224) and its candidate machinery but no entry
point (SURVEY.md §1); this CLI supplies it, modeled on main_searchable_ntu
with the avmnist-specific flags its code consumes (args.channels,
args.audio_cp, args.randsearch — avmnist_searchable.py:46, searchable.py:216).
"""

import argparse
import time


def parse_args():
    parser = argparse.ArgumentParser(description='Modality optimization.')
    parser.add_argument('--checkpointdir', type=str, help='output base dir',
                        default='checkpoints/')
    parser.add_argument('--datadir', type=str, help='data directory',
                        default='data/avmnist/')
    parser.add_argument('--audio_cp', type=str,
                        help='Audio net checkpoint (in checkpointdir)', default='')
    parser.add_argument('--rgb_cp', type=str,
                        help='Image net checkpoint (in checkpointdir)', default='')
    parser.add_argument('--num_outputs', type=int, help='output dimension',
                        default=10)
    parser.add_argument('--channels', type=int,
                        help='LeNet base channel width', default=32)
    parser.add_argument('--batchsize', type=int, help='batch size', default=128)
    parser.add_argument('--inner_representation_size', type=int,
                        help='output size of mixing linear layers', default=16)
    parser.add_argument('--epochs', type=int, help='training epochs', default=3)
    parser.add_argument('--lr_surrogate', type=float, default=0.001)
    parser.add_argument('--epochs_surrogate', type=int, default=50)
    parser.add_argument('--eta_max', type=float, help='eta max', default=0.001)
    parser.add_argument('--eta_min', type=float, help='eta min', default=0.000001)
    parser.add_argument('--Ti', type=int, help='epochs Ti', default=1)
    parser.add_argument('--Tm', type=int, help='epochs multiplier Tm', default=2)
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
    parser.add_argument('--population_weightsharing', action='store_true',
                        default=False,
                        help='approximate weight sharing inside the fast '
                             'population trainer')
    parser.add_argument('--cache_features', action='store_true', default=False,
                        help='HBM-resident train-feature bank: extract '
                             'frozen-backbone features once (eval mode) and '
                             'gather shuffled batches from the bank every '
                             'epoch/population')
    parser.add_argument('--bf16_features', action='store_true', default=False,
                        help='bfloat16 frozen-backbone features during search '
                             '(the default whenever --cache_features is on; '
                             'this flag forces bf16 even without the bank)')
    parser.add_argument('--f32_features', action='store_true', default=False,
                        help='force float32 frozen-backbone features, '
                             'overriding the bf16-under---cache_features '
                             'default (ranking agreement bf16 vs f32 is '
                             'measured in tests/test_feature_bank.py and '
                             'docs/PARITY.md)')
    parser.add_argument('--shard_feature_bank', action='store_true',
                        default=False,
                        help='with --cache_features on a data-axis mesh: '
                             'shard the bank rows over the data axis '
                             '(1/N per-chip HBM; batch-sized collective '
                             'per gather) instead of replicating it')
    parser.add_argument('--int8_feature_bank', action='store_true',
                        default=False,
                        help='with --cache_features: store the bank '
                             'symmetric-int8 with per-row f32 scales — 2x '
                             'the per-chip bank capacity of the bf16 '
                             'default (4x vs --f32_features) and 2x less '
                             'gather/ICI traffic than bf16 (4x vs '
                             '--f32_features); dequant fuses into the '
                             'epoch program (measured ranking agreement: '
                             'tests/test_feature_bank.py)')
    parser.add_argument('--bank_batch', type=int, default=None,
                        help='target sample count for the eval-mode '
                             'feature-extraction passes (feature bank '
                             'build + dev features): consecutive loader '
                             'batches are concatenated up to this size '
                             'before the backbone forward (larger eval '
                             'batches are faster on the MXU; features '
                             'are identical). Try 32 on one v5e chip')
    parser.add_argument('--no_fused_epochs', action='store_true',
                        default=False,
                        help='debug escape hatch: with --cache_features, run '
                             'the per-batch dispatch loop instead of the '
                             'fused one-program-per-epoch lax.scan')
    parser.add_argument('--alphas', action='store_true', default=False)
    parser.add_argument('--batchnorm', action='store_true', default=False)
    parser.add_argument('--multitask', action='store_true', default=False)
    parser.add_argument('--randsearch', action='store_true', default=False,
                        help='uniform random search baseline instead of EPNAS')
    parser.add_argument("--drpt", action="store", default=0.5, dest="drpt",
                        type=float)
    # additive flags
    parser.add_argument('--seed', type=int, default=None)
    parser.add_argument('--sequential_candidates', action='store_true',
                        default=False)
    parser.add_argument('--random_backbones', action='store_true', default=False)
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
    from mfas_tpu.search.searchers import AVMNISTSearcher

    from mfas_tpu.parallel.mesh import require_shared_seed
    require_shared_seed(args)
    if args.seed is not None:
        np.random.seed(args.seed)
        import random
        random.seed(args.seed)  # randsearch depth draws (stdlib)

    mesh = data_mesh_from_args(args)
    searcher = AVMNISTSearcher(args, mesh=mesh, jsonl_log=args.jsonl_log or None)

    print("MFAS for AV-MNIST Started!!!!")
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
