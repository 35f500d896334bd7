#!/usr/bin/env python3
"""MM-IMDB image+text fusion classification (BASELINE.json config #2).
The reference ships the MM-IMDB model zoo and F1 trainer but no entry point
(SURVEY.md §1); this CLI supplies it with the flags the reference models
consume (args.channels, args.fusingmix, args.fusetype —
models/central/mm_imdb.py)."""

import argparse
import os
import time

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser(description='MM-IMDB fusion.')
    parser.add_argument('--checkpointdir', type=str, default='checkpoints/')
    parser.add_argument('--datadir', type=str, default='data/mmimdb_np/')
    parser.add_argument('--test_cp', type=str, default='')
    parser.add_argument('--vgg_cp', type=str, default='',
                        help='torchvision vgg19 checkpoint for the GP_VGG trunk')
    parser.add_argument('--model', type=str, default='vggt_centralnet_v2',
                        choices=['simplevt', 'vggvt', 'simplevt_centralnet',
                                 'vggt_centralnet', 'vggt_centralnet_v2'])
    parser.add_argument('--num_outputs', type=int, default=23)
    parser.add_argument('--channels', type=int, default=512)
    parser.add_argument('--text_first_hidden', type=int, default=512)
    parser.add_argument('--fusingmix', type=str, default='13,24')
    parser.add_argument('--fusetype', type=str, default='cat')
    parser.add_argument('--pos_weight', type=float, default=2.0)
    parser.add_argument('--th_fscore', type=float, default=0.3)
    parser.add_argument('--stable_bce', action='store_true', default=False,
                        help='exact logsumexp BCE instead of the reference '
                             'formula (which overflow-NaNs at |logit|~90)')
    parser.add_argument('--batchsize', type=int, default=64)
    parser.add_argument('--epochs', type=int, default=50)
    parser.add_argument('--eta_max', type=float, default=0.001)
    parser.add_argument('--eta_min', type=float, default=0.000001)
    parser.add_argument('--Ti', type=int, default=5)
    parser.add_argument('--Tm', type=int, default=2)
    parser.add_argument('--feat_dim', type=int, default=300,
                        help='GloVe feature dimension of the text npy files')
    parser.add_argument('--average_text',
                        action=argparse.BooleanOptionalAction,
                        default=True,
                        help='mean-pool the GloVe sequence to one 300-d vector; --no-average_text feeds the padded (T, 300) sequence path')
    parser.add_argument('--train_size', type=int, default=None)
    parser.add_argument('--dev_size', type=int, default=None)
    parser.add_argument('--test_size', type=int, default=None)
    parser.add_argument('--central_only', action='store_true', default=False,
                        help='train only central_params (frozen backbones)')
    parser.add_argument('--no-verbose', dest='verbose', action='store_false',
                        default=True)
    parser.add_argument('--save_checkpoint', action='store_true', default=False)
    parser.add_argument('--use_dataparallel', action='store_true',
                        default=False,
                        help='batch-shard over a mesh of all visible '
                             'devices (the DataParallel equivalent)')
    from mfas_tpu.parallel.mesh import add_dist_args
    add_dist_args(parser)
    return parser.parse_args()


def build_model(args):
    from mfas_tpu.models import mm_imdb as M
    tfh = args.text_first_hidden
    if args.model == 'simplevt':
        return M.SimpleVTNet(args, tfh, 3)
    if args.model == 'vggvt':
        return M.VGGVTNet(args, tfh, 3)
    if args.model == 'simplevt_centralnet':
        return M.SimpleVT_CentralNet(args, tfh, 3)
    if args.model == 'vggt_centralnet':
        return M.VGGT_CentralNet(args, tfh, 3)
    return M.VGGT_CentralNetV2(args, tfh, 3)


def main():
    from mfas_tpu.runtime.compile_cache import \
        enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    print("Training MM-IMDB fusion network")
    args = parse_args()
    # multi-host init must precede the first jax device query (no-op
    # without the --dist_* flags)
    from mfas_tpu.parallel.mesh import initialize_from_args
    initialize_from_args(args)
    print("The configuration of this run is:")
    print(args)

    from mfas_tpu.core.sched import LRCosineAnnealingScheduler
    from mfas_tpu.data.mm_imdb import MM_IMDB, MMIMDBLoader
    from mfas_tpu.engine.mmimdb import MMIMDBEngine
    from mfas_tpu.models.vgg import remap_torchvision_vgg_keys
    from mfas_tpu.runtime import checkpoint as ckpt
    from mfas_tpu.core.module import tree_set, unflatten_tree
    import jax.numpy as jnp

    if not args.average_text:
        raise SystemExit(
            "--no-average_text: every CLI --model choice consumes a "
            "mean-pooled 300-d text vector; the padded (T, 300) sequence "
            "path is a library-level capability (data.mm_imdb collate + "
            "models.mm_imdb.SimpleRecurrentModel)")
    model = build_model(args)
    tree = model.init(0)

    if args.vgg_cp:
        flat = ckpt.load_state_dict(os.path.join(args.checkpointdir, args.vgg_cp))
        vgg_flat = remap_torchvision_vgg_keys(flat, prefix="vgg")
        for k, v in vgg_flat.items():
            tree = tree_set(tree, "image_net." + k, jnp.asarray(v))
        print("Loaded VGG19 trunk from", args.vgg_cp)

    if args.test_cp:
        tree = ckpt.tree_from_state_dict(
            ckpt.load_state_dict(os.path.join(args.checkpointdir, args.test_cp)),
            tree)

    loaders = {}
    sizes = {}
    for stage, size in (("train", args.train_size), ("dev", args.dev_size),
                        ("test", args.test_size)):
        ds = MM_IMDB(args.datadir, stage=stage, feat_dim=args.feat_dim,
                     average_text=args.average_text, len_data=size)
        loaders[stage] = MMIMDBLoader(ds, args.batchsize,
                                      shuffle=(stage == "train"))
        sizes[stage] = len(ds)

    import jax
    from mfas_tpu.parallel.mesh import data_mesh_from_args
    mesh = data_mesh_from_args(args)
    engine = MMIMDBEngine(model, pos_weight=args.pos_weight,
                          th_fscore=args.th_fscore,
                          stable_bce=args.stable_bce, mesh=mesh)

    start = time.time()
    if not args.test_cp:
        sched = LRCosineAnnealingScheduler(args.eta_max, args.eta_min,
                                           args.Ti, args.Tm,
                                           sizes["train"] / args.batchsize)
        prefixes = model.central_params() if args.central_only else None
        best_f1, tree = engine.train_track_f1(
            tree, prefixes, {k: loaders[k] for k in ("train", "dev")},
            sizes, sched, num_epochs=args.epochs, verbose=args.verbose)
        print('Best dev F1: {}'.format(best_f1))

    # test-set samples-F1
    test_f1 = engine.test_track_f1(tree, loaders["test"])
    elapsed = time.time() - start
    print('Training in {:.0f}m {:.0f}s'.format(elapsed // 60, elapsed % 60))
    print('Model F1: {}'.format(test_f1))

    from mfas_tpu.parallel import mesh as pm
    if args.save_checkpoint and pm.is_primary_process():
        filename = os.path.join(args.checkpointdir,
                                f"mmimdb_{args.model}_{test_f1:.4f}.checkpoint")
        ckpt.save(ckpt.state_dict_from_tree(tree), filename)
        print('Saved ' + filename)


if __name__ == "__main__":
    # benign-noise fd-2 filter for interactive runs (one shared policy —
    # proof of benignity in mfas_tpu/runtime/logfilter.py)
    from mfas_tpu.runtime.logfilter import run_filtered
    run_filtered(main)
