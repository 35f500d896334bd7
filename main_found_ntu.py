#!/usr/bin/env python3
"""Train/test a found NTU fusion architecture (reference main_found_ntu.py,
flags and defaults preserved per BASELINE.json).

Two-phase training (reference :94-157): 1 epoch central-only at
eta_max/10 (the per-batch cosine scheduler immediately governs the actual
LR, exactly as in the reference), then the whole net at eta_max for
--epochs epochs; finally evaluates on the test split. --test_cp skips
training and evaluates a full checkpoint.

TPU-native: --use_dataparallel maps to batch sharding over all visible
devices on a jax Mesh (ICI all-reduce) instead of torch DataParallel.
"""

import argparse
import os
import re
import time

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser(description="Modality optimization.")
    parser.add_argument('--checkpointdir', type=str, help='output base dir',
                        default='checkpoints/')
    parser.add_argument('--datadir', type=str, help='data directory',
                        default='data/NTU/')
    parser.add_argument('--ske_cp', type=str,
                        help='Skeleton net checkpoint (in checkpointdir)',
                        default='skeleton_32frames_85.24.checkpoint')
    parser.add_argument('--rgb_cp', type=str,
                        help='RGB net checkpoint (in checkpointdir)',
                        default='rgb_8frames_83.91.checkpoint')
    parser.add_argument('--test_cp', type=str,
                        help='Full net checkpoint (in checkpointdir)', default='')
    parser.add_argument('--num_outputs', type=int, help='output dimension', default=60)
    parser.add_argument('--batchsize', type=int, help='batch size', default=20)
    parser.add_argument('--inner_representation_size', type=int,
                        help='output size of mixing linear layers', default=256)
    parser.add_argument('--epochs', type=int, help='training epochs', default=70)
    parser.add_argument('--eta_max', type=float, help='eta max', default=0.001)
    parser.add_argument('--eta_min', type=float, help='eta min', default=0.000001)
    parser.add_argument('--Ti', type=int, help='epochs Ti', default=5)
    parser.add_argument('--Tm', type=int, help='epochs multiplier Tm', default=2)
    parser.add_argument('--use_dataparallel', help='Use several TPU chips',
                        action='store_true', dest='use_dataparallel', default=False)
    parser.add_argument('--j', dest='num_workers', type=int,
                        help='Dataloader CPUS', default=16)
    parser.add_argument('--modality', type=str, help='', default='both')
    parser.add_argument('--no-verbose', help='verbose', action='store_false',
                        dest='verbose', default=True)
    parser.add_argument('--weightsharing', help='Weight sharing',
                        action='store_true', default=False)
    parser.add_argument('--no-multitask', dest='multitask', help='Multitask loss',
                        action='store_false', default=True)
    parser.add_argument('--alphas', help='Use alphas', action='store_true',
                        default=False)
    parser.add_argument('--batchnorm', help='Use batch norm', action='store_true',
                        dest='batchnorm', default=False)
    parser.add_argument("--vid_dim", action="store", default=256, dest="vid_dim",
                        help="frame side dimension (square image assumed) ")
    parser.add_argument("--vid_fr", action="store", default=30, dest="vi_fr",
                        help="video frame rate")
    parser.add_argument("--vid_len", action="store", default=(8, 32),
                        dest="vid_len", type=int, nargs='+',
                        help="length of video, as a tuple of two lengths, "
                             "(rgb len, skel len)")
    parser.add_argument("--drpt", action="store", default=0.4, dest="drpt",
                        type=float, help="dropout")
    parser.add_argument('--no_bad_skel', action="store_true",
                        help='Remove the 300 bad samples, espec. useful to evaluate',
                        default=False)
    parser.add_argument("--no_norm", action="store_true", default=False,
                        dest="no_norm", help="Not normalizing the skeleton")
    parser.add_argument('--conf', type=int, help='conf to train', default=1)
    # additive flags (not in the reference)
    parser.add_argument('--random_backbones', action='store_true', default=False,
                        help='smoke-run without pretrained backbone checkpoints')
    parser.add_argument('--save_checkpoint', action='store_true', default=False,
                        help='save the final model (conf+acc filename, torch format)')
    parser.add_argument('--profile_dir', type=str, default='',
                        help='capture a jax profiler trace here')
    parser.add_argument('--bf16', action='store_true', default=False,
                        help='bfloat16 compute (float32 params/optimizer)')
    parser.add_argument('--remat', action='store_true', default=False,
                        help='rematerialize the forward in backward (saves HBM)')
    parser.add_argument('--conv_channels_last', action='store_true',
                        default=False,
                        help='lower convs in NHWC/NDHWC (TPU MXU-friendly); '
                             'params stay in torch layout')
    parser.add_argument('--packed_datadir', type=str, default='',
                        help='directory of packed stores (mfas_tpu.data.ntu_pack), '
                             'subdirs train/dev/test; bypasses AVI decode')
    parser.add_argument('--device_input_normalize', action='store_true',
                        default=False,
                        help='ship raw uint8 clips and normalize on-device '
                             'via the fused Pallas kernel (needs '
                             '--packed_datadir)')
    parser.add_argument('--hbm_resident', action='store_true', default=False,
                        help='upload the packed store to device HBM once; '
                             'batches become index plans and the gather + '
                             'temporal resample + normalize run inside the '
                             'jitted step (needs --packed_datadir; see '
                             'mfas_tpu/data/resident.py for the HBM budget)')
    parser.add_argument('--shard_resident_store', action='store_true',
                        default=False,
                        help='with --hbm_resident under a mesh: split the '
                             'store over the data axis (1/D per chip) '
                             'instead of replicating it')
    parser.add_argument('--resnet3d_layers', type=int, nargs=4,
                        default=(3, 4, 6, 3), metavar='N',
                        help='blocks per inflated-ResNet stage (shrink knob '
                             'for tests/small deployments; the reference '
                             'architecture is 3 4 6 3)')
    parser.add_argument('--resnet3d_base_width', type=int, default=64,
                        help='inflated-ResNet stem width (shrink knob; '
                             'reference 64 — tap widths scale with it)')
    parser.add_argument('--train_state', type=str, default='',
                        help='per-epoch resumable training state path')
    parser.add_argument('--resume', action='store_true', default=False,
                        help='resume from --train_state if present')
    from mfas_tpu.parallel.mesh import add_dist_args
    add_dist_args(parser)
    return parser.parse_args()


# found architectures (reference main_found_ntu.py:173-182)
FOUND_CONFS = {
    0: np.array([[2, 2, 0], [1, 0, 1], [3, 2, 0], [3, 1, 1]]),
    1: np.array([[3, 0, 0], [1, 3, 0], [1, 1, 1], [3, 3, 0]]),
    2: np.array([[3, 2, 0], [2, 3, 1], [0, 1, 1], [3, 0, 0]]),
    3: np.array([[1, 1, 1], [3, 2, 0], [0, 1, 1], [3, 0, 0]]),
    4: np.array([[3, 1, 1], [1, 3, 0], [1, 1, 1], [3, 3, 0]]),
}


def get_dataloaders(args, mesh=None):
    from mfas_tpu.data import ntu as d
    from mfas_tpu.data.loader import MapLoader

    tfm_val = d.Compose([d.NormalizeLen(args.vid_len)])
    tfm_tra = d.Compose([d.AugCrop(), d.NormalizeLen(args.vid_len)])

    if getattr(args, 'hbm_resident', False):
        import os
        from mfas_tpu.data.resident import ResidentLoader, ResidentNTUStore
        if not getattr(args, 'packed_datadir', ''):
            raise SystemExit('--hbm_resident needs --packed_datadir '
                             '(build one with tools/pack_ntu)')
        return {k: ResidentLoader(
            ResidentNTUStore(os.path.join(args.packed_datadir, k),
                             args=args, mesh=mesh,
                             shard=getattr(args, 'shard_resident_store',
                                           False)),
            args.batchsize, transform=(tfm_tra if k == 'train' else tfm_val),
            shuffle=(k == 'train'))
            for k in ('train', 'dev', 'test')}

    if getattr(args, 'packed_datadir', ''):
        import os
        from mfas_tpu.data.ntu_pack import PackedNTU
        datasets = {
            k: PackedNTU(os.path.join(args.packed_datadir, k),
                         transform=(tfm_tra if k == 'train' else tfm_val),
                         args=args,
                         device_normalize=getattr(args, 'device_input_normalize',
                                                  False))
            for k in ('train', 'dev', 'test')
        }
    else:
        datasets = {
            # vid_dim/vi_fr forwarded (repair: the reference parses these
            # flags but never passes them to NTU, silently using 256/30)
            'train': d.NTU(args.datadir, transform=tfm_tra, stage='train',
                           vid_dim=int(args.vid_dim), vid_fr=int(args.vi_fr),
                           args=args),
            'dev': d.NTU(args.datadir, transform=tfm_val, stage='dev',
                         vid_dim=int(args.vid_dim), vid_fr=int(args.vi_fr),
                         args=args),
            'test': d.NTU(args.datadir, transform=tfm_val, stage='test',
                          vid_dim=int(args.vid_dim), vid_fr=int(args.vi_fr),
                          args=args),
        }
    return {k: MapLoader(v, args.batchsize, shuffle=(k == 'train'),
                         num_workers=args.num_workers)
            for k, v in datasets.items()}


def train_model(model, tree, configuration, dataloaders, args, mesh=None):
    from mfas_tpu.core.sched import LRCosineAnnealingScheduler
    from mfas_tpu.engine.classifier import ClassifierEngine

    sizes = {k: dl.dataset_size for k, dl in dataloaders.items()}
    if getattr(args, 'conv_channels_last', False):
        from mfas_tpu.core import functional as F
        F.set_conv_channels_last(True)
    batch_prep = None
    if getattr(args, 'hbm_resident', False):
        from mfas_tpu.data.resident import make_resident_prep
        # bf16 steps get bf16 clips straight from the in-graph normalize
        # (one rounding, no f32 HBM round-trip); gather+normalize stay on
        # the XLA lowering — measured at the dispatch floor vs a 6-9x
        # slower Pallas kernel (make_resident_prep docstring)
        batch_prep = make_resident_prep(
            no_norm=args.no_norm,
            compute_dtype="bfloat16" if getattr(args, 'bf16', False)
            else None)
    elif getattr(args, 'device_input_normalize', False):
        if getattr(args, 'packed_datadir', ''):
            from mfas_tpu.data.ntu_pack import make_device_normalize_prep
            batch_prep = make_device_normalize_prep()
        else:
            # the raw-AVI loader already normalized on the host — running
            # the u8 affine again would silently double-normalize
            print('WARNING: --device_input_normalize needs '
                  '--packed_datadir (tools/pack_ntu) — ignored; this run '
                  'normalizes on the host')
    engine = ClassifierEngine(
        model, multitask=args.multitask, input_keys=("rgb", "ske"), mesh=mesh,
        remat=getattr(args, 'remat', False),
        compute_dtype="bfloat16" if getattr(args, 'bf16', False) else None,
        batch_prep=batch_prep)

    if args.test_cp == '':
        nbpe = sizes['train'] / args.batchsize

        state_path = getattr(args, 'train_state', '') or None
        resuming = (getattr(args, 'resume', False) and state_path
                    and os.path.exists(state_path))
        if resuming:
            # phase 2's resume load replaces the whole training state, so
            # re-running the phase-1 central pretrain would be an epoch of
            # wasted backbone compute
            if args.verbose:
                print('Resuming phase 2 from ' + state_path
                      + ' (central pretrain skipped)')
        else:
            if args.verbose:
                print('Pretraining central weights: ')
                print(configuration)
            scheduler = LRCosineAnnealingScheduler(
                args.eta_max, args.eta_min, args.Ti, args.Tm, nbpe)
            interm_acc, tree = engine.train_track_acc(
                tree, model.central_params(),
                {k: dataloaders[k] for k in ('train', 'dev')}, sizes,
                scheduler, num_epochs=1, print_loss=args.verbose)
            if args.verbose:
                print('Intermediate val accuracy: ' + str(interm_acc))

        scheduler = LRCosineAnnealingScheduler(
            args.eta_max, args.eta_min, args.Ti, args.Tm, nbpe)
        best_acc, tree = engine.train_track_acc(
            tree, None, {k: dataloaders[k] for k in ('train', 'dev')}, sizes,
            scheduler, num_epochs=args.epochs, print_loss=args.verbose,
            state_path=state_path,
            resume=getattr(args, 'resume', False))
        if args.verbose:
            print('Final val accuracy: ' + str(best_acc))

    test_acc = engine.test_track_acc(tree, dataloaders['test'], sizes['test'])
    if args.verbose:
        print('Final test accuracy: ' + str(test_acc))
    return test_acc, tree


def main():
    from mfas_tpu.runtime.compile_cache import \
        enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    print("Training found NTU network")
    args = parse_args()
    # multi-host init must precede the first jax device query (no-op
    # without the --dist_* flags)
    from mfas_tpu.parallel.mesh import initialize_from_args
    initialize_from_args(args)
    print("The configuration of this run is:")
    print(args)

    import jax
    from mfas_tpu.core.module import tree_set
    from mfas_tpu.fusion.ntu import Searchable_Skeleton_Image_Net
    from mfas_tpu.parallel.mesh import data_mesh_from_args
    from mfas_tpu.runtime import checkpoint as ckpt
    from mfas_tpu.runtime.profiler import maybe_profile
    from mfas_tpu.search.searchers import _load_backbone_tree

    mesh = data_mesh_from_args(args)

    if args.conf not in FOUND_CONFS:
        raise SystemExit(f"--conf must be one of {sorted(FOUND_CONFS)} "
                         f"(got {args.conf})")
    configuration = FOUND_CONFS[args.conf]
    model = Searchable_Skeleton_Image_Net(args, configuration)
    tree = model.init(0)

    if args.test_cp:
        full = os.path.join(args.checkpointdir, args.test_cp)
        tree = ckpt.tree_from_state_dict(ckpt.load_state_dict(full), tree)
    else:
        tree = tree_set(tree, "skenet", _load_backbone_tree(
            os.path.join(args.checkpointdir, args.ske_cp), tree["skenet"],
            random_ok=args.random_backbones))
        tree = tree_set(tree, "rgbnet", _load_backbone_tree(
            os.path.join(args.checkpointdir, args.rgb_cp), tree["rgbnet"],
            random_ok=args.random_backbones))

    dataloaders = get_dataloaders(args, mesh=mesh)
    start_time = time.time()
    with maybe_profile(args.profile_dir):
        modelacc, tree = train_model(model, tree, configuration, dataloaders,
                                     args, mesh=mesh)
    elapsed = time.time() - start_time
    print('Training in {:.0f}m {:.0f}s'.format(elapsed // 60, elapsed % 60))
    print('Model Acc: {}'.format(modelacc))

    from mfas_tpu.parallel import mesh as pm
    if args.save_checkpoint and pm.is_primary_process():
        confstr = np.array2string(configuration, precision=1, separator='_',
                                  suppress_small=True)
        confstr = re.sub(r"_\n ", "_", confstr)
        filename = os.path.join(
            args.checkpointdir,
            "final_conf_" + confstr + "_" + str(modelacc) + ".checkpoint")
        ckpt.save(ckpt.state_dict_from_tree(tree), filename)
        print('Saved ' + filename)


if __name__ == "__main__":
    # benign-noise fd-2 filter for interactive runs (one shared policy —
    # proof of benignity in mfas_tpu/runtime/logfilter.py)
    from mfas_tpu.runtime.logfilter import run_filtered
    run_filtered(main)
