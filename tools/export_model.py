"""Export a found architecture's eval forward as a serialized StableHLO
serving artifact (weights baked in; consumer needs only jax).

    # NTU found net (conf table 0..4 as in main_found_ntu.py)
    python tools/export_model.py ntu --conf 4 --test_cp best.checkpoint \
        --checkpointdir ckpts --out ntu_conf4.stablehlo --batch 8

    # AV-MNIST found net
    python tools/export_model.py avmnist --conf 0 --test_cp m.checkpoint \
        --checkpointdir ckpts --out av.stablehlo

``--random_init`` exports with fresh weights (smoke/integration use).
The artifact reloads with ``mfas_tpu.runtime.export.load_exported`` —
or plain jax: ``jax.export.deserialize(open(p,'rb').read()).call(...)``.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ntu(args):
    from main_found_ntu import FOUND_CONFS
    from mfas_tpu.fusion.ntu import Searchable_Skeleton_Image_Net

    conf = FOUND_CONFS[args.conf]
    model = Searchable_Skeleton_Image_Net(args, conf)
    B, (fr, wl) = args.batch, args.vid_len
    d = args.vid_dim
    shapes = ((B, fr, d, d, 3), (B, 3, wl, 25, 2))
    return model, shapes


def _avmnist(args):
    from main_found_avmnist import FOUND_CONFS
    from mfas_tpu.fusion.avmnist import Searchable_Audio_Image_Net

    conf = FOUND_CONFS[args.conf]
    model = Searchable_Audio_Image_Net(args, conf)
    B = args.batch
    return model, ((B, 1, 28, 28), (B, 1, 112, 112))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("vertical", choices=("ntu", "avmnist"))
    p.add_argument("--conf", type=int, default=0)
    p.add_argument("--test_cp", type=str, default="",
                   help="full found-model checkpoint to bake in")
    p.add_argument("--checkpointdir", type=str, default=".")
    p.add_argument("--random_init", action="store_true", default=False)
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--batch", type=int, default=8)
    # model hyperparameters (defaults = the found-CLI defaults)
    p.add_argument("--num_outputs", type=int, default=None)
    p.add_argument("--inner_representation_size", type=int, default=None)
    p.add_argument("--channels", type=int, default=32)
    p.add_argument("--vid_len", type=int, nargs="+", default=[8, 32])
    p.add_argument("--vid_dim", type=int, default=256)
    p.add_argument("--drpt", type=float, default=0.0)
    p.add_argument("--batchnorm", action="store_true", default=False)
    p.add_argument("--alphas", action="store_true", default=False)
    p.add_argument("--multitask", action="store_true", default=False)
    args = p.parse_args(argv)
    args.vid_len = tuple(args.vid_len)
    if args.num_outputs is None:
        args.num_outputs = 60 if args.vertical == "ntu" else 10
    if args.inner_representation_size is None:
        args.inner_representation_size = \
            128 if args.vertical == "ntu" else 16
    args.num_classes = args.num_outputs

    from mfas_tpu.runtime.compile_cache import \
        enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    model, shapes = (_ntu if args.vertical == "ntu" else _avmnist)(args)
    tree = model.init(0)
    if not args.random_init:
        if not args.test_cp:
            raise SystemExit("pass --test_cp <checkpoint> or --random_init")
        from mfas_tpu.runtime.checkpoint import (load_state_dict,
                                                 tree_from_state_dict)
        sd = load_state_dict(os.path.join(args.checkpointdir, args.test_cp))
        tree = tree_from_state_dict(sd, template=tree)

    import jax
    from mfas_tpu.core.module import Ctx
    from mfas_tpu.runtime.export import save_exported

    def fwd(*inputs):
        out = model.apply(tree, Ctx(train=False), inputs)
        # serving surface: the fused logits (reference eval path keeps
        # the summed multitask prediction out of the artifact — sum the
        # heads downstream if needed)
        return out[0] if isinstance(out, (tuple, list)) else out

    structs = tuple(jax.ShapeDtypeStruct(s, np.float32) for s in shapes)
    n = save_exported(args.out, fwd, structs)
    print(f"exported {args.vertical} conf {args.conf} -> {args.out} "
          f"({n} bytes, inputs {[tuple(s) for s in shapes]})")


if __name__ == "__main__":
    main()
