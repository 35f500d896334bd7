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
    return model, shapes, "tuple", 0


def _avmnist(args):
    from main_found_avmnist import FOUND_CONFS
    from mfas_tpu.fusion.avmnist import Searchable_Audio_Image_Net

    conf = FOUND_CONFS[args.conf]
    model = Searchable_Audio_Image_Net(args, conf)
    B = args.batch
    return model, ((B, 1, 28, 28), (B, 1, 112, 112)), "tuple", 0


def _mmimdb(args):
    from main_found_mmimdb import build_model

    model = build_model(args)
    B = args.batch
    h, w = args.image_size
    # mmimdb models take (text, image) splatted and return the fused
    # logits LAST (engine/mmimdb.py _forward takes out[-1])
    return model, ((B, args.feat_dim), (B, 3, h, w)), "splat", -1


def _cifar(args):
    import numpy as _np

    from mfas_tpu.fusion.cifar import Searchable_MicroCNN

    conf = _np.array([[int(v) for v in row.split(',')]
                      for row in args.cifar_conf.split(';')])
    model = Searchable_MicroCNN(args, conf, fixed=True)
    B = args.batch
    return model, ((B, 3, args.img_size, args.img_size),), "splat", 0


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("vertical",
                   choices=("ntu", "avmnist", "mmimdb", "cifar"))
    p.add_argument("--conf", type=int, default=0)
    p.add_argument("--test_cp", type=str, default="",
                   help="full found-model checkpoint to bake in")
    p.add_argument("--checkpointdir", type=str, default=".")
    p.add_argument("--random_init", action="store_true", default=False)
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--polymorphic_batch", action="store_true", default=False,
                   help="export with a SYMBOLIC batch dimension: one "
                        "artifact serves any batch size")
    p.add_argument("--check", action="store_true", default=False,
                   help="after writing, reload the artifact and run it on "
                        "zero inputs on THIS host's backend — validates the "
                        "export at export time instead of at first serve")
    p.add_argument("--platforms", type=str, default="cpu,tpu,cuda",
                   help="comma list of serving platforms lowered into the "
                        "artifact (jax.export multi-platform)")
    p.add_argument("--bf16", action="store_true", default=False,
                   help="bake the weights in as bfloat16 constants and run "
                        "the forward in bf16 (same mixed-precision scheme "
                        "as the train engines' --bf16: BatchNorm running "
                        "stats stay f32, logits return as f32). Halves the "
                        "artifact size and ~doubles MXU serving throughput; "
                        "the artifact's input/output interface stays f32")
    # model hyperparameters (defaults = the found-CLI defaults)
    p.add_argument("--num_outputs", type=int, default=None)
    p.add_argument("--inner_representation_size", type=int, default=None)
    p.add_argument("--channels", type=int, default=None,
                   help="default: the vertical's found-CLI default")
    p.add_argument("--vid_len", type=int, nargs="+", default=[8, 32])
    p.add_argument("--vid_dim", type=int, default=256)
    p.add_argument("--resnet3d_layers", type=int, nargs=4, default=None,
                   help="blocks per ResNet3D stage (default 3 4 6 3 = "
                        "ResNet-50); the found-CLI shrink knob")
    p.add_argument("--resnet3d_base_width", type=int, default=None)
    p.add_argument("--drpt", type=float, default=0.0)
    p.add_argument("--batchnorm", action="store_true", default=False)
    p.add_argument("--alphas", action="store_true", default=False)
    p.add_argument("--multitask", action="store_true", default=False)
    # mmimdb
    p.add_argument("--model", type=str, default="vggt_centralnet_v2",
                   help="mmimdb model name (main_found_mmimdb choices)")
    p.add_argument("--text_first_hidden", type=int, default=512)
    p.add_argument("--fusingmix", type=str, default="13,24")
    p.add_argument("--fusetype", type=str, default="cat")
    p.add_argument("--feat_dim", type=int, default=300)
    p.add_argument("--image_size", type=int, nargs=2, default=[256, 160],
                   help="(h, w) of the artifact's image input. Default "
                        "matches what the MM-IMDB loader actually yields: "
                        "disk posters are (160, 256, 3) and the collate "
                        "transposes channel-first to (B, 3, 256, 160) "
                        "(reference collate_imdb datasets/mm_imdb.py:168)")
    # cifar (found mode: conf rows 'op1,op2,conn1,conn2' joined by ';')
    p.add_argument("--cifar_conf", type=str,
                   default="0,1,-2,-1;2,3,-2,0",
                   help="found-mode cell rows 'op1,op2,conn1,conn2' "
                        "joined by ';' (conn in [-2, block))")
    p.add_argument("--net_str", type=int, nargs="+", default=[1, 1, 2])
    p.add_argument("--planes", type=int, default=36)
    p.add_argument("--img_size", type=int, default=32)
    p.add_argument("--drop_prob", type=float, default=0.0)
    p.add_argument("--drop_path", type=float, default=0.0)
    args = p.parse_args(argv)
    args.vid_len = tuple(args.vid_len)
    # shrink knobs default to absent so models/ntu.py's getattr defaults
    # (the full ResNet-50) stay authoritative
    if args.resnet3d_layers is not None:
        args.resnet3d_layers = tuple(args.resnet3d_layers)
    else:
        del args.resnet3d_layers
    if args.resnet3d_base_width is None:
        del args.resnet3d_base_width
    if args.num_outputs is None:
        args.num_outputs = {"ntu": 60, "avmnist": 10, "mmimdb": 23,
                            "cifar": 10}[args.vertical]
    if args.inner_representation_size is None:
        # the found-CLI defaults (main_found_ntu.py / main_found_avmnist.py)
        args.inner_representation_size = 256
    if args.channels is None:
        # avmnist found CLI default 32; mmimdb found CLI default 512
        args.channels = 512 if args.vertical == "mmimdb" else 32
    args.num_classes = args.num_outputs

    from mfas_tpu.runtime.compile_cache import \
        enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    builders = {"ntu": _ntu, "avmnist": _avmnist, "mmimdb": _mmimdb,
                "cifar": _cifar}
    model, shapes, call_style, out_index = builders[args.vertical](args)
    tree = model.init(0)
    if not args.random_init:
        if not args.test_cp:
            raise SystemExit("pass --test_cp <checkpoint> or --random_init")
        from mfas_tpu.runtime.checkpoint import (load_state_dict,
                                                 tree_from_state_dict)
        sd = load_state_dict(os.path.join(args.checkpointdir, args.test_cp))
        tree = tree_from_state_dict(sd, template=tree)

    import jax
    import jax.numpy as jnp
    from mfas_tpu.core.module import Ctx, cast_compute
    from mfas_tpu.runtime.export import save_exported

    if args.bf16:
        # cast ONCE here so the artifact's baked weight constants are
        # bf16 (half the bytes); BN running stats stay f32 (cast_compute)
        tree = cast_compute(tree, jnp.bfloat16)

    def fwd(*inputs):
        ctx = Ctx(train=False)
        if args.bf16:
            inputs = cast_compute(inputs, jnp.bfloat16)
        out = (model.apply(tree, ctx, inputs) if call_style == "tuple"
               else model.apply(tree, ctx, *inputs))
        # serving surface: the fused logits (multitask heads and aux
        # outputs stay out of the artifact — sum downstream if needed)
        out = out[out_index] if isinstance(out, (tuple, list)) else out
        return out.astype(jnp.float32) if args.bf16 else out

    if args.polymorphic_batch:
        from jax import export as jexport
        b, = jexport.symbolic_shape("b")
        shapes = tuple((b,) + tuple(s[1:]) for s in shapes)
    structs = tuple(jax.ShapeDtypeStruct(s, np.float32) for s in shapes)
    platforms = tuple(p_ for p_ in args.platforms.split(",") if p_)
    n = save_exported(args.out, fwd, structs, platforms=platforms)
    print(f"exported {args.vertical} conf {args.conf} -> {args.out} "
          f"({n} bytes, inputs {[tuple(s) for s in shapes]})")

    if args.check:
        from mfas_tpu.runtime.export import load_exported

        exp = load_exported(args.out)
        # concrete shapes even for a symbolic batch: check at batch 2
        concrete = tuple((2,) + tuple(int(d) for d in s[1:])
                         if args.polymorphic_batch else tuple(s)
                         for s in shapes)
        out = np.asarray(exp.call(*(np.zeros(s, np.float32)
                                    for s in concrete)))
        if not np.all(np.isfinite(out)):
            raise SystemExit(f"--check FAILED: non-finite outputs {out}")
        print(f"check OK: reloaded artifact ran on "
              f"{jax.devices()[0].platform}, output shape {out.shape}")


if __name__ == "__main__":
    # benign-noise fd-2 filter for interactive runs (one shared policy —
    # proof of benignity in mfas_tpu/runtime/logfilter.py)
    from mfas_tpu.runtime.logfilter import run_filtered
    run_filtered(main)
