#!/usr/bin/env python3
"""One-command real-data parity kit for the NTU headline runs.

The reference's published accuracy channel is its README command + released
checkpoints (reference README.md:24-42: the 0.9134 `--conf 4` eval, the
paper-conf eval, and the Google-Drive checkpoint bundle with
`skeleton_32frames_85.24.checkpoint` / `rgb_8frames_83.91.checkpoint`
backbones, reference main_found_ntu.py:26-34,94-157). This environment has
neither the NTU data nor the released files, so real-data parity cannot be
measured here — this kit makes the run TURNKEY the moment they exist:

  python tools/parity_kit.py --datadir /data/NTU \
      --checkpointdir /data/NTU/checkpoints

checks every precondition (dataset layout + split counts, each released
checkpoint loadable through the torch-format reader and shape-matched
against the model trees, optional converter outputs) and, when they pass,
prints the exact commands for the 0.9134 eval, the found-arch training
run, and the search run — plus the TPU production variants (packed store,
--hbm_resident --bf16, --cache_features).

Dry-run against synthetic fixtures (no real data needed; exercises the
same checks end-to-end, smoke-tested in tests/test_tools_smoke.py):

  python tools/parity_kit.py --synthetic /tmp/kitcheck
"""

import argparse
import os
import sys
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the reference README's released-artifact names (README.md:28-36)
BEST_CP = "best_3_1_1_1_3_0_1_1_1_3_3_0_0.9134.checkpoint"
PAPER_CP = ("conf_[[3_0_0]_[1_3_0]_[1_1_1]_[3_3_0]]_both_"
            "0.896888457572633.checkpoint")
SKE_CP = "skeleton_32frames_85.24.checkpoint"
RGB_CP = "rgb_8frames_83.91.checkpoint"

# NTU RGB+D cross-subject protocol (reference datasets/ntu.py splits):
# 40 subjects, 60 actions; full dataset is 56880 clips minus 302 bad
# skeletons. Counts below are per the protocol's subject partition.
FULL_TOTAL = 56880


def _model_args(a):
    return types.SimpleNamespace(
        num_outputs=a.num_outputs, vid_len=tuple(a.vid_len), drpt=0.0,
        inner_representation_size=a.inner_representation_size,
        multitask=True, alphas=False, batchnorm=a.batchnorm,
        resnet3d_layers=tuple(a.resnet3d_layers),
        resnet3d_base_width=a.resnet3d_base_width)


def check_dataset(datadir, vid_dim=256, vid_fr=30, out=print):
    """Layout + per-split counts for the AVI/skeleton directory pair."""
    from mfas_tpu.data.ntu import SPLITS

    ok = True
    rgb_dir = os.path.join(datadir,
                           f"nturgbd_rgb/avi_{vid_dim}x{vid_dim}_{vid_fr}")
    ske_dir = os.path.join(datadir, "nturgbd_skeletons")
    for d, what in ((rgb_dir, "AVI clips"), (ske_dir, "skeleton files")):
        if not os.path.isdir(d):
            out(f"[FAIL] {what}: directory missing: {d}")
            ok = False
    if not ok:
        return False, {}
    avis = [f for f in sorted(os.listdir(rgb_dir)) if f.endswith(".avi")]
    skes = [f for f in sorted(os.listdir(ske_dir))
            if f.endswith(".skeleton")]
    if not avis:
        out(f"[FAIL] no .avi files under {rgb_dir}")
        return False, {}
    # the SxxxCxxxPxxxRxxxAxxx scheme is what data/ntu.py parses subject/
    # label from — a stray nonconforming file must be a [FAIL] diagnostic,
    # not a ValueError traceback out of the precondition checker
    def _subject(f):
        try:
            return int(f[9:12])
        except ValueError:
            return None
    bad_names = [f for f in avis if _subject(f) is None]
    if bad_names:
        out(f"[FAIL] {len(bad_names)} .avi files don't follow the "
            f"SxxxCxxxPxxxRxxxAxxx naming the loader parses (first: "
            f"{bad_names[0]!r}) — remove or rename them")
        ok = False
        avis = [f for f in avis if _subject(f) is not None]
    counts = {}
    for stage, subjects in SPLITS.items():
        n = sum(1 for f in avis if _subject(f) in subjects)
        counts[stage] = n
        if n == 0:
            out(f"[FAIL] split '{stage}' has 0 clips (subjects {subjects} "
                "absent) — check the cross-subject file naming "
                "SxxxCxxxPxxxRxxxAxxx_rgb.avi")
            ok = False
    stems_a = {f[:20] for f in avis}
    stems_s = {f[:20] for f in skes}
    unpaired = len(stems_a - stems_s)
    if unpaired:
        out(f"[warn] {unpaired} clips have no .skeleton pair (they will "
            "pair positionally after sorting — verify the lists align)")
    out(f"[{'ok' if ok else 'FAIL'}] dataset: {len(avis)} AVIs / "
        f"{len(skes)} skeletons at {vid_dim}x{vid_dim}_{vid_fr}; splits "
        + ", ".join(f"{k}={v}" for k, v in counts.items())
        + (f" (full NTU = {FULL_TOTAL} clips)"
           if len(avis) < FULL_TOTAL else ""))
    return ok, counts


def _shape_check(flat, template_tree, label, out=print):
    from mfas_tpu.core.module import flatten_tree

    tflat = flatten_tree(template_tree)
    missing = [k for k in tflat if k not in flat]
    unexpected = [k for k in flat if k not in tflat]
    bad_shape = [k for k in tflat if k in flat
                 and tuple(np.shape(flat[k])) != tuple(np.shape(tflat[k]))]
    if missing or unexpected or bad_shape:
        out(f"[FAIL] {label}: missing={missing[:3]} "
            f"unexpected={unexpected[:3]} shape-mismatch="
            + str([(k, tuple(np.shape(flat[k])), tuple(np.shape(tflat[k])))
                   for k in bad_shape[:3]]))
        return False
    n = sum(int(np.prod(np.shape(v)) or 1) for v in flat.values())
    out(f"[ok] {label}: {len(flat)} tensors / {n:,} params, all shapes "
        "match the model tree")
    return True


def check_checkpoints(checkpointdir, args, out=print):
    """Load every released checkpoint present through the torch-format
    reader (zip AND legacy stream, runtime/checkpoint.py) and shape-check
    it against the conf model / backbone trees."""
    from mfas_tpu.fusion.ntu import Searchable_Skeleton_Image_Net
    from mfas_tpu.runtime import checkpoint as ckpt

    margs = _model_args(args)
    from main_found_ntu import FOUND_CONFS
    conf = FOUND_CONFS[args.conf]
    tree = Searchable_Skeleton_Image_Net(margs, conf).init(0)

    ok, any_found = True, False
    for name, template, what in (
            (args.test_cp or BEST_CP, tree, f"full net (--conf {args.conf})"),
            (args.ske_cp or SKE_CP, tree["skenet"], "skeleton backbone"),
            (args.rgb_cp or RGB_CP, tree["rgbnet"], "RGB backbone")):
        path = os.path.join(checkpointdir, name)
        if not os.path.exists(path):
            out(f"[missing] {what}: {path} — download the released bundle "
                "(reference README Google-Drive link) into "
                f"{checkpointdir}")
            ok = False
            continue
        any_found = True
        try:
            flat = ckpt.load_state_dict(path)
        except Exception as e:              # noqa: BLE001 — report, don't die
            out(f"[FAIL] {what}: reader error on {path}: {e}")
            ok = False
            continue
        ok &= _shape_check(flat, template, f"{what} ({name})", out=out)
    if ok and any_found:
        out("[ok] all released checkpoints load and shape-match")
    return ok


def check_converter(converted, out=print):
    """Optional: a torchvision-converted ImageNet init for from-scratch
    backbone training (tools/convert_torchvision.py resnet50_inflate)."""
    from mfas_tpu.core.module import flatten_tree
    from mfas_tpu.models.resnet3d import inflated_resnet50
    from mfas_tpu.runtime import checkpoint as ckpt

    if not os.path.exists(converted):
        out(f"[missing] converted ImageNet init: {converted} — run "
            "`python tools/convert_torchvision.py resnet50_inflate "
            f"--src resnet50-19c8e357.pth --dst {converted}` wherever the "
            "torchvision file exists (zero-egress here)")
        return False
    flat = ckpt.load_state_dict(converted)
    return _shape_check(flat, inflated_resnet50().init(0),
                        "converted ResNet-50 init", out=out)


def emit_commands(args, out=print):
    d, c = args.datadir, args.checkpointdir
    size_flags = (f"--inner_representation_size "
                  f"{args.inner_representation_size}"
                  + (" --batchnorm" if args.batchnorm else ""))
    out("\n== commands (reference README.md:24-42 equivalents) ==")
    out("# 1. eval the released best-found net (expected Model Acc "
        "~0.9134):")
    out(f"python main_found_ntu.py --datadir {d} --checkpointdir {c} "
        f"--test_cp {args.test_cp or BEST_CP} --conf {args.conf} "
        f"{size_flags}")
    out("# 2. eval the paper architecture (expected ~0.8969):")
    out(f"python main_found_ntu.py --datadir {d} --checkpointdir {c} "
        f"--test_cp {PAPER_CP}")
    out("# 3. retrain the found arch from the released backbones "
        "(two-phase central->full recipe, reference defaults):")
    out(f"python main_found_ntu.py --datadir {d} --checkpointdir {c} "
        f"--conf {args.conf} {size_flags} --epochs 30 --save_checkpoint")
    out("# 3b. TPU production variant (packed store uploaded once, "
        "batches gathered+normalized on device, bf16 steps):")
    out(f"python tools/pack_ntu.py --datadir {d} --out {d}/packed "
        "--stages train dev test")
    out(f"python main_found_ntu.py --datadir {d} --packed_datadir "
        f"{d}/packed --checkpointdir {c} --conf {args.conf} {size_flags} "
        "--epochs 30 --hbm_resident --bf16 --save_checkpoint")
    out("# 4. run the search itself (reference hyperparameters; "
        "--cache_features extracts each sample's frozen-backbone "
        "features once for the whole search):")
    out(f"python main_searchable_ntu.py --datadir {d} --checkpointdir {c} "
        "--epochs 3 --search_iterations 10 --num_samples 15 "
        "--cache_features")
    out("# each command resumes after interruption via --train_state/"
        "--resume (3) or --search_state/--resume_search (4); see "
        "docs/PARITY.md")


def build_synthetic(root, out=print):
    """Tiny fixtures exercising every check: an AVI/skeleton pair tree and
    torch-format checkpoints in BOTH container formats (zip via the
    repo writer; legacy 2019 stream via torch itself when available)."""
    from mfas_tpu.fusion.ntu import Searchable_Skeleton_Image_Net
    from mfas_tpu.runtime import checkpoint as ckpt
    from main_found_ntu import FOUND_CONFS

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tests"))
    from test_integration_ntu_cli import build_ntu_fixture
    import pathlib
    os.makedirs(root, exist_ok=True)
    build_ntu_fixture(pathlib.Path(root))
    cdir = os.path.join(root, "checkpoints")
    os.makedirs(cdir, exist_ok=True)

    a = _parse([])                       # defaults, then shrink
    a.num_outputs, a.inner_representation_size = 3, 8
    a.vid_len = [2, 32]
    a.resnet3d_layers, a.resnet3d_base_width = [1, 1, 1, 1], 16
    a.batchnorm = False
    tree = Searchable_Skeleton_Image_Net(
        _model_args(a), FOUND_CONFS[a.conf]).init(0)
    ckpt.save(ckpt.state_dict_from_tree(tree), os.path.join(cdir, BEST_CP))
    ckpt.save(ckpt.state_dict_from_tree(tree["rgbnet"]),
              os.path.join(cdir, RGB_CP))
    try:                                 # legacy stream exercises the 2019
        import torch                     # reader the released files need
        torch.save({k: torch.from_numpy(np.array(v, copy=True)) for k, v
                    in ckpt.state_dict_from_tree(tree["skenet"]).items()},
                   os.path.join(cdir, SKE_CP),
                   _use_new_zipfile_serialization=False)
    except ImportError:
        ckpt.save(ckpt.state_dict_from_tree(tree["skenet"]),
                  os.path.join(cdir, SKE_CP))
    out(f"[synthetic] fixture + checkpoints under {root}")
    return a, cdir


def _parse(argv):
    p = argparse.ArgumentParser(
        description="check real-data parity-run preconditions and emit "
                    "the exact commands (reference README.md:24-42)")
    p.add_argument("--datadir", type=str, default="")
    p.add_argument("--checkpointdir", type=str, default="")
    p.add_argument("--synthetic", type=str, default="",
                   help="build tiny fixtures under this dir and run the "
                        "checks against them (no real data needed)")
    p.add_argument("--vid_dim", type=int, default=256)
    p.add_argument("--vid_fr", type=int, default=30)
    p.add_argument("--conf", type=int, default=4)
    p.add_argument("--num_outputs", type=int, default=60)
    p.add_argument("--inner_representation_size", type=int, default=128)
    p.add_argument("--batchnorm", action="store_true", default=True)
    p.add_argument("--no_batchnorm", dest="batchnorm",
                   action="store_false")
    p.add_argument("--vid_len", type=int, nargs="+", default=[8, 32])
    p.add_argument("--resnet3d_layers", type=int, nargs=4,
                   default=[3, 4, 6, 3])
    p.add_argument("--resnet3d_base_width", type=int, default=64)
    p.add_argument("--test_cp", type=str, default="")
    p.add_argument("--ske_cp", type=str, default="")
    p.add_argument("--rgb_cp", type=str, default="")
    p.add_argument("--converted_init", type=str, default="",
                   help="also check a tools/convert_torchvision.py "
                        "resnet50_inflate output at this path")
    return p.parse_args(argv)


def main(argv=None):
    args = _parse(sys.argv[1:] if argv is None else argv)
    if args.synthetic:
        root = args.synthetic
        args, cdir = build_synthetic(root)
        args.datadir, args.checkpointdir = root, cdir
        args.vid_dim = 256               # fixture dir name uses 256x256_30
    if not args.datadir or not args.checkpointdir:
        print("pass --datadir and --checkpointdir (or --synthetic DIR); "
              "see --help")
        return 2
    ok, _ = check_dataset(args.datadir, args.vid_dim, args.vid_fr)
    ok &= check_checkpoints(args.checkpointdir, args)
    if args.converted_init:
        ok &= check_converter(args.converted_init)
    if ok:
        print("[READY] all preconditions pass — run:")
        emit_commands(args)
        return 0
    print("[NOT READY] fix the [FAIL]/[missing] items above; commands "
          "that will work once they pass:")
    emit_commands(args)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
