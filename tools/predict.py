"""Offline batch inference: drive an exported StableHLO artifact
(tools/export_model.py) over a dataset split and write predictions.

Completes the export -> serve loop: the serving host needs only jax (any
backend — the artifact is multi-platform) plus this repo's data readers.

    # NTU test split through an exported conf-4 net
    python tools/predict.py ntu --artifact ntu_conf4.stablehlo \
        --datadir data/NTU --batchsize 8 --out preds.npy

    # AV-MNIST
    python tools/predict.py avmnist --artifact av.stablehlo \
        --datadir data/avmnist --out preds.npy

Prints the split metric when labels are present (top-1 accuracy; MM-IMDB:
samples-F1 at sigmoid>0.3, the reference's protocol —
train_searchable/mmimdb.py:84-101) and saves the raw fused logits
(padding rows of the final ragged batch dropped) as an .npy.

The artifact's batch dimension must match --batchsize unless it was
exported with --polymorphic_batch (then any batch size serves).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (input batch keys in artifact call order, label key)
_INPUT_KEYS = {
    "ntu": ("rgb", "ske"),
    "avmnist": ("image", "audio"),
    "mmimdb": ("text", "image"),
    "cifar": ("image",),
}


def _ntu_loader(args):
    from mfas_tpu.data import ntu as d
    from mfas_tpu.data.loader import MapLoader

    tfm_val = d.Compose([d.NormalizeLen(tuple(args.vid_len))])
    if args.packed_datadir:
        from mfas_tpu.data.ntu_pack import PackedNTU
        ds = PackedNTU(os.path.join(args.packed_datadir, args.split),
                       transform=tfm_val, args=args)
    else:
        ds = d.NTU(args.datadir, transform=tfm_val, stage=args.split,
                   vid_dim=args.vid_dim, vid_fr=args.vid_fr, args=args)
    return MapLoader(ds, args.batchsize, num_workers=args.num_workers)


def _avmnist_loader(args):
    from mfas_tpu.data.avmnist import load_avmnist_arrays
    from mfas_tpu.data.loader import ArrayLoader

    stage = "test" if args.split == "test" else "train"
    return ArrayLoader(load_avmnist_arrays(args.datadir, stage),
                       args.batchsize)


def _mmimdb_loader(args):
    from mfas_tpu.data.mm_imdb import MM_IMDB, MMIMDBLoader

    ds = MM_IMDB(args.datadir, stage=args.split, feat_dim=args.feat_dim,
                 average_text=True, len_data=args.len_data)
    return MMIMDBLoader(ds, args.batchsize)


def _cifar_loader(args):
    from mfas_tpu.data.cifar import CifarLoader, load_cifar10_arrays

    arrays = load_cifar10_arrays(args.datadir, train=args.split != "test")
    return CifarLoader(arrays, args.batchsize, train=False)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("vertical", choices=("ntu", "avmnist", "mmimdb", "cifar"))
    p.add_argument("--artifact", type=str, required=True,
                   help="serialized StableHLO from tools/export_model.py")
    p.add_argument("--out", type=str, default="",
                   help="write the fused logits here (.npy)")
    p.add_argument("--split", type=str, default="test")
    p.add_argument("--batchsize", type=int, default=8)
    p.add_argument("--datadir", type=str, default="")
    p.add_argument("--packed_datadir", type=str, default="",
                   help="ntu: packed store (tools/pack_ntu) instead of AVIs")
    p.add_argument("--vid_len", type=int, nargs="+", default=[8, 32])
    p.add_argument("--vid_dim", type=int, default=256)
    p.add_argument("--vid_fr", type=int, default=30,
                   help="ntu: frame rate of the AVI directory "
                        "(avi_{dim}x{dim}_{fr}); matches main_found_ntu's "
                        "--vid_fr so non-default-rate datasets evaluate")
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--feat_dim", type=int, default=300)
    p.add_argument("--len_data", type=int, default=None,
                   help="mmimdb: override the split's sample count "
                        "(default: the reference split sizes)")
    p.add_argument("--modality", type=str, default="both")
    p.add_argument("--no_norm", action="store_true", default=False)
    p.add_argument("--no_bad_skel", action="store_true", default=False)
    args = p.parse_args(argv)
    args.vid_len = tuple(args.vid_len)

    from mfas_tpu.runtime.compile_cache import \
        enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    from mfas_tpu.runtime.export import load_exported
    exp = load_exported(args.artifact)

    loader = {"ntu": _ntu_loader, "avmnist": _avmnist_loader,
              "mmimdb": _mmimdb_loader, "cifar": _cifar_loader}[
        args.vertical](args)
    keys = _INPUT_KEYS[args.vertical]

    logits_parts, labels_parts = [], []
    n = 0
    for batch in loader:
        inputs = tuple(np.asarray(batch[k], np.float32) for k in keys)
        out = np.asarray(exp.call(*inputs))
        keep = np.asarray(batch["_mask"]) > 0
        logits_parts.append(out[keep])
        if "label" in batch:
            labels_parts.append(np.asarray(batch["label"])[keep])
        n += int(keep.sum())
    logits = np.concatenate(logits_parts, axis=0)

    if labels_parts:
        labels = np.concatenate(labels_parts, axis=0)
        if args.vertical == "mmimdb":
            from mfas_tpu.data.mm_imdb import samples_f1
            pred = (1.0 / (1.0 + np.exp(-logits)) > 0.3).astype(np.float32)
            print(f"samples-F1: {samples_f1(labels, pred):.6f}  ({n} samples)")
        else:
            acc = float((logits.argmax(axis=1) == labels).mean())
            print(f"top-1 accuracy: {acc:.6f}  ({n} samples)")

    if args.out:
        np.save(args.out, logits)
        print(f"wrote {logits.shape} logits -> {args.out}")


if __name__ == "__main__":
    # benign-noise fd-2 filter for interactive runs (one shared policy —
    # proof of benignity in mfas_tpu/runtime/logfilter.py)
    from mfas_tpu.runtime.logfilter import run_filtered
    run_filtered(main)
