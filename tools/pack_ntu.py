#!/usr/bin/env python3
"""One-time NTU packing CLI: decode every AVI once into the memmap store
consumed by --packed_datadir (mfas_tpu.data.ntu_pack; see SURVEY §7.3.5 —
the reference re-decodes every video every epoch).

  python tools/pack_ntu.py --datadir .../NTU --out .../NTU_packed \
      --stages train dev test trainexp
"""

import argparse
import types


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--datadir", required=True,
                        help="raw NTU root (nturgbd_rgb/, nturgbd_skeletons/)")
    parser.add_argument("--out", required=True, help="output root")
    parser.add_argument("--stages", nargs="+",
                        default=["train", "dev", "test"],
                        choices=["train", "trainexp", "dev", "test"])
    parser.add_argument("--frames", type=int, default=24,
                        help="decoded frames per clip (reference load_video default)")
    parser.add_argument("--max_skel_frames", type=int, default=300)
    parser.add_argument("--vid_dim", type=int, default=256)
    parser.add_argument("--vid_fr", type=int, default=30)
    parser.add_argument("--no_bad_skel", action="store_true", default=False)
    args = parser.parse_args()

    import os
    from mfas_tpu.data.ntu_pack import pack_ntu

    ds_args = types.SimpleNamespace(modality="both", no_norm=False,
                                    no_bad_skel=args.no_bad_skel)
    for stage in args.stages:
        out = os.path.join(args.out, stage)
        print(f"packing stage {stage} -> {out}")
        n = pack_ntu(args.datadir, out, stage, args=ds_args,
                     frames=args.frames,
                     max_skel_frames=args.max_skel_frames,
                     vid_dim=args.vid_dim, vid_fr=args.vid_fr)
        print(f"  {n} samples")


if __name__ == "__main__":
    main()
