#!/usr/bin/env python3
"""Offline pretrained-weight converters (SURVEY.md §2.1: torchvision model
zoo -> framework arrays).

The reference downloads torchvision weights at model-construction time
(models/auxiliary/imagenet_pretraining.py:63-67, models/central/mm_imdb.py:24).
Zero-egress TPU environments can't; instead run this once wherever the
torchvision checkpoint files already exist:

  # 2D ResNet-50 -> center-inflated 3D video backbone
  python tools/convert_torchvision.py resnet50_inflate \
      --src resnet50-19c8e357.pth --dst rgb_backbone_init.checkpoint

  # VGG-19 features -> GP_VGG trunk keys
  python tools/convert_torchvision.py vgg19_trunk \
      --src vgg19-dcbb9e9d.pth --dst vgg19_trunk.checkpoint

Both read/write torch checkpoint format via mfas_tpu.runtime.checkpoint
(no torch needed).
"""

import argparse
import sys

import numpy as np


def resnet50_inflate(src, dst, inflation="center"):
    from mfas_tpu.core.module import flatten_tree
    from mfas_tpu.models.inflate import inflate_resnet_state
    from mfas_tpu.models.resnet3d import inflated_resnet50
    from mfas_tpu.runtime import checkpoint as ckpt

    flat2d = ckpt.load_state_dict(src)
    template = {k: np.asarray(v) for k, v in
                flatten_tree(inflated_resnet50().init(0)).items()}
    inflated = inflate_resnet_state(flat2d, template, inflation=inflation,
                                    verbose=True)
    ckpt.save(inflated, dst)
    print(f"wrote {len(inflated)} tensors to {dst}")


def vgg19_trunk(src, dst):
    from mfas_tpu.models.vgg import remap_torchvision_vgg_keys
    from mfas_tpu.runtime import checkpoint as ckpt

    flat = ckpt.load_state_dict(src)
    remapped = remap_torchvision_vgg_keys(flat, prefix="vgg")
    if not remapped:
        sys.exit("no features.* keys found — is this a torchvision VGG?")
    ckpt.save(remapped, dst)
    print(f"wrote {len(remapped)} tensors to {dst}")


def main():
    # same init hook as every CLI: honor JAX_PLATFORMS against the TPU
    # sitecustomize's programmatic forcing (a converter should run on the
    # host CPU) and fail fast on a dead tunnel instead of hanging
    from mfas_tpu.runtime.compile_cache import \
        enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("mode", choices=["resnet50_inflate", "vgg19_trunk"])
    parser.add_argument("--src", required=True)
    parser.add_argument("--dst", required=True)
    parser.add_argument("--inflation", default="center",
                        choices=["center", "mean"])
    args = parser.parse_args()
    if args.mode == "resnet50_inflate":
        resnet50_inflate(args.src, args.dst, args.inflation)
    else:
        vgg19_trunk(args.src, args.dst)


if __name__ == "__main__":
    main()
