"""VGG-19 feature trunk (for the MM-IMDB image backbone).

Architecture = torchvision vgg19.features (configuration E): conv3x3 blocks
[64,64, M, 128,128, M, 256x4, M, 512x4, M, 512x4, M], ReLU after every
conv. Module indices match torchvision so pretrained weights map 1:1
(reference models/central/mm_imdb.py:24 uses tmodels.vgg19(pretrained);
we load the same weights offline via mfas_tpu.runtime.checkpoint with the
'features.' prefix renamed).
"""

from __future__ import annotations

from mfas_tpu.core import layers as L
from mfas_tpu.core.module import Module, ModuleList

VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
             512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]


def vgg19_features():
    """ModuleList mirroring torchvision vgg19.features module indices."""
    mods = []
    in_ch = 3
    for v in VGG19_CFG:
        if v == "M":
            mods.append(L.MaxPool2d(2, stride=2))
        else:
            mods.append(L.Conv2d(in_ch, v, kernel_size=3, padding=1))
            mods.append(L.ReLU())
            in_ch = v
    return ModuleList(mods)


def remap_torchvision_vgg_keys(flat: dict, prefix: str = "vgg") -> dict:
    """torchvision 'features.N.weight' -> '{prefix}.N.weight'; classifier
    weights are dropped (the reference only uses the feature trunk)."""
    out = {}
    for k, v in flat.items():
        if k.startswith("features."):
            out[f"{prefix}." + k[len("features."):]] = v
    return out
