"""AV-MNIST searchable fusion net and its search space.

Behavioral spec from reference models/search/avmnist_searchable.py:
  * Searchable_Audio_Image_Net (:184-297): GP_LeNet image backbone (3 taps,
    sizes [ch, 2ch, 4ch]) + GP_LeNet_Deeper audio backbone (5 taps, sizes
    [ch, 2ch, 4ch, 8ch, 16ch]) (:291-297); taps are already globally
    pooled by the backbones; fusion layers have NO BatchNorm option
    (:276-285).
  * search space: 5*3*2 = 30 one-row unfoldings (:111-125).
"""

from __future__ import annotations

import numpy as np

from mfas_tpu.core import layers as L
from mfas_tpu.core.module import Module
from mfas_tpu.fusion.layers import (build_alphas, build_fusion_layers,
                                    enumerate_layer_confs, progressive_fuse)
from mfas_tpu.models.avmnist import GP_LeNet, GP_LeNet_Deeper


def tap_sizes(args):
    ch = int(args.channels)
    sizes_ims = [ch, 2 * ch, 4 * ch]
    sizes_aud = [ch, 2 * ch, 4 * ch, 8 * ch, 16 * ch]
    return sizes_aud, sizes_ims


class Searchable_Audio_Image_Net(Module):
    def __init__(self, args, conf):
        super().__init__()
        self.conf = np.asarray(conf)
        self.args = args

        self.rgbnet = GP_LeNet(args, 1)
        self.audnet = GP_LeNet_Deeper(args, 1)

        sizes_aud, sizes_ims = tap_sizes(args)
        self.alphas = build_alphas(self.conf, sizes_aud, sizes_ims)
        self.fusion_layers = build_fusion_layers(
            self.conf, sizes_aud, sizes_ims, args.inner_representation_size,
            args.drpt, batchnorm=False)
        self.central_classifier = L.Linear(args.inner_representation_size,
                                           args.num_outputs)

    def central_params(self):
        # alphas only when used: the reference passes them to Adam always,
        # but torch skips grad-None params, so with args.alphas=False they
        # never update (tests/test_train_step_oracle.py pins this)
        prefixes = ["fusion_layers", "central_classifier"]
        if self.args.alphas:
            prefixes.insert(0, "alphas")
        return prefixes

    def apply(self, tree, ctx, tensor_tuple):
        image, sound = tensor_tuple[0], tensor_tuple[1]
        s = self.sub

        img = self.rgbnet(s(tree, "rgbnet"), ctx, image)
        visual_logits, visual_taps = img[0], img[1:]

        aud = self.audnet(s(tree, "audnet"), ctx, sound)
        audio_logits, audio_taps = aud[0], aud[1:]

        feats_v = [visual_taps[int(r[1])] for r in self.conf]
        feats_a = [audio_taps[int(r[0])] for r in self.conf]

        out = progressive_fuse(self, tree, ctx, feats_a, feats_v)
        if not self.args.multitask:
            return out
        return out, visual_logits, audio_logits


def get_possible_layer_configurations(progression_index=None):
    """30 rows: audio in [0,5), image in [0,3), act in [0,2) (:111-125)."""
    return enumerate_layer_confs(5, 3, 2)


class AVMnistFeatureExtractor(Module):
    """Frozen-backbone tap extractor for the population trainer: returns
    (audio taps, image taps, image logits, audio logits), all pooled."""

    def __init__(self, args):
        super().__init__()
        self.rgbnet = GP_LeNet(args, 1)
        self.audnet = GP_LeNet_Deeper(args, 1)

    def apply(self, tree, ctx, inputs):
        image, sound = inputs
        img = self.rgbnet(self.sub(tree, "rgbnet"), ctx, image)
        aud = self.audnet(self.sub(tree, "audnet"), ctx, sound)
        return list(aud[1:]), list(img[1:]), img[0], aud[0]
