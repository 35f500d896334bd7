"""NTU searchable fusion net and its search space.

Behavioral spec from reference models/search/ntu_searchable.py:
  * Searchable_Skeleton_Image_Net (:178-301): frozen Visual + Skeleton
    backbones expose taps; ske taps = last 4 hidden maps with channel sizes
    [128, 256, vid_len[1]*32, 512]; rgb taps = [fm2, fm3, fm4, pooled] with
    sizes [512, 1024, 2048, 2048] (:288-296); GlobalPooling2D per tap,
    optional alpha gates, progressive Linear fusion chain, final classifier.
  * multitask forward returns (fused_logits, visual_logits, skel_logits)
    (:244-247).
  * central_params isolates the fusion-head parameters (:249-256).
  * search space: 4*4*2 = 32 one-row unfoldings (:105-119). The generator
    emits activations {0,1} only, although the net itself supports 2
    (LeakyReLU) — a reference quirk preserved deliberately.
"""

from __future__ import annotations

import numpy as np

from mfas_tpu.core import functional as F
from mfas_tpu.core import layers as L
from mfas_tpu.core.module import Module
from mfas_tpu.fusion.layers import (build_alphas, build_fusion_layers,
                                    enumerate_layer_confs, progressive_fuse)
from mfas_tpu.models.ntu import Skeleton, Visual


def tap_sizes(args):
    """Reference :288-296 — rgb sizes [512,1024,2048,2048] are the
    ResNet-50 stage widths (base_width 64 x [8,16,32,32]); they scale with
    the optional resnet3d_base_width shrink knob (models/ntu.py Visual)."""
    w = int(getattr(args, "resnet3d_base_width", 64))
    # ske tap 2 is the flattened out7 map, really 256*max((wl//16)**2, 1)
    # wide; the reference's vid_len[1]*32 formula (:295) matches it only
    # for window lengths 8 and 32 — its only used configs. Other windows
    # would missize the fusion Linear and crash at trace time deep inside
    # the net, so reject them here with the real arithmetic spelled out.
    wl = int(args.vid_len[1])
    true_w = 256 * max((wl // 16) ** 2, 1)
    if wl * 32 != true_w:
        raise ValueError(
            f"vid_len[1]={wl}: the reference's skeleton tap-size formula "
            f"vid_len[1]*32={wl * 32} disagrees with the real flattened "
            f"tap width 256*max((vid_len[1]//16)**2,1)={true_w}; only "
            "window lengths 8 and 32 are supported (reference "
            "ntu_searchable.py:288-296 has the same latent mismatch)")
    sizes_ske = [128, 256, wl * 32, 512]
    sizes_ims = [w * 8, w * 16, w * 32, w * 32]
    return sizes_ske, sizes_ims


class Searchable_Skeleton_Image_Net(Module):
    def __init__(self, args, conf):
        super().__init__()
        self.conf = np.asarray(conf)
        self.args = args

        self.rgbnet = Visual(args)
        self.skenet = Skeleton(args)

        sizes_ske, sizes_ims = tap_sizes(args)
        self.alphas = build_alphas(self.conf, sizes_ske, sizes_ims)
        self.fusion_layers = build_fusion_layers(
            self.conf, sizes_ske, sizes_ims, args.inner_representation_size,
            args.drpt, args.batchnorm)
        self.central_classifier = L.Linear(args.inner_representation_size,
                                           args.num_outputs)

    def central_params(self):
        """Trainable-prefix list for frozen-backbone training (:249-256).
        The reference hands alphas to Adam unconditionally, but with
        args.alphas=False they never enter the autograd graph and torch
        skips grad-None params at step time — so the effective trainable
        set excludes them (pinned by tests/test_train_step_oracle.py)."""
        prefixes = ["fusion_layers", "central_classifier"]
        if self.args.alphas:
            prefixes.insert(0, "alphas")
        return prefixes

    def apply(self, tree, ctx, tensor_tuple):
        image, skeleton = tensor_tuple[0], tensor_tuple[1]
        s = self.sub

        vis = self.rgbnet(s(tree, "rgbnet"), ctx, image)
        visual_logits = vis[-1]
        visual_taps = vis[1:5]  # fm2, fm3, fm4, pooled

        ske_hidden, skel_logits = self.skenet(s(tree, "skenet"), ctx, skeleton)
        ske_taps = ske_hidden[-4:]

        feats_v = [F.global_avg_pool2d(visual_taps[int(r[1])]) for r in self.conf]
        feats_s = [F.global_avg_pool2d(ske_taps[int(r[0])]) for r in self.conf]

        out = progressive_fuse(self, tree, ctx, feats_s, feats_v)
        if not self.args.multitask:
            return out
        return out, visual_logits, skel_logits


def get_possible_layer_configurations(progression_index=None):
    """32 rows: ske in [0,4), rgb in [0,4), act in [0,2) (:105-119)."""
    return enumerate_layer_confs(4, 4, 2)


class NTUFeatureExtractor(Module):
    """Frozen-backbone tap extractor for the population trainer: returns
    (ske taps, rgb taps, rgb logits, ske logits) with GlobalPooling2D
    applied — the expensive Visual/Skeleton forward runs ONCE per batch for
    the whole candidate population."""

    def __init__(self, args):
        super().__init__()
        self.rgbnet = Visual(args)
        self.skenet = Skeleton(args)

    def apply(self, tree, ctx, inputs):
        image, skeleton = inputs
        vis = self.rgbnet(self.sub(tree, "rgbnet"), ctx, image)
        ske_hidden, skel_logits = self.skenet(self.sub(tree, "skenet"), ctx, skeleton)
        taps_v = [F.global_avg_pool2d(t) for t in vis[1:5]]
        taps_s = [F.global_avg_pool2d(t) for t in ske_hidden[-4:]]
        return taps_s, taps_v, vis[-1], skel_logits
