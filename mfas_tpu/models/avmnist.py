"""AV-MNIST backbones and hand-built fusion baselines.

Behavioral spec from reference models/central/avmnist.py:
  * GP_LeNet (:18-57): 3 stages of conv(5/3/3)+BN+ReLU with maxpool between,
    GlobalPooling2D taps; note gp1 taps the *pre-pool* stage-1 activation.
  * GP_LeNet_Deeper (:60-116): 5 stages; note gp1 taps the *post-pool*
    stage-1 activation (gp2..gp5 pre-pool) — a reference quirk we keep.
  * SimpleAVNet / SimpleAVNet_Deeper (:119-154): late fusion baselines.
  * SimpleAV_CentralNet (:157-279): alpha-weighted central column with
    Conv1d central ops over fused 1-D features.

All convs/linears use kaiming_uniform(a=0) init (:38-40, :89-91).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mfas_tpu.core import functional as F
from mfas_tpu.core import init as I
from mfas_tpu.core import layers as L
from mfas_tpu.core.module import Module, Sequential

_KU = I.kaiming_uniform(0.0)


def _stage(in_ch, out_ch, k):
    conv = L.Conv2d(in_ch, out_ch, kernel_size=k, padding=k // 2, bias=False,
                    weight_init=_KU)
    bn = L.BatchNorm2d(out_ch)
    return conv, bn


class GP_LeNet(Module):
    """Returns (logits, gp1, gp2, gp3)."""

    def __init__(self, args, in_channels):
        super().__init__()
        ch = int(args.channels)
        self.conv1, self.bn1 = _stage(in_channels, ch, 5)
        self.gp1 = L.GlobalPooling2D()
        self.conv2, self.bn2 = _stage(ch, 2 * ch, 3)
        self.gp2 = L.GlobalPooling2D()
        self.conv3, self.bn3 = _stage(2 * ch, 4 * ch, 3)
        self.gp3 = L.GlobalPooling2D()
        self.classifier = Sequential(
            L.Linear(4 * ch, args.num_outputs, weight_init=_KU))

    def apply(self, tree, ctx, x):
        s = self.sub
        out1 = jax.nn.relu(self.bn1(s(tree, "bn1"), ctx, self.conv1(s(tree, "conv1"), ctx, x)))
        out = F.max_pool2d(out1, 2)
        gp1 = F.global_avg_pool2d(out1)

        out2 = jax.nn.relu(self.bn2(s(tree, "bn2"), ctx, self.conv2(s(tree, "conv2"), ctx, out)))
        out = F.max_pool2d(out2, 2)
        gp2 = F.global_avg_pool2d(out2)

        out3 = jax.nn.relu(self.bn3(s(tree, "bn3"), ctx, self.conv3(s(tree, "conv3"), ctx, out)))
        out = F.max_pool2d(out3, 2)
        gp3 = F.global_avg_pool2d(out3)

        logits = self.classifier(s(tree, "classifier"), ctx, gp3)
        return logits, gp1, gp2, gp3


class GP_LeNet_Deeper(Module):
    """Returns (logits, gp1, gp2, gp3, gp4, gp5)."""

    def __init__(self, args, in_channels):
        super().__init__()
        ch = int(args.channels)
        widths = [ch, 2 * ch, 4 * ch, 8 * ch, 16 * ch]
        prev = in_channels
        for i, w in enumerate(widths, start=1):
            conv, bn = _stage(prev, w, 5 if i == 1 else 3)
            setattr(self, f"conv{i}", conv)
            setattr(self, f"bn{i}", bn)
            setattr(self, f"gp{i}", L.GlobalPooling2D())
            prev = w
        self.classifier = Sequential(
            L.Linear(16 * ch, args.num_outputs, weight_init=_KU))

    def apply(self, tree, ctx, x):
        s = self.sub
        gps = []
        out = x
        for i in range(1, 6):
            conv = getattr(self, f"conv{i}")
            bn = getattr(self, f"bn{i}")
            acti = jax.nn.relu(bn(s(tree, f"bn{i}"), ctx, conv(s(tree, f"conv{i}"), ctx, out)))
            out = F.max_pool2d(acti, 2)
            # reference quirk: stage 1 taps post-pool, stages 2-5 pre-pool
            gps.append(F.global_avg_pool2d(out if i == 1 else acti))
        logits = self.classifier(s(tree, "classifier"), ctx, gps[-1])
        return (logits, *gps)


class SimpleAVNet(Module):
    """Late fusion of two GP_LeNets on the deepest taps (:119-135)."""

    def __init__(self, args, audio_channels, image_channels):
        super().__init__()
        self.audio_net = GP_LeNet(args, audio_channels)
        self.image_net = GP_LeNet(args, image_channels)
        self.classifier = L.Linear(int(2 * 4 * args.channels), args.num_outputs)

    def apply(self, tree, ctx, audio, image):
        _, _, _, a3 = self.audio_net(self.sub(tree, "audio_net"), ctx, audio)
        _, _, _, i3 = self.image_net(self.sub(tree, "image_net"), ctx, image)
        return self.classifier(self.sub(tree, "classifier"), ctx,
                               jnp.concatenate([a3, i3], axis=1))


class SimpleAVNet_Deeper(Module):
    """(:138-154)."""

    def __init__(self, args, audio_channels, image_channels):
        super().__init__()
        self.audio_net = GP_LeNet_Deeper(args, audio_channels)
        self.image_net = GP_LeNet(args, image_channels)
        self.classifier = L.Linear(int(20 * args.channels), args.num_outputs)

    def apply(self, tree, ctx, audio, image):
        aud = self.audio_net(self.sub(tree, "audio_net"), ctx, audio)
        img = self.image_net(self.sub(tree, "image_net"), ctx, image)
        return self.classifier(self.sub(tree, "classifier"), ctx,
                               jnp.concatenate([aud[5], img[3]], axis=1))


def _lateral_pad(x, pad):
    if pad <= 0:
        return x
    return jnp.concatenate([x, jnp.zeros((x.shape[0], pad), x.dtype)], axis=1)


def fuse_features(f1, f2, a1, a2, fusetype):
    """cat with zero lateral padding, or alpha-weighted sum (:247-270)."""
    dif = f1.shape[1] - f2.shape[1]
    if fusetype == "cat":
        if dif > 0:
            return jnp.concatenate([f1, _lateral_pad(f2, dif)], axis=1)
        if dif < 0:
            return jnp.concatenate([_lateral_pad(f1, -dif), f2], axis=1)
        return jnp.concatenate([f1, f2], axis=1)
    # wsum — note the reference uses a1 for both sides in the equal-size case
    if dif > 0:
        return f1 * a1 + _lateral_pad(f2, dif) * a2
    if dif < 0:
        return _lateral_pad(f1, -dif) * a1 + f2 * a2
    return f1 * a1 + f2 * a1


class SimpleAV_CentralNet(Module):
    """CentralNet baseline (:157-279): 3 fusion points chosen by
    args.fusingmix, Conv1d central column with alpha-weighted sums."""

    def __init__(self, args, audio_channels, image_channels):
        super().__init__()
        self.args = args
        self.audio_net = GP_LeNet_Deeper(args, audio_channels)
        self.image_net = GP_LeNet(args, image_channels)

        rand = I.uniform(0.0, 1.0)  # torch.rand init (:165-174)
        for name in ("alpha1_feat1", "alpha2_feat1", "alpha3_feat1",
                     "alpha1_feat2", "alpha2_feat2", "alpha3_feat2",
                     "alpha_conv1", "alpha_conv2"):
            self.declare_param(name, (1,), rand)

        self.central_conv1 = L.Conv1d(1, 1, kernel_size=3, padding=1, bias=False)
        self.central_conv2 = L.Conv1d(1, 1, kernel_size=3, padding=1, bias=False)
        self.central_conv3 = L.Conv1d(1, 1, kernel_size=3, padding=1, bias=False)

        if args.fusingmix in ("11,32,53", "31,42,53"):
            nodes = 384
        elif args.fusingmix == "11,22,33":
            nodes = 96
        else:
            raise ValueError(f"fusingmix {args.fusingmix} not implemented")
        if args.fusetype == "cat":
            nodes *= 2
        self.central_classifier = L.Linear(nodes, args.num_outputs)

    def central_params(self):
        """Dotted prefixes of the central (fusion) parameters."""
        return ["central_conv1", "central_conv2", "central_conv3",
                "alpha1_feat1", "alpha2_feat1", "alpha3_feat1",
                "alpha1_feat2", "alpha2_feat2", "alpha3_feat2",
                "alpha_conv1", "alpha_conv2", "central_classifier"]

    def apply(self, tree, ctx, audio, image):
        s = self.sub
        aud = self.audio_net(s(tree, "audio_net"), ctx, audio)
        img = self.image_net(s(tree, "image_net"), ctx, image)
        audio_out, a = aud[0], aud[1:]
        image_out, v = img[0], img[1:]

        pick = {"11,32,53": ((a[0], v[0]), (a[2], v[1]), (a[4], v[2])),
                "11,22,33": ((a[0], v[0]), (a[1], v[1]), (a[2], v[2])),
                "31,42,53": ((a[2], v[0]), (a[3], v[1]), (a[4], v[2]))}[self.args.fusingmix]

        def alpha(name):
            return tree[name]

        ft = self.args.fusetype
        fuse1 = fuse_features(*pick[0], alpha("alpha1_feat1"), alpha("alpha1_feat2"), ft)
        fuse2 = fuse_features(*pick[1], alpha("alpha2_feat1"), alpha("alpha2_feat2"), ft)
        fuse3 = fuse_features(*pick[2], alpha("alpha3_feat1"), alpha("alpha3_feat2"), ft)

        one = jnp.ones((1,))
        cc1 = jax.nn.relu(self.central_conv1(s(tree, "central_conv1"), ctx, fuse1[:, None, :]))
        cc1 = fuse_features(cc1[:, 0, :], fuse2, alpha("alpha_conv1"), one, "wsum")
        cc2 = jax.nn.relu(self.central_conv2(s(tree, "central_conv2"), ctx, cc1[:, None, :]))
        cc2 = fuse_features(cc2[:, 0, :], fuse3, alpha("alpha_conv2"), one, "wsum")
        cc3 = jax.nn.relu(self.central_conv3(s(tree, "central_conv3"), ctx, cc2[:, None, :]))

        fusion_out = self.central_classifier(s(tree, "central_classifier"), ctx, cc3[:, 0, :])
        return audio_out, image_out, fusion_out
