"""Inflated 3D ResNet-50 (RGB video backbone).

Behavioral spec from reference models/auxiliary/resnet/{resnet.py,bottleneck.py}
and inflated_resnet.py:
  * 2D 7x7/s2 stem + 3x3/s2 maxpool applied frame-wise (resnet.py:40-48,
    :73-85 via the 5D<->4D transform at :109-122);
  * four Bottleneck3D stages [3,4,6,3] with 1x1x1 / 3x3x3 / 1x1x1 convs and
    spatial-only strides (1,s,s) (bottleneck.py:4-42, resnet.py:50-71);
  * conv init N(0, sqrt(2/n)), n = k0*k1*out_channels; BN gamma=1 beta=0
    (resnet.py:32-38);
  * ``get_feature_maps`` returns the four stage outputs (resnet.py:73-106).

TPU notes: the frame-wise stem is a reshape + conv2d (batched over B*T —
large MXU batches); stages are direct XLA conv3ds over static NCDHW shapes.
ImageNet initialization is done offline via mfas_tpu.models.inflate (the
reference downloads torchvision weights at construction time — we never touch
the network; pass ``pretrained_2d`` explicitly or load a full checkpoint).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mfas_tpu.core import functional as F
from mfas_tpu.core import init as I
from mfas_tpu.core.layers import BatchNorm2d, BatchNorm3d, Conv2d, Conv3d
from mfas_tpu.core.module import Module, Sequential


class Bottleneck3D(Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None, dilation=1):
        super().__init__()
        self.conv1 = Conv3d(inplanes, planes, kernel_size=1, bias=False,
                            weight_init=I.resnet_conv_weight)
        self.bn1 = BatchNorm3d(planes)
        self.conv2 = Conv3d(planes, planes, kernel_size=3, stride=stride,
                            padding=1, bias=False, dilation=(1, dilation, dilation),
                            weight_init=I.resnet_conv_weight)
        self.bn2 = BatchNorm3d(planes)
        self.conv3 = Conv3d(planes, planes * 4, kernel_size=1, bias=False,
                            weight_init=I.resnet_conv_weight)
        self.bn3 = BatchNorm3d(planes * 4)
        if downsample is not None:
            self.downsample = downsample
        self._has_downsample = downsample is not None

    def apply(self, tree, ctx, x):
        s = self.sub
        out = jax.nn.relu(self.bn1(s(tree, "bn1"), ctx, self.conv1(s(tree, "conv1"), ctx, x)))
        out = jax.nn.relu(self.bn2(s(tree, "bn2"), ctx, self.conv2(s(tree, "conv2"), ctx, out)))
        out = self.bn3(s(tree, "bn3"), ctx, self.conv3(s(tree, "conv3"), ctx, out))
        residual = x
        if self._has_downsample:
            residual = self.downsample(s(tree, "downsample"), ctx, x)
        return jax.nn.relu(out + residual)


class ResNet3D(Module):
    """Inflated ResNet with a 2D stem. ``get_feature_maps`` equivalent is
    ``apply(..., taps=True)``.

    ``layers``/``base_width`` parameterize depth and width; the defaults
    are the reference's ResNet-50 ([3,4,6,3], 64). Shrunken variants (e.g.
    (1,1,1,1) @ base_width 16) keep the exact architecture — framewise 2D
    stem, Bottleneck3D stages, (1,s,s) strides — at a footprint that fits
    the virtual-CPU-mesh dryrun (SURVEY §4.5)."""

    def __init__(self, layers=(3, 4, 6, 3), base_width=64):
        super().__init__()
        self.inplanes = base_width
        self.conv1 = Conv2d(3, base_width, kernel_size=7, stride=2, padding=3,
                            bias=False, weight_init=I.resnet_conv_weight)
        self.bn1 = BatchNorm2d(base_width)
        channels = [base_width, base_width * 2, base_width * 4, base_width * 8]
        self.layer1 = self._make_layer(channels[0], layers[0])
        self.layer2 = self._make_layer(channels[1], layers[1], stride=2)
        self.layer3 = self._make_layer(channels[2], layers[2], stride=2)
        self.layer4 = self._make_layer(channels[3], layers[3], stride=2)

    def _make_layer(self, planes, blocks, stride=1):
        downsample = None
        st = (1, stride, stride)
        if stride != 1 or self.inplanes != planes * Bottleneck3D.expansion:
            downsample = Sequential(
                Conv3d(self.inplanes, planes * Bottleneck3D.expansion,
                       kernel_size=1, stride=st, bias=False,
                       weight_init=I.resnet_conv_weight),
                BatchNorm3d(planes * Bottleneck3D.expansion),
            )
        mods = [Bottleneck3D(self.inplanes, planes, st, downsample)]
        self.inplanes = planes * Bottleneck3D.expansion
        for _ in range(1, blocks):
            mods.append(Bottleneck3D(self.inplanes, planes))
        return Sequential(*mods)

    def apply(self, tree, ctx, x):
        """x: (B, C, T, W, H) -> (fm1, fm2, fm3, fm4), all 5D."""
        s = self.sub
        B, C, T, W, H = x.shape

        # frame-wise 2D stem: (B,C,T,W,H) -> (B*T,C,W,H)
        frames = jnp.transpose(x, (0, 2, 1, 3, 4)).reshape(B * T, C, W, H)
        out = self.conv1(s(tree, "conv1"), ctx, frames)
        out = self.bn1(s(tree, "bn1"), ctx, out)
        # reference order is relu -> maxpool (resnet.py:44-48); pooling
        # FIRST is bitwise-identical (relu is monotone, so
        # relu(max(x)) == max(relu(x))) and runs the elementwise relu on
        # 1/4 of the activations, after the pool's data reduction
        out = jax.nn.relu(F.max_pool2d(out, 3, stride=2, padding=1))

        # back to 5D for the 3D stages
        _, c, w, h = out.shape
        out = jnp.transpose(out.reshape(B, T, c, w, h), (0, 2, 1, 3, 4))

        fm1 = self.layer1(s(tree, "layer1"), ctx, out)
        fm2 = self.layer2(s(tree, "layer2"), ctx, fm1)
        fm3 = self.layer3(s(tree, "layer3"), ctx, fm2)
        fm4 = self.layer4(s(tree, "layer4"), ctx, fm3)
        return fm1, fm2, fm3, fm4


def inflated_resnet50():
    """ResNet-50 shape ([3,4,6,3]) — reference inflated_resnet.py:6-18,
    minus the implicit weight download (see mfas_tpu.models.inflate)."""
    return ResNet3D((3, 4, 6, 3))
