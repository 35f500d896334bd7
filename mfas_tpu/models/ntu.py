"""NTU RGB+D backbones and hand-built fusion baselines.

Behavioral spec from reference models/central/ntu.py:
  * Visual (:17-50): inflated ResNet-50 over (B,T,W,H,C) video; returns the
    four stage maps, the (T,7,7)-average-pooled 2048-d embedding, and logits.
  * Skeleton (:53-183): HCN two-stream (position + temporal-difference
    motion re-interpolated to T frames) per-person co-occurrence CNN; streams
    concatenated, persons max-merged; returns 8 hidden taps + logits, with
    the reference's NaN assert kept as a debug-mode check.
  * LateFusion (:186-200), GMU (:203-228), CentralNet (:231-297) baselines.
    CentralNet is reimplemented *without* the reference's re-load-checkpoint-
    inside-forward / hardcoded .cuda() defects (SURVEY.md §2 bug list):
    backbones are frozen by excluding them from the trainable predicate.

TPU notes: per-person streams are computed by folding the person axis into
the batch (one conv call over 2N samples instead of a python loop) — the
max-merge afterwards is algebraically identical to the reference's loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mfas_tpu.core import functional as F
from mfas_tpu.core import init as I
from mfas_tpu.core import layers as L
from mfas_tpu.core.module import Module, ModuleList, Sequential
from mfas_tpu.models.resnet3d import inflated_resnet50

_XU = I.xavier_uniform


def _conv(in_ch, out_ch, k, padding=0):
    return L.Conv2d(in_ch, out_ch, kernel_size=k, stride=1, padding=padding,
                    weight_init=_XU, bias_init=I.zeros)


class Visual(Module):
    """Returns (fm1, fm2, fm3, fm4, pooled2048, logits)."""

    def __init__(self, args):
        super().__init__()
        # optional shrink knobs (defaults = the reference's ResNet-50);
        # used by the multichip dryrun/tests to run the REAL extractor
        # architecture at a virtual-CPU-mesh-sized footprint
        layers = tuple(getattr(args, "resnet3d_layers", (3, 4, 6, 3)))
        width = int(getattr(args, "resnet3d_base_width", 64))
        from mfas_tpu.models.resnet3d import ResNet3D
        self.cnn = (inflated_resnet50()
                    if (layers, width) == ((3, 4, 6, 3), 64)
                    else ResNet3D(layers, base_width=width))
        self.vid_len = args.vid_len[0]
        self.D = width * 32
        self.classifier = L.Linear(self.D, args.num_outputs)

    def apply(self, tree, ctx, x):
        # (B, T, W, H, C) -> (B, C, T, W, H)
        x = jnp.transpose(x, (0, 4, 1, 2, 3))
        fm1, fm2, fm3, fm4 = self.cnn(self.sub(tree, "cnn"), ctx, x)
        # temporal pooling: AvgPool3d((T,7,7)) == global mean over (T,W,H)
        pooled = jnp.mean(fm4, axis=(2, 3, 4))
        logits = self.classifier(self.sub(tree, "classifier"), ctx, pooled)
        return fm1, fm2, fm3, fm4, pooled, logits


def hcn_motion(x):
    """HCN motion branch (reference models/central/ntu.py:131-135):
    temporal difference, bilinearly re-interpolated back to T frames.
    x: (N, C, T, V, M) -> same shape."""
    N, C, T, V, M = x.shape
    motion = x[:, :, 1:] - x[:, :, :-1]                    # (N,C,T-1,V,M)
    motion = jnp.transpose(motion, (0, 1, 4, 2, 3)).reshape(N, C * M, T - 1, V)
    motion = F.interpolate_bilinear(motion, (T, V))
    return jnp.transpose(motion.reshape(N, C, M, T, V), (0, 1, 3, 4, 2))


class Skeleton(Module):
    """HCN co-occurrence net. Returns (hidden_taps[8], logits)."""

    def __init__(self, args):
        super().__init__()
        in_channel, num_joint, out_channel = 3, 25, 64
        self.num_person = 2
        self.window_size = window_size = args.vid_len[1]
        drpt = args.drpt

        # position stream
        self.conv1 = Sequential(_conv(in_channel, out_channel, 1), L.ReLU())
        self.conv2 = _conv(out_channel, window_size, (3, 1), padding=(1, 0))
        self.conv3 = Sequential(_conv(num_joint, out_channel // 2, 3, padding=1),
                                L.MaxPool2d(2))
        self.conv4 = Sequential(_conv(out_channel // 2, out_channel, 3, padding=1),
                                L.Dropout2d(drpt), L.MaxPool2d(2))
        # motion stream
        self.conv1m = Sequential(_conv(in_channel, out_channel, 1), L.ReLU())
        self.conv2m = _conv(out_channel, window_size, (3, 1), padding=(1, 0))
        self.conv3m = Sequential(_conv(num_joint, out_channel // 2, 3, padding=1),
                                 L.MaxPool2d(2))
        self.conv4m = Sequential(_conv(out_channel // 2, out_channel, 3, padding=1),
                                 L.Dropout2d(drpt), L.MaxPool2d(2))
        # merged column
        if window_size == 8:
            self.conv5 = Sequential(_conv(out_channel * 2, out_channel * 2, 3, padding=1),
                                    L.ReLU(), L.Dropout2d(drpt))
        else:
            self.conv5 = Sequential(_conv(out_channel * 2, out_channel * 2, 3, padding=1),
                                    L.ReLU(), L.Dropout2d(drpt), L.MaxPool2d(2))
        self.conv6 = Sequential(_conv(out_channel * 2, out_channel * 4, 3, padding=1),
                                L.ReLU(), L.Dropout2d(drpt), L.MaxPool2d(2))

        lin = (out_channel * 4) * max((window_size // 16) * (window_size // 16), 1)
        self.fc7 = Sequential(
            L.Linear(lin, 512, weight_init=_XU, bias_init=I.zeros),
            L.ReLU(), L.Dropout2d(drpt))
        self.fc8 = L.Linear(512, args.num_outputs, weight_init=_XU, bias_init=I.zeros)

    def _stream(self, tree, ctx, x, motion: bool):
        """One co-occurrence column over person-folded input (N*M, C, T, V)."""
        m = "m" if motion else ""
        s = self.sub
        out1 = getattr(self, "conv1" + m)(s(tree, "conv1" + m), ctx, x)
        out2 = getattr(self, "conv2" + m)(s(tree, "conv2" + m), ctx, out1)
        # point-level -> joint-level: (N,C',T,V) -> (N,V,T,C')
        out2t = jnp.transpose(out2, (0, 3, 2, 1))
        out3 = getattr(self, "conv3" + m)(s(tree, "conv3" + m), ctx, out2t)
        out4 = getattr(self, "conv4" + m)(s(tree, "conv4" + m), ctx, out3)
        return out1, out2, out3, out4

    def apply(self, tree, ctx, x, debug_nan_check: bool = False):
        N, C, T, V, M = x.shape
        s = self.sub

        motion = hcn_motion(x)

        # fold persons into the batch: (N,C,T,V,M) -> (N*M, C, T, V)
        def fold(a):
            return jnp.transpose(a, (0, 4, 1, 2, 3)).reshape(N * M, C, T, V)

        p1, p2, p3, p4 = self._stream(tree, ctx, fold(x), motion=False)
        m1, m2, m3, m4 = self._stream(tree, ctx, fold(motion), motion=True)

        out4 = jnp.concatenate([p4, m4], axis=1)
        out5 = self.conv5(s(tree, "conv5"), ctx, out4)
        out6 = self.conv6(s(tree, "conv6"), ctx, out5)

        # unfold persons and max-merge (reference :167, :173-176)
        def unfold_max(a):
            a = a.reshape(N, M, *a.shape[1:])
            return jnp.max(a, axis=1)

        out7 = unfold_max(out6).reshape(N, -1)
        out8 = self.fc7(s(tree, "fc7"), ctx, out7)
        logits = self.fc8(s(tree, "fc8"), ctx, out8)

        if debug_nan_check:  # reference asserts no NaNs (:180)
            logits = jax.lax.cond(
                jnp.any(jnp.isnan(logits)),
                lambda l: jax.debug.print("Skeleton.forward produced NaNs") or l,
                lambda l: l, logits)

        # hidden taps: elementwise max over persons of each stage,
        # then the flattened max map and the fc7 embedding. Tap 2 is the
        # JOINT-LEVEL view of out2: the reference appends out2 AFTER its
        # (N,C',T,V)->(N,V,T,C') permute (reference ntu.py:145-146,163)
        p2t = jnp.transpose(p2, (0, 3, 2, 1))
        hidden = [unfold_max(p1), unfold_max(p2t), unfold_max(p3),
                  unfold_max(out4), unfold_max(out5), unfold_max(out6),
                  out7, out8]
        return hidden, logits


class LateFusion(Module):
    """Concat final logits of both backbones (:186-200)."""

    def __init__(self, args):
        super().__init__()
        self.skeleton = Skeleton(args)
        self.visual = Visual(args)
        n = getattr(args, "num_classes", args.num_outputs)
        self.final_pred = L.Linear(n * 2, n)

    def apply(self, tree, ctx, inputs):
        frames, skeleton = inputs
        _, ske_logits = self.skeleton(self.sub(tree, "skeleton"), ctx, skeleton)
        vis_logits = self.visual(self.sub(tree, "visual"), ctx, frames)[-1]
        return self.final_pred(self.sub(tree, "final_pred"), ctx,
                               jnp.concatenate([ske_logits, vis_logits], axis=-1))


class GMU(Module):
    """Gated multimodal unit over the penultimate embeddings (:203-228).

    Skeleton tap = ``new_hidden[-2]`` (reference ``skeleton[0][-2]``), the
    flattened pre-fc7 person-max map out7, whose width is
    ``256 * max((vid_len[1]//16)**2, 1)``. The reference hardcodes
    ``Linear(256, ...)``, which is only shape-consistent when
    ``vid_len[1] <= 16`` — with its default window of 32 the shipped GMU
    crashes. We size the gate and reduction from the actual tap width, so
    shapes and state_dict match the reference exactly in every
    configuration where the reference itself is loadable.
    """

    def __init__(self, args):
        super().__init__()
        self.skeleton = Skeleton(args)
        self.visual = Visual(args)
        n = getattr(args, "num_classes", args.num_outputs)
        self.ske_dim = 256 * max((args.vid_len[1] // 16) ** 2, 1)
        self.skel_redu = Sequential(L.Linear(self.ske_dim, 128), L.ReLU(),
                                    L.Dropout2d(args.drpt))
        self.vis_redu = Sequential(L.Linear(2048, 128), L.ReLU(),
                                   L.Dropout2d(args.drpt))
        self.ponderation = Sequential(L.Linear(self.ske_dim + 2048, 1),
                                      L.Sigmoid())
        self.final_pred = L.Linear(128, n)

    def apply(self, tree, ctx, inputs):
        frames, skeleton = inputs
        s = self.sub
        hidden, _ = self.skeleton(s(tree, "skeleton"), ctx, skeleton)
        ske = hidden[-2]  # flattened out7 (reference skeleton[0][-2])
        vis = self.visual(s(tree, "visual"), ctx, frames)[-2]  # pooled 2048-d
        z = self.ponderation(s(tree, "ponderation"), ctx,
                             jnp.concatenate([vis, ske], axis=1))
        ske = self.skel_redu(s(tree, "skel_redu"), ctx, ske)
        vis = self.vis_redu(s(tree, "vis_redu"), ctx, vis)
        h = z * ske + (1.0 - z) * vis
        return self.final_pred(s(tree, "final_pred"), ctx, h)


class CentralNet(Module):
    """Alpha-weighted central column (:231-297), with frozen backbones
    expressed through the trainable predicate instead of the reference's
    reload-on-every-forward."""

    def __init__(self, args):
        super().__init__()
        self.skeleton = Skeleton(args)
        self.visual = Visual(args)
        n = getattr(args, "num_classes", args.num_outputs)

        self.central_conv = ModuleList([
            Sequential(L.Conv2d(512, 1024, kernel_size=4, stride=2, padding=1),
                       L.BatchNorm2d(1024), L.ReLU()),
            Sequential(L.Conv2d(1024, 2048, kernel_size=4, stride=2, padding=1),
                       L.BatchNorm2d(2048), L.ReLU(), L.AvgPool2d((7, 7))),
            L.Linear(2048, n),
        ])
        rand = I.uniform(0.0, 1.0)
        self.alphas_a = L.ParamList([(1,)] * 4, rand)
        self.alphas_v = L.ParamList([(1,)] * 4, rand)
        self.alphas_c = L.ParamList([(1,)] * 4, rand)

    def central_params(self):
        return ["central_conv", "alphas_a", "alphas_v", "alphas_c"]

    @staticmethod
    def _fuse(m1, m2, central, a1, a2, ac):
        # average frame-split 5D maps before fusing (:262-278)
        if m1.ndim > 4:
            m1 = jnp.mean(m1, axis=2)
        if m2.ndim > 4:
            m2 = jnp.mean(m2, axis=2)
        if central.ndim > 4:
            central = jnp.mean(central, axis=2)
        if central.ndim == 4 and central.shape[-1] == 1:
            central = central.reshape(central.shape[0], -1)
        pad = m1.shape[1] - m2.shape[1]
        if pad > 0:
            zeros_shape = (m2.shape[0], pad) + m2.shape[2:]
            m2 = jnp.concatenate([m2, jnp.zeros(zeros_shape, m2.dtype)], axis=1)
        # repair over the reference: skeleton maps have (T, V) spatial dims
        # that can't broadcast against the video maps — the reference's
        # CentralNet would crash here too (it is an abandoned baseline, see
        # also its reload-checkpoint-in-forward defect, SURVEY §2). Align
        # spatial dims bilinearly before the weighted sum.
        if m1.ndim == 4 and m2.ndim == 4 and m1.shape[2:] != m2.shape[2:]:
            m2 = F.interpolate_bilinear(m2, m1.shape[2:])
        return central * ac + m1 * a1 + m2 * a2

    def apply(self, tree, ctx, inputs):
        frames, skeleton = inputs
        s = self.sub
        out = self.visual(s(tree, "visual"), ctx, frames)
        _, fm2, fm3, _, pooled, visual_pred = out
        hidden, skel_pred = self.skeleton(s(tree, "skeleton"), ctx, skeleton)

        central = jnp.zeros_like(jnp.mean(fm2, axis=2))
        vis_feats = [fm2, fm3, pooled, visual_pred]
        ske_feats = [hidden[1], hidden[2], hidden[-1], skel_pred]
        ct = s(tree, "central_conv")
        for i in range(3):
            a = jax.nn.sigmoid(self.alphas_a(s(tree, "alphas_a"), ctx, i))
            v = jax.nn.sigmoid(self.alphas_v(s(tree, "alphas_v"), ctx, i))
            c = jax.nn.sigmoid(self.alphas_c(s(tree, "alphas_c"), ctx, i))
            central = self._fuse(vis_feats[i], ske_feats[i], central, v, a, c)
            central = self.central_conv[i](self.sub(ct, i), ctx, central)
        return central
