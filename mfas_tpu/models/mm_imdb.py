"""MM-IMDB model family (reference models/central/mm_imdb.py).

  * GP_VGG (:19-59): VGG-19 feature trunk with GlobalPooling2D taps after
    module indices 20/26/33/36 (all 512-d) and a BN+Linear classifier on
    the last tap.
  * GP_LeNet_Deeper image variant (:63-119) — structurally identical to
    the AV-MNIST class, so models/avmnist's is reused. ONE difference to
    mind when wiring from the reference source: the reference MM-IMDB
    copy returns (gp1..gp5, logits) (:119) while the reused class returns
    (logits, gp1..gp5) — consumers here index the reused order (e.g.
    img[1:] for taps, img[0] for logits).
  * SimpleRecurrentModel (:123-154): 2 stacked GRUs over padded GloVe
    sequences, dropout 0.666 between them, classify the last valid step.
  * Maxout / MaxOut_MLP (:160-196): maxout text net returning (o1, o3, o5).
  * Late fusion SimpleVTNet / VGGVTNet (:200-254).
  * CentralNet variants VGGT_CentralNet (:258-392), SimpleVT_CentralNet
    (:395-506), VGGT_CentralNetV2 with vector sigmoid gates (:509-652).
  * WeightedCrossEntropyWithLogits (:655-673) lives in
    mfas_tpu.core.functional.weighted_bce_with_logits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mfas_tpu.core import functional as F
from mfas_tpu.core import init as I
from mfas_tpu.core import layers as L
from mfas_tpu.core.module import Module, Sequential
from mfas_tpu.core.rnn import GRU
from mfas_tpu.models.avmnist import GP_LeNet_Deeper, fuse_features  # noqa: F401
from mfas_tpu.models.vgg import vgg19_features

# tap positions in the VGG feature stack (reference :41-51)
_VGG_TAPS = (20, 26, 33, 36)


class GP_VGG(Module):
    """Returns (gp1, gp2, gp3, gp4, logits)."""

    def __init__(self, args):
        super().__init__()
        self.vgg = vgg19_features()
        self.bn4 = L.BatchNorm1d(512)
        self.classifier = L.Linear(512, args.num_outputs)

    def apply(self, tree, ctx, x):
        s = self.sub
        taps = []
        vt = s(tree, "vgg")
        for i in range(len(self.vgg)):
            x = self.vgg[i](Module.sub(vt, i), ctx, x)
            if i in _VGG_TAPS:
                taps.append(F.global_avg_pool2d(x))
        bn4 = self.bn4(s(tree, "bn4"), ctx, taps[3])
        logits = self.classifier(s(tree, "classifier"), ctx, bn4)
        return taps[0], taps[1], taps[2], taps[3], logits


class SimpleRecurrentModel(Module):
    """2xGRU text net; picks each sequence's last valid step (:140-154).

    Documented deviation: the reference calls functional.dropout(p=0.666)
    between the GRUs with the default training=True, so its dropout fires
    in EVAL too (a defect — stochastic eval logits). Here the dropout
    honors ctx.train; the oracle parity test patches the reference's
    always-on call out for the comparison (tests/test_reference_oracle_
    more.py)."""

    def __init__(self, args, num_hidden=100, number_input_feats=100):
        super().__init__()
        self.num_hidden = num_hidden
        self.embedding1 = GRU(number_input_feats, num_hidden, batch_first=True)
        self.embedding2 = GRU(num_hidden, num_hidden, batch_first=True)
        self.hid2val = L.Linear(num_hidden, args.num_outputs)

    def apply(self, tree, ctx, padded_input, input_lengths):
        s = self.sub
        out1, _ = self.embedding1(s(tree, "embedding1"), ctx, padded_input)
        if ctx.train:
            out1 = F.dropout(out1, 0.666, ctx.next_rng())
        out2, _ = self.embedding2(s(tree, "embedding2"), ctx, out1)
        idx = jnp.asarray(input_lengths) - 1              # (B,)
        last = jnp.take_along_axis(
            out2, idx[:, None, None].astype(jnp.int32), axis=1)[:, 0]
        return self.hid2val(s(tree, "hid2val"), ctx, last)


class MaxOut_MLP(Module):
    """Maxout(5) -> BN+Drop -> Maxout(5) -> BN+Drop -> Linear; returns
    (o1, o3, o5) (:176-196)."""

    def __init__(self, args, first_hidden=64, number_input_feats=300):
        super().__init__()
        self.op1 = L.Maxout(number_input_feats, first_hidden, 5)
        self.op2 = Sequential(L.BatchNorm1d(first_hidden), L.Dropout(0.5))
        self.op3 = L.Maxout(first_hidden, first_hidden * 2, 5)
        self.op4 = Sequential(L.BatchNorm1d(first_hidden * 2), L.Dropout(0.5))
        self.hid2val = L.Linear(first_hidden * 2, args.num_outputs)

    def apply(self, tree, ctx, x):
        s = self.sub
        o1 = self.op1(s(tree, "op1"), ctx, x)
        o2 = self.op2(s(tree, "op2"), ctx, o1)
        o3 = self.op3(s(tree, "op3"), ctx, o2)
        o4 = self.op4(s(tree, "op4"), ctx, o3)
        o5 = self.hid2val(s(tree, "hid2val"), ctx, o4)
        return o1, o3, o5


class SimpleVTNet(Module):
    """Late fusion: deepest LeNet tap + maxout text feature (:200-223)."""

    def __init__(self, args, text_first_hidden, image_channels):
        super().__init__()
        self.image_net = GP_LeNet_Deeper(args, image_channels)
        self.text_net = MaxOut_MLP(args, text_first_hidden)
        self.classifier = L.Linear(
            int(16 * args.channels + 2 * text_first_hidden), args.num_outputs)

    def central_params(self):
        return ["classifier"]

    def apply(self, tree, ctx, text, image):
        s = self.sub
        img = self.image_net(s(tree, "image_net"), ctx, image)
        t_o1, t_o2, t_out = self.text_net(s(tree, "text_net"), ctx, text)
        feat = jnp.concatenate([t_o2, img[5]], axis=1)
        return self.classifier(s(tree, "classifier"), ctx, feat)


class VGGVTNet(Module):
    """(:227-254)."""

    def __init__(self, args, text_first_hidden, image_channels=3):
        super().__init__()
        self.image_net = GP_VGG(args)
        self.text_net = MaxOut_MLP(args, text_first_hidden)
        self.classifier = L.Linear(int(512 + 2 * text_first_hidden),
                                   args.num_outputs)
        self.bn4 = L.BatchNorm1d(512)

    def central_params(self):
        return ["classifier"]

    def apply(self, tree, ctx, text, image):
        s = self.sub
        gp1, gp2, gp3, gp4, _ = self.image_net(s(tree, "image_net"), ctx, image)
        t_o1, t_o2, t_out = self.text_net(s(tree, "text_net"), ctx, text)
        gp4 = self.bn4(s(tree, "bn4"), ctx, gp4)
        feat = jnp.concatenate([t_o2, gp4], axis=1)
        return self.classifier(s(tree, "classifier"), ctx, feat)


class _CentralVTBase(Module):
    """Shared scaffolding of the VGG/Simple CentralNets."""

    _alpha_names = ("alpha1_feat1", "alpha2_feat1", "alpha1_feat2",
                    "alpha2_feat2", "alpha_conv1", "alpha_conv2")

    def _make_alphas(self):
        rand = I.uniform(0.0, 1.0)
        for name in self._alpha_names:
            self.declare_param(name, (1,), rand)

    def _alpha(self, tree, ctx, name):
        return tree[name]

    def central_params(self):
        return ["central_conv1", "central_conv2", "central_classifier",
                *self._alpha_names]


class VGGT_CentralNet(_CentralVTBase):
    """Linear central column over BN'd VGG taps + maxout text (:258-392)."""

    def __init__(self, args, text_first_hidden, image_channels=3):
        super().__init__()
        self.args = args
        self.image_net = GP_VGG(args)
        self.text_net = MaxOut_MLP(args, text_first_hidden)
        self._make_alphas()

        for i in range(1, 5):
            setattr(self, f"bn{i}", L.BatchNorm1d(512))

        nodes = args.channels
        inunits = 512
        if args.fusetype == "cat":
            nodes *= 2
            inunits *= 2
        self.central_conv1 = L.Linear(inunits, args.channels)
        self.central_conv2 = L.Linear(inunits, args.channels)
        self.bnc1 = L.BatchNorm1d(args.channels)
        self.bnc2 = L.BatchNorm1d(args.channels)
        self.central_classifier = L.Linear(nodes, args.num_outputs)

    def apply(self, tree, ctx, text, image):
        s = self.sub
        gps = self.image_net(s(tree, "image_net"), ctx, image)
        im_out = gps[4]
        gp = [getattr(self, f"bn{i+1}")(s(tree, f"bn{i+1}"), ctx, gps[i])
              for i in range(4)]
        t_o1, t_o2, t_out = self.text_net(s(tree, "text_net"), ctx, text)

        mix = {"11,24": (gp[0], gp[3]), "13,24": (gp[2], gp[3]),
               "12,24": (gp[1], gp[3])}
        if self.args.fusingmix not in mix:
            raise ValueError(f"fusingmix {self.args.fusingmix} not implemented")
        im1, im2 = mix[self.args.fusingmix]

        ft = self.args.fusetype
        fuse1 = fuse_features(t_o1, im1, self._alpha(tree, ctx, "alpha1_feat1"),
                              self._alpha(tree, ctx, "alpha1_feat2"), ft)
        fuse2 = fuse_features(t_o2, im2, self._alpha(tree, ctx, "alpha2_feat1"),
                              self._alpha(tree, ctx, "alpha2_feat2"), ft)

        cc1 = jax.nn.relu(self.central_conv1(s(tree, "central_conv1"), ctx, fuse1))
        cc2 = jax.nn.relu(self.central_conv2(s(tree, "central_conv2"), ctx, fuse2))
        fuse3 = fuse_features(cc1, cc2, self._alpha(tree, ctx, "alpha_conv1"),
                              self._alpha(tree, ctx, "alpha_conv2"), ft)
        fusion_out = self.central_classifier(s(tree, "central_classifier"),
                                             ctx, fuse3)
        return t_out, im_out, fusion_out


class SimpleVT_CentralNet(_CentralVTBase):
    """Conv1d central column over LeNet taps + maxout text (:395-506)."""

    def __init__(self, args, text_first_hidden, image_channels):
        super().__init__()
        self.args = args
        self.image_net = GP_LeNet_Deeper(args, image_channels)
        self.text_net = MaxOut_MLP(args, text_first_hidden)
        self._make_alphas()

        self.central_conv1 = L.Conv1d(1, 1, kernel_size=3, padding=1, bias=False)
        self.central_conv2 = L.Conv1d(1, 1, kernel_size=3, padding=1, bias=False)

        if args.fusingmix in ("11,25", "13,25"):
            nodes = 384
        elif args.fusingmix == "11,23":
            nodes = 256
        else:
            raise ValueError(f"fusingmix {args.fusingmix} not implemented")
        if args.fusetype == "cat":
            nodes *= 2
        self.central_classifier = L.Linear(nodes, args.num_outputs)

    def apply(self, tree, ctx, text, image):
        s = self.sub
        img = self.image_net(s(tree, "image_net"), ctx, image)
        im_out, gp = img[0], img[1:]
        t_o1, t_o2, t_out = self.text_net(s(tree, "text_net"), ctx, text)

        mix = {"11,23": (gp[0], gp[2]), "11,25": (gp[0], gp[4]),
               # '13' maps to gp2 — a reference quirk, not a typo here
               # (mm_imdb.py:458 uses im_gp2 for fusingmix '13,25')
               "13,25": (gp[1], gp[4])}
        im1, im2 = mix[self.args.fusingmix]
        ft = self.args.fusetype
        fuse1 = fuse_features(t_o1, im1, self._alpha(tree, ctx, "alpha1_feat1"),
                              self._alpha(tree, ctx, "alpha1_feat2"), ft)
        fuse2 = fuse_features(t_o2, im2, self._alpha(tree, ctx, "alpha2_feat1"),
                              self._alpha(tree, ctx, "alpha2_feat2"), ft)

        one = jnp.ones((1,))
        cc1 = jax.nn.relu(self.central_conv1(s(tree, "central_conv1"), ctx,
                                             fuse1[:, None, :]))
        cc1 = fuse_features(cc1[:, 0, :], fuse2,
                            self._alpha(tree, ctx, "alpha_conv1"), one, "wsum")
        cc2 = jax.nn.relu(self.central_conv2(s(tree, "central_conv2"), ctx,
                                             cc1[:, None, :]))
        fusion_out = self.central_classifier(s(tree, "central_classifier"),
                                             ctx, cc2[:, 0, :])
        return t_out, im_out, fusion_out


class VGGT_CentralNetV2(_CentralVTBase):
    """V2: per-feature sigmoid gate vectors instead of scalar alphas
    (:509-652)."""

    def __init__(self, args, text_first_hidden, image_channels=3):
        super().__init__()
        self.args = args
        self.image_net = GP_VGG(args)
        self.text_net = MaxOut_MLP(args, text_first_hidden)

        for i in range(1, 5):
            setattr(self, f"bn{i}", L.BatchNorm1d(512))

        nodes = args.channels
        inunits = 512
        for name in ("alpha1_feat1", "alpha2_feat1", "alpha1_feat2",
                     "alpha2_feat2"):
            self.declare_param(name, (1, inunits), I.zeros)
        if args.fusetype == "cat":
            nodes *= 2
            inunits *= 2
        for name in ("alpha_conv1", "alpha_conv2"):
            self.declare_param(name, (1, args.channels), I.zeros)

        self.central_conv1 = L.Linear(inunits, args.channels)
        self.central_conv2 = L.Linear(inunits, args.channels)
        self.bnc1 = L.BatchNorm1d(args.channels)
        self.bnc2 = L.BatchNorm1d(args.channels)
        self.central_classifier = L.Linear(nodes, args.num_outputs)

    @staticmethod
    def _gated_fuse(f1, f2, a1, a2, fusetype):
        """(:606-641): sigmoid-gated, laterally padded fuse."""
        dif = f1.shape[1] - f2.shape[1]

        def pad(x, p):
            return jnp.concatenate([x, jnp.zeros((x.shape[0], p), x.dtype)], 1) \
                if p > 0 else x

        if dif > 0:
            in1 = f1 * jax.nn.sigmoid(a1)
            in2 = pad(f2, dif) * jax.nn.sigmoid(a2)
        elif dif < 0:
            in1 = pad(f1, -dif) * jax.nn.sigmoid(a1)
            in2 = f2 * jax.nn.sigmoid(a2)
        else:
            in1 = f1 * jax.nn.sigmoid(a1)
            in2 = f2 * jax.nn.sigmoid(a2)
        if fusetype == "cat":
            return jnp.concatenate([in1, in2], axis=1)
        return in1 + in2

    def apply(self, tree, ctx, text, image):
        s = self.sub
        gps = self.image_net(s(tree, "image_net"), ctx, image)
        im_out = gps[4]
        gp = [getattr(self, f"bn{i+1}")(s(tree, f"bn{i+1}"), ctx, gps[i])
              for i in range(4)]
        t_o1, t_o2, t_out = self.text_net(s(tree, "text_net"), ctx, text)

        mix = {"11,24": (gp[0], gp[3]), "13,24": (gp[2], gp[3]),
               "12,24": (gp[1], gp[3])}
        if self.args.fusingmix not in mix:
            raise ValueError(f"fusingmix {self.args.fusingmix} not implemented")
        im1, im2 = mix[self.args.fusingmix]

        ft = self.args.fusetype
        fuse1 = self._gated_fuse(t_o1, im1, self._alpha(tree, ctx, "alpha1_feat1"),
                                 self._alpha(tree, ctx, "alpha1_feat2"), ft)
        fuse2 = self._gated_fuse(t_o2, im2, self._alpha(tree, ctx, "alpha2_feat1"),
                                 self._alpha(tree, ctx, "alpha2_feat2"), ft)
        cc1 = jax.nn.relu(self.central_conv1(s(tree, "central_conv1"), ctx, fuse1))
        cc2 = jax.nn.relu(self.central_conv2(s(tree, "central_conv2"), ctx, fuse2))
        fuse3 = self._gated_fuse(cc1, cc2, self._alpha(tree, ctx, "alpha_conv1"),
                                 self._alpha(tree, ctx, "alpha_conv2"), ft)
        fusion_out = self.central_classifier(s(tree, "central_classifier"),
                                             ctx, fuse3)
        return t_out, im_out, fusion_out


class WeightedCrossEntropyWithLogits(Module):
    """(:655-673); functional form in core.functional."""

    def __init__(self, pos_weight):
        super().__init__()
        self.pos_weight = pos_weight

    def apply(self, tree, ctx, logits, targets):
        return F.weighted_bce_with_logits(logits, targets, self.pos_weight)
