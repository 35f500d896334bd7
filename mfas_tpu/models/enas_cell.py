"""ENAS-style micro-cell machinery for the CIFAR searchable vertical
(reference models/auxiliary/aux_models.py:152-540).

  * CreateOp (:469-497): 10-way op factory (identity-ish 1x1, conv 1/3/5/7,
    separable 3/5/7, max/avg pool branches).
  * ConvBranch (:381-416), SeparableConvOld/SeparableConv (:421-457),
    PoolBranch (:349-376), FactorizedReduction (:300-344).
  * CellBlock (:152-174) with DropPath (:527-540): the reference draws ONE
    python random number per DropPath per forward (whole-batch decision,
    inverted scaling); here the draw comes from the Ctx RNG stream.
  * Cell (:179-232): sum of unused block outputs + BN (search-time);
    FixedCell (:235-295): concat + 1x1 reduction (found-arch training).
  * AuxiliaryHead (:501-520).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mfas_tpu.core import functional as F
from mfas_tpu.core import init as I
from mfas_tpu.core import layers as L
from mfas_tpu.core.module import Identity, Module, ModuleList, Sequential

class SeparableConvOld(Module):
    def __init__(self, in_planes, out_planes, kernel_size, bias=False):
        super().__init__()
        padding = (kernel_size - 1) // 2
        self.depthwise = L.Conv2d(in_planes, in_planes, kernel_size,
                                  padding=padding, groups=in_planes, bias=bias)
        self.pointwise = L.Conv2d(in_planes, out_planes, 1, bias=bias)

    def apply(self, tree, ctx, x):
        out = self.depthwise(self.sub(tree, "depthwise"), ctx, x)
        return self.pointwise(self.sub(tree, "pointwise"), ctx, out)


class SeparableConv(Module):
    """Double separable stack (:437-457)."""

    def __init__(self, in_planes, out_planes, kernel_size, bias=False):
        super().__init__()
        padding = (kernel_size - 1) // 2
        self.op = Sequential(
            L.Conv2d(in_planes, in_planes, kernel_size, padding=padding,
                     groups=in_planes, bias=bias),
            L.Conv2d(in_planes, out_planes, 1, bias=bias),
            L.BatchNorm2d(out_planes, eps=1e-3),
            L.ReLU(),
            L.Conv2d(out_planes, out_planes, kernel_size, padding=padding,
                     groups=out_planes, bias=bias),
            L.Conv2d(out_planes, out_planes, 1, bias=False),
            L.BatchNorm2d(out_planes, eps=1e-3),
            L.ReLU(),
        )

    def apply(self, tree, ctx, x):
        return self.op(self.sub(tree, "op"), ctx, x)


class ConvBranch(Module):
    def __init__(self, in_planes, out_planes, kernel_size, separable=False):
        super().__init__()
        assert kernel_size in (1, 3, 5, 7)
        self.inp_conv1 = Sequential(
            L.Conv2d(in_planes, out_planes, 1, bias=False),
            L.BatchNorm2d(out_planes), L.ReLU())
        if separable:
            self.out_conv = Sequential(
                SeparableConvOld(out_planes, out_planes, kernel_size),
                L.BatchNorm2d(out_planes), L.ReLU())
        else:
            padding = (kernel_size - 1) // 2
            self.out_conv = Sequential(
                L.Conv2d(out_planes, out_planes, kernel_size, padding=padding,
                         bias=False),
                L.BatchNorm2d(out_planes), L.ReLU())

    def apply(self, tree, ctx, x):
        out = self.inp_conv1(self.sub(tree, "inp_conv1"), ctx, x)
        return self.out_conv(self.sub(tree, "out_conv"), ctx, out)


class PoolBranch(Module):
    def __init__(self, in_planes, out_planes, avg_or_max):
        super().__init__()
        self.conv1 = Sequential(
            L.Conv2d(in_planes, out_planes, 1, bias=False),
            L.BatchNorm2d(out_planes), L.ReLU())
        if avg_or_max == "avg":
            self.pool = L.AvgPool2d(3, stride=1, padding=1)
        elif avg_or_max == "max":
            self.pool = L.MaxPool2d(3, stride=1, padding=1)
        else:
            raise ValueError(f"Unknown pool {avg_or_max}")

    def apply(self, tree, ctx, x):
        out = self.conv1(self.sub(tree, "conv1"), ctx, x)
        return self.pool(self.sub(tree, "pool"), ctx, out)


def IdentityOp(in_planes, out_planes):
    """conv_type 0: 1x1 conv+BN+ReLU then identity (:470-475). A bare
    Sequential, exactly like the reference — its state_dict keys sit
    directly under the owning attribute (`op{1,2}.0.0.weight`), with no
    extra nesting level."""
    return Sequential(
        Sequential(L.Conv2d(in_planes, out_planes, 1, bias=False),
                   L.BatchNorm2d(out_planes), L.ReLU()),
        Identity())


def CreateOp(conv_type, input_planes=64, output_planes=64):
    table = {
        0: lambda: IdentityOp(input_planes, output_planes),
        1: lambda: ConvBranch(input_planes, output_planes, 1),
        2: lambda: ConvBranch(input_planes, output_planes, 3),
        3: lambda: ConvBranch(input_planes, output_planes, 5),
        4: lambda: ConvBranch(input_planes, output_planes, 7),
        5: lambda: ConvBranch(input_planes, output_planes, 3, separable=True),
        6: lambda: ConvBranch(input_planes, output_planes, 5, separable=True),
        7: lambda: ConvBranch(input_planes, output_planes, 7, separable=True),
        8: lambda: PoolBranch(input_planes, output_planes, "max"),
        9: lambda: PoolBranch(input_planes, output_planes, "avg"),
    }
    names = {'I': 0, '1x1 conv': 1, '3x3 conv': 2, '5x5 conv': 3,
             '7x7 conv': 4, '3x3 depthconv': 5, '5x5 depthconv': 6,
             '7x7 depthconv': 7, '3x3 maxpool': 8, '3x3 avgpool': 9}
    key = names.get(conv_type, conv_type)
    if key not in table:
        raise NotImplementedError(conv_type)
    return table[key]()


class DropPath(Module):
    """Whole-output stochastic path with inverted scaling (:527-540).
    apply -> (out, dropped: bool tracer)."""

    def __init__(self, keep_prob=0.9):
        super().__init__()
        self.keep_prob = keep_prob

    def apply(self, tree, ctx, x, other_dropped=False):
        if not ctx.train or self.keep_prob >= 1.0:
            return x, jnp.asarray(False)
        p = jax.random.uniform(ctx.next_rng(), ())
        keep = jnp.logical_or(p <= self.keep_prob,
                              jnp.asarray(other_dropped))
        out = jnp.where(keep, x / self.keep_prob, jnp.zeros_like(x))
        return out, jnp.logical_not(keep)


class CellBlock(Module):
    def __init__(self, op1_type, op2_type, args):
        super().__init__()
        self.op1 = CreateOp(op1_type, args.planes, args.planes)
        self.op2 = CreateOp(op2_type, args.planes, args.planes)
        self.op1_type = op1_type
        self.op2_type = op2_type
        self.dp1 = DropPath(1.0 - args.drop_path)
        self.dp2 = DropPath(1.0 - args.drop_path)

    def apply(self, tree, ctx, x1, x2):
        xa, xa_dropped = self.dp1(self.sub(tree, "dp1"), ctx,
                                  self.op1(self.sub(tree, "op1"), ctx, x1))
        xb, _ = self.dp2(self.sub(tree, "dp2"), ctx,
                         self.op2(self.sub(tree, "op2"), ctx, x2),
                         xa_dropped)
        return xa + xb


class _CellBase(Module):
    def __init__(self, operation_labels, configuration_indexes, connections,
                 args):
        super().__init__()
        self._configuration = configuration_indexes
        self._connections = np.asarray(connections)
        self._operation_labels = operation_labels
        self._planes = args.planes
        self.blocks, self.block_used = self._create_blocks(args)
        self.num_concatenations = sum(1 for bu in self.block_used if not bu)

    def _create_blocks(self, args):
        block_array = ModuleList()
        block_used = [False] * len(self._connections)
        for b_i, block_conf in enumerate(self._configuration):
            op1 = self._operation_labels[int(block_conf[0])]
            op2 = self._operation_labels[int(block_conf[1])]
            block_array.append(CellBlock(op1, op2, args))
            conn = self._connections[b_i]
            if conn[0] >= 0:
                block_used[int(conn[0])] = True
            if conn[1] >= 0:
                block_used[int(conn[1])] = True
        return block_array, block_used

    def _block_outputs(self, tree, ctx, x1, x2):
        outs = [x1, x2]
        bt = self.sub(tree, "blocks")
        for b_i in range(len(self.blocks)):
            c0, c1 = (int(v) + 2 for v in self._connections[b_i])
            outs.append(self.blocks[b_i](self.sub(bt, b_i), ctx,
                                         outs[c0], outs[c1]))
        return [o for i, o in enumerate(outs[2:]) if not self.block_used[i]]


class Cell(_CellBase):
    """Search-time cell: SUM of unused block outputs + BN (:195-211)."""

    def __init__(self, operation_labels, configuration_indexes, connections,
                 args):
        super().__init__(operation_labels, configuration_indexes, connections,
                         args)
        self.bn = L.BatchNorm2d(self._planes, eps=1e-3)

    def apply(self, tree, ctx, x1, x2):
        unused = self._block_outputs(tree, ctx, x1, x2)
        out = unused[0]
        for o in unused[1:]:
            out = out + o
        return self.bn(self.sub(tree, "bn"), ctx, out)


class FixedCell(_CellBase):
    """Found-arch cell: CONCAT of unused outputs + 1x1 reduce (:255-274)."""

    def __init__(self, operation_labels, configuration_indexes, connections,
                 args):
        super().__init__(operation_labels, configuration_indexes, connections,
                         args)
        in_planes = self.num_concatenations * self._planes
        self.dim_reduc = Sequential(
            L.Conv2d(in_planes, self._planes, 1, bias=False),
            L.ReLU(), L.BatchNorm2d(self._planes))

    def apply(self, tree, ctx, x1, x2):
        unused = self._block_outputs(tree, ctx, x1, x2)
        out = jnp.concatenate(unused, axis=1)
        return self.dim_reduc(self.sub(tree, "dim_reduc"), ctx, out)


class FactorizedReduction(Module):
    """Halve spatial dims, optionally change filters (:300-344)."""

    def __init__(self, in_planes, out_planes, stride=2):
        super().__init__()
        assert out_planes % 2 == 0
        self.stride = stride
        if stride == 1:
            self.fr = Sequential(
                L.Conv2d(in_planes, out_planes, 1, bias=False),
                L.BatchNorm2d(out_planes))
        else:
            self.path1 = Sequential(
                L.AvgPool2d(1, stride=stride),
                L.Conv2d(in_planes, out_planes // 2, 1, bias=False))
            self.path2 = Sequential(
                L.AvgPool2d(1, stride=stride),
                L.Conv2d(in_planes, out_planes // 2, 1, bias=False))
            self.bn = L.BatchNorm2d(out_planes)

    def apply(self, tree, ctx, x):
        if self.stride == 1:
            return self.fr(self.sub(tree, "fr"), ctx, x)
        p1 = self.path1(self.sub(tree, "path1"), ctx, x)
        # shift-by-one path: pad bottom/right then crop top/left
        shifted = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1)))[:, :, 1:, 1:]
        p2 = self.path2(self.sub(tree, "path2"), ctx, shifted)
        out = jnp.concatenate([p1, p2], axis=1)
        return self.bn(self.sub(tree, "bn"), ctx, out)


class AuxiliaryHead(Module):
    """(:501-520)."""

    def __init__(self, num_classes, filters=96):
        super().__init__()
        self.features = Sequential(
            L.AvgPool2d(5, stride=2, padding=0, count_include_pad=False),
            L.Conv2d(filters, filters * 2, 1, bias=False),
            L.BatchNorm2d(filters * 2), L.ReLU(),
            L.Conv2d(filters * 2, filters * 6, 2, bias=False),
            L.BatchNorm2d(filters * 6), L.ReLU())
        self.classifier = L.Linear(filters * 6, num_classes)

    def apply(self, tree, ctx, x):
        x = self.features(self.sub(tree, "features"), ctx, x)
        x = F.adaptive_avg_pool2d_1x1(x).reshape(x.shape[0], -1)
        return self.classifier(self.sub(tree, "classifier"), ctx, x)


# small reusable pieces also exported by the reference's aux_models
class Tensor1DLateralPadding(Module):
    def __init__(self, pad):
        super().__init__()
        self.pad = pad

    def apply(self, tree, ctx, x):
        return jnp.concatenate(
            [x, jnp.zeros((x.shape[0], self.pad), x.dtype)], axis=1)


class ChannelPadding(Module):
    def __init__(self, pad):
        super().__init__()
        self.pad = pad

    def apply(self, tree, ctx, x):
        z = jnp.zeros((x.shape[0], self.pad) + x.shape[2:], x.dtype)
        return jnp.concatenate([x, z], axis=1)
