"""Layer modules with torch-compatible parameter trees.

Leaf names mirror torch state_dict entries exactly: ``weight``, ``bias``,
``running_mean``, ``running_var``, ``num_batches_tracked`` — so a model's
flattened tree is its reference ``state_dict`` (SURVEY.md §5.4)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mfas_tpu.core import functional as F
from mfas_tpu.core import init as I
from mfas_tpu.core.module import Ctx, Module, Rng


# --------------------------------------------------------------------------
# parametric layers
# --------------------------------------------------------------------------
class Linear(Module):
    def __init__(self, in_features, out_features, bias=True, weight_init=None, bias_init=None):
        super().__init__()
        self.in_features = int(in_features)
        self.out_features = int(out_features)
        self.use_bias = bias
        self.weight_init = weight_init or I.torch_default_weight
        self.bias_init = bias_init

    def create(self, rng: Rng):
        wshape = (self.out_features, self.in_features)
        tree = {"weight": self.weight_init(rng.next(), wshape)}
        if self.use_bias:
            binit = self.bias_init or I.torch_default_bias(wshape)
            tree["bias"] = binit(rng.next(), (self.out_features,))
        return tree

    def leaf_kinds(self):
        k = {"weight": "param"}
        if self.use_bias:
            k["bias"] = "param"
        return k

    def apply(self, tree, ctx, x):
        return F.linear(x, tree["weight"], tree.get("bias"))


class _ConvNd(Module):
    _ndim = 2
    _fn = staticmethod(F.conv2d)

    def __init__(self, in_channels, out_channels, kernel_size, stride=1, padding=0,
                 dilation=1, groups=1, bias=True, weight_init=None, bias_init=None):
        super().__init__()
        if isinstance(kernel_size, int):
            kernel_size = (kernel_size,) * self._ndim
        self.in_channels = int(in_channels)
        self.out_channels = int(out_channels)
        self.kernel_size = tuple(kernel_size)
        self.stride = stride
        self.padding = padding
        self.dilation = dilation
        self.groups = groups
        self.use_bias = bias
        self.weight_init = weight_init or I.torch_default_weight
        self.bias_init = bias_init

    def create(self, rng: Rng):
        wshape = (self.out_channels, self.in_channels // self.groups) + self.kernel_size
        tree = {"weight": self.weight_init(rng.next(), wshape)}
        if self.use_bias:
            binit = self.bias_init or I.torch_default_bias(wshape)
            tree["bias"] = binit(rng.next(), (self.out_channels,))
        return tree

    def leaf_kinds(self):
        k = {"weight": "param"}
        if self.use_bias:
            k["bias"] = "param"
        return k

    def apply(self, tree, ctx, x):
        return self._fn(x, tree["weight"], tree.get("bias"),
                        stride=self.stride, padding=self.padding,
                        dilation=self.dilation, groups=self.groups)


class Conv2d(_ConvNd):
    _ndim = 2
    _fn = staticmethod(F.conv2d)


class Conv3d(_ConvNd):
    _ndim = 3
    _fn = staticmethod(F.conv3d)


class Conv1d(Module):
    def __init__(self, in_channels, out_channels, kernel_size, stride=1, padding=0,
                 bias=True, weight_init=None, bias_init=None):
        super().__init__()
        self.in_channels, self.out_channels = int(in_channels), int(out_channels)
        self.kernel_size, self.stride, self.padding = int(kernel_size), stride, padding
        self.use_bias = bias
        self.weight_init = weight_init or I.torch_default_weight
        self.bias_init = bias_init

    def create(self, rng: Rng):
        wshape = (self.out_channels, self.in_channels, self.kernel_size)
        tree = {"weight": self.weight_init(rng.next(), wshape)}
        if self.use_bias:
            binit = self.bias_init or I.torch_default_bias(wshape)
            tree["bias"] = binit(rng.next(), (self.out_channels,))
        return tree

    def leaf_kinds(self):
        k = {"weight": "param"}
        if self.use_bias:
            k["bias"] = "param"
        return k

    def apply(self, tree, ctx, x):
        return F.conv1d(x, tree["weight"], tree.get("bias"),
                        stride=self.stride, padding=self.padding)


class _BatchNorm(Module):
    """torch BatchNorm semantics: biased batch var normalizes, unbiased batch
    var feeds the running average; eval uses running stats.

    Sharding note (SURVEY §5.8): under jit/GSPMD data parallelism the batch
    reductions here are *global-batch* — XLA inserts the cross-shard psum —
    which is statistically stronger than the reference's per-GPU
    DataParallel stats. ``axis_name`` exists for pmap/shard_map flows where
    per-shard stats are the default and cross-replica stats are opt-in."""

    def __init__(self, num_features, eps=1e-5, momentum=0.1, affine=True,
                 track_running_stats=True, axis_name=None):
        super().__init__()
        self.num_features = int(num_features)
        self.eps = eps
        self.momentum = momentum
        self.affine = affine
        self.track_running_stats = track_running_stats
        self.axis_name = axis_name

    def create(self, rng: Rng):
        tree = {}
        if self.affine:
            tree["weight"] = jnp.ones((self.num_features,))
            tree["bias"] = jnp.zeros((self.num_features,))
        if self.track_running_stats:
            tree["running_mean"] = jnp.zeros((self.num_features,))
            tree["running_var"] = jnp.ones((self.num_features,))
            tree["num_batches_tracked"] = jnp.zeros((), jnp.int64 if jax.config.read("jax_enable_x64") else jnp.int32)
        return tree

    def leaf_kinds(self):
        k = {}
        if self.affine:
            k.update(weight="param", bias="param")
        if self.track_running_stats:
            k.update(running_mean="buffer", running_var="buffer",
                     num_batches_tracked="buffer")
        return k

    def apply(self, tree, ctx: Ctx, x):
        reduce_axes = tuple(i for i in range(x.ndim) if i != 1)
        shape = [1] * x.ndim
        shape[1] = self.num_features

        if ctx.train or not self.track_running_stats:
            # batch statistics always in f32: computing E[x^2]-E[x]^2 at
            # bf16 cancels catastrophically (post-ReLU maps with mean >>
            # std go NEGATIVE -> rsqrt NaN). At f32 the cancellation is
            # ~mean^2 * 6e-8 — negligible against eps=1e-5 — and the
            # one-pass form lets XLA fuse both reductions into a single
            # read of the activations (a centered two-pass costs an extra
            # full HBM pass per BN on this memory-bound network, measured
            # ~15% on the found-train step). The clamp guards pathological
            # means.
            xs = x.astype(jnp.float32) if x.dtype != jnp.float64 else x
            mean = jnp.mean(xs, axis=reduce_axes)
            sqmean = jnp.mean(jnp.square(xs), axis=reduce_axes)
            if self.axis_name is not None:
                # pmean of the raw moments gives exact global statistics
                mean = jax.lax.pmean(mean, self.axis_name)
                sqmean = jax.lax.pmean(sqmean, self.axis_name)
            var = jnp.maximum(sqmean - jnp.square(mean), 0.0)
            if ctx.train and self.track_running_stats:
                # running-stat updates stay in f32 regardless of the
                # compute dtype the engine cast the tree to; the Bessel
                # count matches the statistics' extent — GLOBAL when var
                # was pmean'd across an axis
                n = x.size // self.num_features
                if self.axis_name is not None:
                    n = n * jax.lax.psum(1, self.axis_name)
                unbiased = var * (n / jnp.maximum(n - 1, 1))
                m = self.momentum
                rdt = jnp.promote_types(jnp.float32,
                                        tree["running_mean"].dtype)
                ctx.put_update(
                    self._join("running_mean"),
                    (1 - m) * tree["running_mean"].astype(rdt) + m * mean)
                ctx.put_update(
                    self._join("running_var"),
                    (1 - m) * tree["running_var"].astype(rdt) + m * unbiased)
                ctx.put_update(self._join("num_batches_tracked"),
                               tree["num_batches_tracked"] + 1)
            mean = mean.astype(x.dtype)
            var = var.astype(x.dtype)
        else:
            # stats may be stored at f32 while x runs at bf16 — normalize
            # in the activation dtype either way
            mean = tree["running_mean"].astype(x.dtype)
            var = tree["running_var"].astype(x.dtype)

        out = (x - mean.reshape(shape)) * jax.lax.rsqrt(var.reshape(shape) + self.eps)
        if self.affine:
            out = out * tree["weight"].reshape(shape) + tree["bias"].reshape(shape)
        return out

    def _join(self, leaf):
        return f"{self.path}.{leaf}" if self.path else leaf


class BatchNorm1d(_BatchNorm):
    pass


class BatchNorm2d(_BatchNorm):
    pass


class BatchNorm3d(_BatchNorm):
    pass


# --------------------------------------------------------------------------
# stateless layers
# --------------------------------------------------------------------------
class ReLU(Module):
    def apply(self, tree, ctx, x):
        return jax.nn.relu(x)


class LeakyReLU(Module):
    def __init__(self, negative_slope=0.01):
        super().__init__()
        self.negative_slope = negative_slope

    def apply(self, tree, ctx, x):
        return jax.nn.leaky_relu(x, self.negative_slope)


class Sigmoid(Module):
    def apply(self, tree, ctx, x):
        return jax.nn.sigmoid(x)


class Tanh(Module):
    def apply(self, tree, ctx, x):
        return jnp.tanh(x)


class ELU(Module):
    def apply(self, tree, ctx, x):
        return jax.nn.elu(x)


class Dropout(Module):
    def __init__(self, p=0.5):
        super().__init__()
        self.p = float(p)

    def apply(self, tree, ctx, x):
        if ctx.train and self.p > 0.0:
            return F.dropout(x, self.p, ctx.next_rng())
        return x


class Dropout2d(Module):
    def __init__(self, p=0.5):
        super().__init__()
        self.p = float(p)

    def apply(self, tree, ctx, x):
        if ctx.train and self.p > 0.0:
            return F.dropout2d(x, self.p, ctx.next_rng())
        return x


class MaxPool2d(Module):
    def __init__(self, kernel_size, stride=None, padding=0):
        super().__init__()
        self.kernel_size, self.stride, self.padding = kernel_size, stride, padding

    def apply(self, tree, ctx, x):
        return F.max_pool2d(x, self.kernel_size, self.stride, self.padding)


class AvgPool2d(Module):
    def __init__(self, kernel_size, stride=None, padding=0, count_include_pad=True):
        super().__init__()
        self.kernel_size, self.stride, self.padding = kernel_size, stride, padding
        self.count_include_pad = count_include_pad

    def apply(self, tree, ctx, x):
        return F.avg_pool2d(x, self.kernel_size, self.stride, self.padding,
                            self.count_include_pad)


class AvgPool3d(Module):
    def __init__(self, kernel_size, stride=None, padding=0):
        super().__init__()
        self.kernel_size, self.stride, self.padding = kernel_size, stride, padding

    def apply(self, tree, ctx, x):
        return F.avg_pool3d(x, self.kernel_size, self.stride, self.padding)


class AdaptiveAvgPool2d(Module):
    def __init__(self, output_size=(1, 1)):
        super().__init__()
        assert tuple(output_size) == (1, 1), "only (1,1) is used by the reference"

    def apply(self, tree, ctx, x):
        return F.adaptive_avg_pool2d_1x1(x)


class GlobalPooling2D(Module):
    """Mean over all trailing dims after channel (aux_models.py:54-64)."""

    def apply(self, tree, ctx, x):
        return F.global_avg_pool2d(x)


class GlobalPooling1D(Module):
    def apply(self, tree, ctx, x):
        return F.global_avg_pool1d(x)


class Flatten(Module):
    def apply(self, tree, ctx, x):
        return x.reshape(x.shape[0], -1)


# --------------------------------------------------------------------------
# reference-specific small modules
# --------------------------------------------------------------------------
class Maxout(Module):
    """Linear(d -> m*k) followed by max over k (aux_models.py:78-91)."""

    def __init__(self, d, m, k):
        super().__init__()
        self.d_in, self.d_out, self.pool_size = d, m, k
        self.lin = Linear(d, m * k)

    def apply(self, tree, ctx, x):
        out = self.lin(self.sub(tree, "lin"), ctx, x)
        out = out.reshape(x.shape[:-1] + (self.d_out, self.pool_size))
        return jnp.max(out, axis=-1)


class AlphaScalarMultiplication(Module):
    """x*sigmoid(alpha), y*(1-sigmoid(alpha)) gate (aux_models.py:94-111).
    The fusion nets re-init alpha_x ~ N(0, 0.1)
    (models/search/ntu_searchable.py:202-204)."""

    def __init__(self, size_alpha_x, size_alpha_y, alpha_init=None):
        super().__init__()
        self.size_alpha_x = size_alpha_x
        self.size_alpha_y = size_alpha_y
        self.alpha_init = alpha_init or I.zeros

    def create(self, rng: Rng):
        return {"alpha_x": self.alpha_init(rng.next(), (1,))}

    def leaf_kinds(self):
        return {"alpha_x": "param"}

    def apply(self, tree, ctx, x, y):
        factor = jax.nn.sigmoid(tree["alpha_x"])
        return x * factor, y * (1.0 - factor)


class AlphaVectorMultiplication(Module):
    """x * sigmoid(alpha_vector) (aux_models.py:114-125)."""

    def __init__(self, size_alpha):
        super().__init__()
        self.size_alpha = size_alpha

    def create(self, rng: Rng):
        return {"alpha": jnp.zeros((1, self.size_alpha))}

    def leaf_kinds(self):
        return {"alpha": "param"}

    def apply(self, tree, ctx, x):
        return x * jax.nn.sigmoid(tree["alpha"])


class ParamList(Module):
    """torch nn.ParameterList equivalent: leaves named '0', '1', ... so
    state_dict keys match (e.g. 'alphas_a.0')."""

    def __init__(self, shapes, init=None):
        super().__init__()
        self.shapes = [tuple(s) for s in shapes]
        self._initializer = init or I.uniform(0.0, 1.0)  # torch.rand default

    def create(self, rng: Rng):
        return {str(i): self._initializer(rng.next(), s)
                for i, s in enumerate(self.shapes)}

    def leaf_kinds(self):
        return {str(i): "param" for i in range(len(self.shapes))}

    def __len__(self):
        return len(self.shapes)

    def apply(self, tree, ctx, i):
        return tree[str(i)]


class Activ(Module):
    """Activation factory (reference models/central/ops.py:6-30), including
    the learned-beta Swish."""

    def __init__(self, activation: str):
        super().__init__()
        self.activation = activation
        if activation not in ("LeakyReLU", "ELU", "ReLU", "Tanh", "Sigmoid", "Swish"):
            print("WARNING: REQUIRED ACTIVATION IS NOT DEFINED")

    def create(self, rng: Rng):
        if self.activation == "Swish":
            return {"beta": jnp.asarray([0.5])}
        return {}

    def leaf_kinds(self):
        return {"beta": "param"} if self.activation == "Swish" else {}

    def apply(self, tree, ctx, x):
        a = self.activation
        if a == "LeakyReLU":
            return jax.nn.leaky_relu(x, 0.01)
        if a == "ELU":
            return jax.nn.elu(x)
        if a == "ReLU":
            return jax.nn.relu(x)
        if a == "Tanh":
            return jnp.tanh(x)
        if a == "Sigmoid":
            return jax.nn.sigmoid(x)
        if a == "Swish":
            return jax.nn.sigmoid(tree["beta"] * x) * x
        return x
