"""Low-level functional ops (XLA-native equivalents of the torch ops the
reference uses). All take/return jnp arrays in torch's NCHW/NCDHW layouts so
parameter trees stay state_dict-compatible; XLA's TPU layout assignment
re-tiles internally."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def _triple(v):
    return (v, v, v) if isinstance(v, int) else tuple(v)


# Opt-in channels-last lowering for conv2d/conv3d: logical layout flips to
# NHWC/NDHWC (weights to HWIO/DHWIO) around the convolution while params and
# activations keep torch's NCHW order at the API boundary. On TPU, XLA
# fuses the boundary transposes into neighboring elementwise ops; the MXU
# prefers the minor-most channel dimension. Toggle via
# set_conv_channels_last() or env MFAS_CONV_CHANNELS_LAST=1 (read at import).
import os as _os

CONV_CHANNELS_LAST = _os.environ.get("MFAS_CONV_CHANNELS_LAST") == "1"


def set_conv_channels_last(enabled: bool):
    global CONV_CHANNELS_LAST
    CONV_CHANNELS_LAST = bool(enabled)


# Opt-in decomposition of 3D convs into framewise 2D convs: the inflated
# ResNet's (kd in {1,3}, stride_d=1) convolutions become kd large
# batch-(N*D) 2D convolutions plus temporal shift-adds — a formulation XLA
# tiles straight onto the MXU, sidestepping its generic 3-spatial-dim conv
# lowering. Same math, same FLOPs (zero-padding waste included).
CONV3D_AS_2D = _os.environ.get("MFAS_CONV3D_AS_2D") == "1"


def set_conv3d_as_2d(enabled: bool):
    global CONV3D_AS_2D
    CONV3D_AS_2D = bool(enabled)


# 1x1x1 convs as channel matmuls (see conv3d). Default OFF: measured on
# v5e, the einsum/dot path is ~12% SLOWER end-to-end than XLA's conv
# emitter for the inflated-ResNet shapes (the huge-M, K=64 contraction is
# memory-bound and the C-minor conv layouts don't carry over) — kept as an
# opt-in for other shapes/chips.
CONV1X1_AS_MATMUL = _os.environ.get("MFAS_CONV1X1_AS_MATMUL") == "1"


def set_conv1x1_as_matmul(enabled: bool):
    global CONV1X1_AS_MATMUL
    CONV1X1_AS_MATMUL = bool(enabled)


# max_pool2d as a strided-slice maximum tree (see max_pool2d docstring):
# faster eval-mode forward, slower backward — inference opt-in.
POOL_AS_SLICES = _os.environ.get("MFAS_POOL_AS_SLICES") == "1"


def set_pool_as_slices(enabled: bool):
    global POOL_AS_SLICES
    POOL_AS_SLICES = bool(enabled)


# max_pool2d as two 1-D reduce_windows (rows then columns — exact for max:
# max over the k x k window == col-max of row-maxes). 3+3 comparisons per
# output instead of 9, and the backward is two narrow select_and_scatters
# instead of one 9-wide one. Flag-gated for A/B measurement; measured
# slightly SLOWER than the combined window on v5e (TPU_DESIGN.md §5.2),
# so it stays off. Caveat: at exactly-TIED window maxima (common after a
# ReLU zeroes several entries) the two-pass backward can route the
# gradient to a different tied element than the combined/torch path —
# values are bit-identical, gradient attribution at ties is not.
POOL_SEPARABLE = _os.environ.get("MFAS_POOL_SEPARABLE") == "1"


def set_pool_separable(enabled: bool):
    global POOL_SEPARABLE
    POOL_SEPARABLE = bool(enabled)


def _conv3d_via_2d(x, w, b, stride, padding, dilation, groups):
    """x: (N,C,D,H,W), w: (O,I/g,kd,kh,kw); requires stride_d==1,
    dilation_d==1, padding_d==kd//2 (the inflated-ResNet cases)."""
    N, C, D, H, W = x.shape
    kd = w.shape[2]
    pad_d = padding[0][0]
    xf = jnp.transpose(x, (0, 2, 1, 3, 4)).reshape(N * D, C, H, W)
    out = None
    for dt in range(kd):
        yf = conv2d(xf, w[:, :, dt], None, stride=stride[1:],
                    padding=[p[0] for p in padding[1:]],
                    dilation=dilation[1:], groups=groups)
        ND, O, Ho, Wo = yf.shape
        y = yf.reshape(N, D, O, Ho, Wo)
        s = pad_d - dt                  # out[:, t] += y[:, t - s]
        if s > 0:
            y = jnp.pad(y[:, :-s], ((0, 0), (s, 0), (0, 0), (0, 0), (0, 0)))
        elif s < 0:
            y = jnp.pad(y[:, -s:], ((0, 0), (0, -s), (0, 0), (0, 0), (0, 0)))
        out = y if out is None else out + y
    out = jnp.transpose(out, (0, 2, 1, 3, 4))
    if b is not None:
        out = out + b.reshape(1, -1, 1, 1, 1)
    return out


# --------------------------------------------------------------------------
# convolutions
# --------------------------------------------------------------------------
def conv2d(x, w, b=None, stride=1, padding=0, dilation=1, groups=1):
    """x: (N,C,H,W), w: (O,I/groups,kh,kw) — torch Conv2d semantics."""
    stride, dilation = _pair(stride), _pair(dilation)
    padding = [(p, p) for p in _pair(padding)]
    if CONV_CHANNELS_LAST:
        out = lax.conv_general_dilated(
            jnp.transpose(x, (0, 2, 3, 1)),
            jnp.transpose(w, (2, 3, 1, 0)),
            window_strides=stride,
            padding=padding,
            rhs_dilation=dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
        )
        if b is not None:
            out = out + b
        return jnp.transpose(out, (0, 3, 1, 2))
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=padding,
        rhs_dilation=dilation,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
    )
    if b is not None:
        out = out + b.reshape(1, -1, 1, 1)
    return out


def conv3d(x, w, b=None, stride=1, padding=0, dilation=1, groups=1):
    """x: (N,C,D,H,W), w: (O,I/groups,kd,kh,kw) — torch Conv3d semantics."""
    stride, dilation = _triple(stride), _triple(dilation)
    padding = [(p, p) for p in _triple(padding)]
    if (CONV1X1_AS_MATMUL and w.shape[2:] == (1, 1, 1) and groups == 1
            and all(p == (0, 0) for p in padding)):
        # A 1x1x1 conv IS a matmul over the channel dim; stride = input
        # subsampling. See the CONV1X1_AS_MATMUL note for why this is an
        # opt-in rather than the default on v5e.
        if stride != (1, 1, 1):
            x = x[:, :, ::stride[0], ::stride[1], ::stride[2]]
        out = jnp.einsum("ncdhw,oc->nodhw", x, w[:, :, 0, 0, 0])
        if b is not None:
            out = out + b.reshape(1, -1, 1, 1, 1)
        return out
    if (CONV3D_AS_2D and stride[0] == 1 and dilation[0] == 1
            and w.shape[2] % 2 == 1            # odd kd only: the framewise
            and padding[0][0] == w.shape[2] // 2):  # shift-add assumes a
        # centered SAME temporal window (even kd would change D_out)
        return _conv3d_via_2d(x, w, b, stride, padding, dilation, groups)
    if CONV_CHANNELS_LAST:
        out = lax.conv_general_dilated(
            jnp.transpose(x, (0, 2, 3, 4, 1)),
            jnp.transpose(w, (2, 3, 4, 1, 0)),
            window_strides=stride,
            padding=padding,
            rhs_dilation=dilation,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=groups,
        )
        if b is not None:
            out = out + b
        return jnp.transpose(out, (0, 4, 1, 2, 3))
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=padding,
        rhs_dilation=dilation,
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        feature_group_count=groups,
    )
    if b is not None:
        out = out + b.reshape(1, -1, 1, 1, 1)
    return out


def conv1d(x, w, b=None, stride=1, padding=0):
    """x: (N,C,L), w: (O,I,k) — torch Conv1d semantics."""
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    if b is not None:
        out = out + b.reshape(1, -1, 1)
    return out


def linear(x, w, b=None):
    """x: (..., in), w: (out, in) — torch Linear semantics."""
    out = jnp.matmul(x, w.T)
    if b is not None:
        out = out + b
    return out


# --------------------------------------------------------------------------
# pooling
# --------------------------------------------------------------------------
def max_pool2d(x, kernel_size, stride=None, padding=0):
    """Max pool in torch NCHW semantics.

    POOL_AS_SLICES (default OFF) computes small overlapping windows as a
    maximum tree over k*k strided slices instead of lax.reduce_window.
    Measured on TPU for the inflated-ResNet stem: the slice form shaves
    ~4% off the eval-mode forward (reduce-window's generic 5-D lowering +
    layout copy cost 14% of it), but its BACKWARD (9 chained max-masks)
    loses 17% on the full train step — so reduce_window stays the
    default and the slice form is an inference-path opt-in."""
    k = _pair(kernel_size)
    s = _pair(stride) if stride is not None else k
    p = _pair(padding)
    neg = (-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
           else jnp.iinfo(x.dtype).min)
    if POOL_AS_SLICES and k[0] * k[1] <= 9:
        H, W = x.shape[-2], x.shape[-1]
        if p != (0, 0):
            pad = [(0, 0)] * (x.ndim - 2) + [(p[0], p[0]), (p[1], p[1])]
            x = jnp.pad(x, pad, constant_values=neg)
            H, W = H + 2 * p[0], W + 2 * p[1]
        Ho = (H - k[0]) // s[0] + 1
        Wo = (W - k[1]) // s[1] + 1
        out = None
        for di in range(k[0]):
            for dj in range(k[1]):
                v = x[..., di:di + (Ho - 1) * s[0] + 1:s[0],
                      dj:dj + (Wo - 1) * s[1] + 1:s[1]]
                out = v if out is None else jnp.maximum(out, v)
        return out
    if POOL_SEPARABLE and k[0] > 1 and k[1] > 1:
        # exact: padding fills with the max-identity on both passes
        rows = lax.reduce_window(
            x, neg, lax.max,
            window_dimensions=(1, 1, 1, k[1]), window_strides=(1, 1, 1, s[1]),
            padding=((0, 0), (0, 0), (0, 0), (p[1], p[1])))
        return lax.reduce_window(
            rows, neg, lax.max,
            window_dimensions=(1, 1, k[0], 1), window_strides=(1, 1, s[0], 1),
            padding=((0, 0), (0, 0), (p[0], p[0]), (0, 0)))
    return lax.reduce_window(
        x, neg, lax.max,
        window_dimensions=(1, 1) + k,
        window_strides=(1, 1) + s,
        padding=((0, 0), (0, 0)) + tuple((pp, pp) for pp in p),
    )


def avg_pool2d(x, kernel_size, stride=None, padding=0, count_include_pad=True):
    k = _pair(kernel_size)
    s = _pair(stride) if stride is not None else k
    p = _pair(padding)
    summed = lax.reduce_window(
        x,
        0.0,
        lax.add,
        window_dimensions=(1, 1) + k,
        window_strides=(1, 1) + s,
        padding=((0, 0), (0, 0)) + tuple((pp, pp) for pp in p),
    )
    if count_include_pad or all(pp == 0 for pp in p):
        return summed / (k[0] * k[1])
    counts = lax.reduce_window(
        jnp.ones_like(x),
        0.0,
        lax.add,
        window_dimensions=(1, 1) + k,
        window_strides=(1, 1) + s,
        padding=((0, 0), (0, 0)) + tuple((pp, pp) for pp in p),
    )
    return summed / counts


def avg_pool3d(x, kernel_size, stride=None, padding=0):
    k = _triple(kernel_size)
    s = _triple(stride) if stride is not None else k
    p = _triple(padding)
    summed = lax.reduce_window(
        x,
        0.0,
        lax.add,
        window_dimensions=(1, 1) + k,
        window_strides=(1, 1) + s,
        padding=((0, 0), (0, 0)) + tuple((pp, pp) for pp in p),
    )
    return summed / (k[0] * k[1] * k[2])


def adaptive_avg_pool2d_1x1(x):
    """AdaptiveAvgPool2d((1,1)) on (N,C,H,W)."""
    return jnp.mean(x, axis=(2, 3), keepdims=True)


def global_avg_pool2d(x):
    """Reference GlobalPooling2D (models/auxiliary/aux_models.py:54-64):
    mean over everything after the channel dim; identity on (N,C)."""
    n, c = x.shape[0], x.shape[1]
    return jnp.mean(x.reshape(n, c, -1), axis=2)


def global_avg_pool1d(x):
    """Reference GlobalPooling1D: mean over axis 2."""
    return jnp.mean(x, axis=2)


# --------------------------------------------------------------------------
# resampling
# --------------------------------------------------------------------------
def interpolate_bilinear(x, size):
    """torch F.interpolate(..., mode='bilinear', align_corners=False) on
    (N,C,H,W) -> (N,C,*size). Half-pixel centers, no antialias."""
    n, c = x.shape[0], x.shape[1]
    return jax.image.resize(x, (n, c) + tuple(size), method="linear", antialias=False)


# --------------------------------------------------------------------------
# randomness
# --------------------------------------------------------------------------
def dropout(x, p, key):
    """torch Dropout train mode: zero with prob p, scale kept by 1/(1-p)."""
    if p <= 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - p, x.shape)
    return jnp.where(keep, x / (1.0 - p), 0.0)


def dropout2d(x, p, key):
    """torch Dropout2d train mode: zero whole channels (axis 1) on rank>=3
    inputs; element-wise on rank<=2 (feature_dropout fallback)."""
    if p <= 0.0:
        return x
    if x.ndim <= 2:
        return dropout(x, p, key)
    mask_shape = x.shape[:2] + (1,) * (x.ndim - 2)
    keep = jax.random.bernoulli(key, 1.0 - p, mask_shape)
    return jnp.where(keep, x / (1.0 - p), 0.0)


# --------------------------------------------------------------------------
# losses / metrics
# --------------------------------------------------------------------------
def cross_entropy(logits, labels, weights=None):
    """torch CrossEntropyLoss (mean reduction); ``weights`` is an optional
    per-sample 0/1 mask for padded batches (mean over valid samples)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if weights is None:
        return jnp.mean(nll)
    return jnp.sum(nll * weights) / jnp.maximum(jnp.sum(weights), 1.0)


def weighted_bce_elements(logits, targets, pos_weight, stable=False):
    """Per-element weighted BCE terms.

    stable=False reproduces the reference WeightedCrossEntropyWithLogits
    (models/auxiliary/aux_models.py:129-147) bit for bit, INCLUDING its
    overflow behavior: sigmoid saturates in float32 around |x|~90, after
    which log(0) = -inf and the 0*inf products go NaN — the reference's
    MM-IMDB trainer leans on a NaN failsafe for exactly this
    (train_searchable/mmimdb.py:110-129).

    stable=True is the algebraically identical logsumexp form
    ``pw*z*softplus(-x) + (1-z)*(x + softplus(-x))``, exact for all x.
    """
    z = targets
    if stable:
        sp = jax.nn.softplus(-logits)           # = -log(sigmoid(x)), exact
        return pos_weight * z * sp + (1.0 - z) * (logits + sp)
    x = jax.nn.sigmoid(logits)
    return pos_weight * z * -jnp.log(x) + (1.0 - z) * -jnp.log(1.0 - x)


def weighted_bce_with_logits(logits, targets, pos_weight, stable=False):
    """Mean-reduced weighted BCE (see weighted_bce_elements)."""
    return jnp.mean(weighted_bce_elements(logits, targets, pos_weight,
                                          stable=stable))


def mse(pred, target):
    return jnp.mean((pred - target) ** 2)
