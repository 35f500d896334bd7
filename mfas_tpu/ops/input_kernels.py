"""Fused device-side input kernels (BASELINE.json north star: "clip
decode/crop/normalize ... become fused XLA/Pallas input kernels feeding
HBM-resident batches").

The host ships raw uint8 clips (4x less host->device traffic than float32);
one Pallas pass on the VPU does uint8 -> float32 with the fused
(x/255 - mean)/std per-channel affine, reading each byte from HBM exactly
once. Temporal frame selection (the NormalizeLen linspace pick,
datasets/ntu.py:99-102) happens as an XLA gather before the kernel so only
selected frames are normalized.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_CHAN_TILE = 3 * _LANE          # last-dim width: channel phase aligns per row
_ROW_ALIGN = 8                  # sublane divisibility requirement
_PAD_UNIT = _CHAN_TILE * _ROW_ALIGN
# 2048*384 elems: ~3 MB f32 out + 0.75 MB u8 in per block; Mosaic double-
# buffers both for pipelining, so the true VMEM footprint is ~2x — 4096
# rows would sit at ~15 of 16 MiB with no headroom
_MAX_ROWS = 2048


def _affine_from_stats(mean, std):
    """(x/255 - mean)/std == x * scale + bias."""
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    scale = 1.0 / (255.0 * std)
    bias = -mean / std
    return scale, bias


def _u8_norm_kernel(x_ref, scale_ref, bias_ref, o_ref):
    # Mosaic can't cast u8 -> f32 directly; widen to i32 first. The
    # per-channel affine arrives pre-tiled to the 384-lane row so the body
    # is a pure fused multiply-add on the VPU (no iota/select). The affine
    # always runs in f32; a reduced output dtype rounds ONCE on the store —
    # bit-identical to casting the f32 result (tests/test_input_kernels.py).
    x = x_ref[:].astype(jnp.int32).astype(jnp.float32)   # (1, R, 384)
    o_ref[:] = (x * scale_ref[:] + bias_ref[:]).astype(o_ref.dtype)


def _row_tile(rows, align):
    r_tile = min(rows, _MAX_ROWS)
    while rows % r_tile:
        r_tile -= align
    return r_tile


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def _u8_normalize_flat(x_flat, scale, bias, out_dtype=jnp.float32,
                       interpret=False):
    """x_flat: (B, L) uint8 with L % _PAD_UNIT == 0 -> (B, L) out_dtype."""
    B, L = x_flat.shape
    rows = L // _CHAN_TILE                    # multiple of _ROW_ALIGN
    r_tile = _row_tile(rows, _ROW_ALIGN)
    x3 = x_flat.reshape(B, rows, _CHAN_TILE)
    scale_row = jnp.tile(scale, _LANE).reshape(1, _CHAN_TILE)
    bias_row = jnp.tile(bias, _LANE).reshape(1, _CHAN_TILE)
    grid = (B, rows // r_tile)
    out = pl.pallas_call(
        _u8_norm_kernel,
        out_shape=jax.ShapeDtypeStruct((B, rows, _CHAN_TILE), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, r_tile, _CHAN_TILE), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _CHAN_TILE), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _CHAN_TILE), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r_tile, _CHAN_TILE), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x3, scale_row, bias_row)
    return out.reshape(B, L)


def u8_normalize(x_u8, mean, std, frame_indices=None, use_pallas=True,
                 out_dtype=jnp.float32, interpret=False):
    """(B, T, H, W, 3) uint8 -> (B, T', H, W, 3) out_dtype, normalized.

    frame_indices: optional (T',) int array — the linspace frame pick is
    fused in front so dropped frames are never normalized.

    out_dtype: the affine always runs in f32; a reduced dtype (bf16 for
    mixed-precision steps) rounds once on the store — identical to casting
    the f32 result, but the f32 intermediate never touches HBM (it is 4x
    the uint8 input; on a memory-bound input path that write+read-back is
    the dominant cost, docs/TPU_DESIGN.md §5.4)."""
    if np.size(mean) != 3 or np.size(std) != 3 or x_u8.shape[-1] != 3:
        raise ValueError(
            "u8_normalize's Pallas tiling is specialized to 3 channels "
            f"(got stats of size {np.size(mean)}/{np.size(std)}, input "
            f"trailing dim {x_u8.shape[-1]})")
    scale_np, bias_np = _affine_from_stats(mean, std)
    if frame_indices is not None:
        x_u8 = jnp.take(x_u8, jnp.asarray(frame_indices), axis=1)

    if not use_pallas:
        scale = jnp.asarray(scale_np)
        bias = jnp.asarray(bias_np)
        return (x_u8.astype(jnp.float32) * scale + bias).astype(out_dtype)

    shape = x_u8.shape
    B = shape[0]
    L = int(np.prod(shape[1:]))
    pad = (-L) % _PAD_UNIT
    x_flat = x_u8.reshape(B, L)
    if pad:
        x_flat = jnp.pad(x_flat, ((0, 0), (0, pad)))
    out = _u8_normalize_flat(x_flat, jnp.asarray(scale_np),
                             jnp.asarray(bias_np),
                             out_dtype=jnp.dtype(out_dtype),
                             interpret=interpret)
    if pad:
        out = out[:, :L]
    return out.reshape(shape)


# ---------------------------------------------------------------------------
# fused gather + normalize: batches straight out of the HBM-resident store
# ---------------------------------------------------------------------------
def _u8_gather_norm_kernel(fidx_ref, x_ref, scale_ref, bias_ref, o_ref):
    del fidx_ref   # consumed by the index_map (scalar prefetch), not the body
    x = x_ref[:].astype(jnp.int32).astype(jnp.float32)
    o_ref[:] = (x * scale_ref[:] + bias_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def _u8_gather_normalize_flat(store3, fidx, scale, bias,
                              out_dtype=jnp.float32, interpret=False):
    """store3: (NF, rows, 384) uint8; fidx: (M,) i32 frame indices into the
    leading axis -> (M, rows, 384) out_dtype, normalized.

    Scalar-prefetch gather: fidx is prefetched to SMEM and the input
    index_map picks block (fidx[i], k, 0) — each selected frame's bytes
    stream HBM->VMEM once, the affine runs on the VPU, and only the
    normalized output is written. The gathered uint8 intermediate of the
    unfused path (XLA gather materializes it in HBM, the normalize reads
    it back) never exists."""
    NF, rows, C = store3.shape
    M = int(fidx.shape[0])
    r_tile = _row_tile(rows, _ROW_ALIGN)
    scale_row = jnp.tile(scale, _LANE).reshape(1, C)
    bias_row = jnp.tile(bias, _LANE).reshape(1, C)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M, rows // r_tile),
        in_specs=[
            pl.BlockSpec((1, r_tile, C),
                         lambda i, k, fidx: (fidx[i], k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, k, fidx: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, k, fidx: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r_tile, C),
                               lambda i, k, fidx: (i, k, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _u8_gather_norm_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, rows, C), out_dtype),
        interpret=interpret,
    )(fidx, store3, scale_row, bias_row)


def gather_normalize_supported(store_shape):
    """True when the resident store's per-frame byte count fits the fused
    kernel's tiling (L == H*W*3 divisible by the 384x8 pad unit — every
    standard vid_dim does: 256/224/160x256 all divide exactly). Callers
    fall back to gather + u8_normalize otherwise."""
    L = int(np.prod(store_shape[2:]))
    return store_shape[-1] == 3 and L % _PAD_UNIT == 0


def u8_gather_normalize(store_u8, sample_idx, frame_idx, mean, std,
                        out_dtype=jnp.float32, interpret=False):
    """Fused resident-store batch read: (N, F, H, W, 3) uint8 store,
    (B,) sample indices, (B, T) per-sample frame picks ->
    (B, T, H, W, 3) out_dtype — equal to
    ``u8_normalize(store[sample_idx[:, None], frame_idx])`` cast to
    out_dtype, with neither the gathered uint8 clip nor the f32
    intermediate ever materialized in HBM.

    Requires ``gather_normalize_supported(store_u8.shape)``; the store is
    viewed as (N*F, rows, 384) — a contiguous bitcast, no copy."""
    if not gather_normalize_supported(store_u8.shape):
        raise ValueError(
            f"store shape {store_u8.shape} doesn't fit the fused tiling "
            f"(H*W*3 must divide {_PAD_UNIT}); use gather + u8_normalize")
    scale_np, bias_np = _affine_from_stats(mean, std)
    N, F = store_u8.shape[:2]
    frame_shape = store_u8.shape[2:]
    L = int(np.prod(frame_shape))
    store3 = store_u8.reshape(N * F, L // _CHAN_TILE, _CHAN_TILE)
    B, T = frame_idx.shape
    fidx = (sample_idx.astype(jnp.int32)[:, None] * F
            + frame_idx.astype(jnp.int32)).reshape(-1)
    out = _u8_gather_normalize_flat(store3, fidx, jnp.asarray(scale_np),
                                    jnp.asarray(bias_np),
                                    out_dtype=jnp.dtype(out_dtype),
                                    interpret=interpret)
    return out.reshape((B, T) + frame_shape)


def linspace_frame_indices(num_frames, out_frames):
    """The reference's NormalizeLen frame pick (datasets/ntu.py:99-102)."""
    return np.linspace(0, num_frames - 1, out_frames).astype(np.int32)
