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
    # is a pure fused multiply-add on the VPU (no iota/select).
    x = x_ref[:].astype(jnp.int32).astype(jnp.float32)   # (1, R, 384)
    o_ref[:] = x * scale_ref[:] + bias_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _u8_normalize_flat(x_flat, scale, bias, interpret=False):
    """x_flat: (B, L) uint8 with L % _PAD_UNIT == 0 -> (B, L) float32."""
    B, L = x_flat.shape
    rows = L // _CHAN_TILE                    # multiple of _ROW_ALIGN
    r_tile = min(rows, _MAX_ROWS)
    while rows % r_tile:
        r_tile -= _ROW_ALIGN
    x3 = x_flat.reshape(B, rows, _CHAN_TILE)
    scale_row = jnp.tile(scale, _LANE).reshape(1, _CHAN_TILE)
    bias_row = jnp.tile(bias, _LANE).reshape(1, _CHAN_TILE)
    grid = (B, rows // r_tile)
    out = pl.pallas_call(
        _u8_norm_kernel,
        out_shape=jax.ShapeDtypeStruct((B, rows, _CHAN_TILE), jnp.float32),
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
                 interpret=False):
    """(B, T, H, W, 3) uint8 -> (B, T', H, W, 3) float32, normalized.

    frame_indices: optional (T',) int array — the linspace frame pick is
    fused in front so dropped frames are never normalized."""
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
        return x_u8.astype(jnp.float32) * scale + bias

    shape = x_u8.shape
    B = shape[0]
    L = int(np.prod(shape[1:]))
    pad = (-L) % _PAD_UNIT
    x_flat = x_u8.reshape(B, L)
    if pad:
        x_flat = jnp.pad(x_flat, ((0, 0), (0, pad)))
    out = _u8_normalize_flat(x_flat, jnp.asarray(scale_np),
                             jnp.asarray(bias_np), interpret=interpret)
    if pad:
        out = out[:, :L]
    return out.reshape(shape)


def linspace_frame_indices(num_frames, out_frames):
    """The reference's NormalizeLen frame pick (datasets/ntu.py:99-102)."""
    return np.linspace(0, num_frames - 1, out_frames).astype(np.int32)
