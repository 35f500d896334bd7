"""Fused input-normalize kernel: Pallas (interpret mode on CPU) vs numpy."""

import numpy as np

import jax.numpy as jnp

from mfas_tpu.ops.input_kernels import (linspace_frame_indices, u8_normalize)

MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)


def reference_normalize(x_u8):
    x = x_u8.astype(np.float32) / 255.0
    return (x - MEAN) / STD


def test_u8_normalize_pallas_interpret_matches_numpy():
    rs = np.random.RandomState(0)
    x = rs.randint(0, 256, (2, 3, 8, 8, 3), np.uint8)
    got = np.asarray(u8_normalize(jnp.asarray(x), MEAN, STD, interpret=True))
    np.testing.assert_allclose(got, reference_normalize(x), rtol=1e-5,
                               atol=1e-5)


def test_u8_normalize_xla_fallback_matches():
    rs = np.random.RandomState(1)
    x = rs.randint(0, 256, (2, 4, 6, 6, 3), np.uint8)
    got = np.asarray(u8_normalize(jnp.asarray(x), MEAN, STD, use_pallas=False))
    np.testing.assert_allclose(got, reference_normalize(x), rtol=1e-5,
                               atol=1e-5)


def test_frame_selection_fused():
    rs = np.random.RandomState(2)
    x = rs.randint(0, 256, (1, 10, 4, 4, 3), np.uint8)
    idx = linspace_frame_indices(10, 4)
    np.testing.assert_array_equal(idx, np.linspace(0, 9, 4).astype(int))
    got = np.asarray(u8_normalize(jnp.asarray(x), MEAN, STD,
                                  frame_indices=idx, interpret=True))
    want = reference_normalize(x[:, idx])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
