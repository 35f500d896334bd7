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


def test_u8_normalize_bf16_out_is_one_rounding_of_f32():
    """out_dtype=bf16 must equal the f32 result cast once (the kernel keeps
    the affine in f32 and rounds only on the store) — on both paths."""
    rs = np.random.RandomState(3)
    x = rs.randint(0, 256, (2, 3, 8, 8, 3), np.uint8)
    want = u8_normalize(jnp.asarray(x), MEAN, STD,
                        use_pallas=False).astype(jnp.bfloat16)
    got_pl = u8_normalize(jnp.asarray(x), MEAN, STD, interpret=True,
                          out_dtype=jnp.bfloat16)
    got_xla = u8_normalize(jnp.asarray(x), MEAN, STD, use_pallas=False,
                           out_dtype=jnp.bfloat16)
    assert got_pl.dtype == jnp.bfloat16 and got_xla.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(got_pl, np.float32),
                                  np.asarray(want, np.float32))
    np.testing.assert_array_equal(np.asarray(got_xla, np.float32),
                                  np.asarray(want, np.float32))


def test_u8_gather_normalize_equals_gather_then_normalize():
    """Fused scalar-prefetch gather+normalize == XLA gather + u8_normalize,
    exactly (same f32 affine, same single rounding)."""
    from mfas_tpu.ops.input_kernels import (gather_normalize_supported,
                                            u8_gather_normalize)

    rs = np.random.RandomState(4)
    # (N samples, F frames, H, W, 3) with H*W*3 a multiple of the 384*8 pad
    # unit: 32*32*3 = 3072 = 384*8 exactly
    store = rs.randint(0, 256, (3, 5, 32, 32, 3), np.uint8)
    assert gather_normalize_supported(store.shape)
    sample_idx = np.array([2, 0], np.int32)
    frame_idx = np.array([[0, 2, 4], [1, 1, 3]], np.int32)

    st = jnp.asarray(store)
    gathered = st[jnp.asarray(sample_idx)[:, None], jnp.asarray(frame_idx)]
    # same kernel body + tiling -> bitwise equal to the unfused Pallas pass
    want_pl = u8_normalize(gathered, MEAN, STD, interpret=True)
    # XLA fallback may fuse the affine differently (FMA) -> tolerance
    want_xla = u8_normalize(gathered, MEAN, STD, use_pallas=False)
    for dt in (jnp.float32, jnp.bfloat16):
        got = u8_gather_normalize(st, jnp.asarray(sample_idx),
                                  jnp.asarray(frame_idx), MEAN, STD,
                                  out_dtype=dt, interpret=True)
        assert got.shape == (2, 3, 32, 32, 3) and got.dtype == dt
        np.testing.assert_array_equal(np.asarray(got, np.float32),
                                      np.asarray(want_pl.astype(dt),
                                                 np.float32))
    got32 = u8_gather_normalize(st, jnp.asarray(sample_idx),
                                jnp.asarray(frame_idx), MEAN, STD,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(got32), np.asarray(want_xla),
                               rtol=1e-5, atol=1e-5)


def test_gather_normalize_supported_gate():
    from mfas_tpu.ops.input_kernels import gather_normalize_supported

    assert gather_normalize_supported((4, 8, 32, 32, 3))      # 3072 % 3072
    assert gather_normalize_supported((4, 8, 256, 256, 3))
    assert gather_normalize_supported((4, 8, 160, 256, 3))
    assert not gather_normalize_supported((4, 8, 16, 16, 3))  # 768 < unit
    assert not gather_normalize_supported((4, 8, 32, 32, 1))  # not 3-chan


def test_resident_prep_fused_and_bf16_match_unfused(tmp_path):
    """make_resident_prep(fuse_gather=True) and compute_dtype=bf16 must
    reproduce the unfused f32 path's clips (cast once for bf16)."""
    from mfas_tpu.data.resident import make_resident_prep

    rs = np.random.RandomState(5)
    store = jnp.asarray(rs.randint(0, 256, (3, 6, 32, 32, 3), np.uint8))

    def batch():
        return {
            "_idx": jnp.asarray([1, 2], np.int32),
            "_rgb_store": store,
            "rgb_t": jnp.asarray([[0, 2, 5], [1, 3, 4]], np.int32),
            "label": jnp.asarray([0, 1], np.int32),
        }

    base = make_resident_prep(use_pallas=False, fuse_gather=False)(batch())
    # interpret mode isn't plumbed through prep; monkeypatch the kernel's
    # entry to interpret=True for the CPU test (make_resident_prep binds
    # the name at build time, so patch first, then build the preps)
    import mfas_tpu.ops.input_kernels as ik
    orig = ik.u8_gather_normalize

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    try:
        ik.u8_gather_normalize = interp
        fused = make_resident_prep(fuse_gather=True)(batch())
        bf16 = make_resident_prep(fuse_gather=True,
                                  compute_dtype="bfloat16")(batch())
    finally:
        ik.u8_gather_normalize = orig
    # fused (Pallas) vs unfused (XLA) may differ by FMA rounding only
    np.testing.assert_allclose(np.asarray(fused["rgb"]),
                               np.asarray(base["rgb"]), rtol=1e-5, atol=1e-5)
    # bf16 out == the fused f32 result rounded once (same kernel)
    assert bf16["rgb"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(bf16["rgb"], np.float32),
        np.asarray(fused["rgb"].astype(jnp.bfloat16), np.float32))


def test_packed_device_normalize_matches_host_path(tmp_path):
    """PackedNTU(device_normalize=True) raw-u8 samples, run through the
    search-path inputs prep, equal the host-normalized samples — the
    north-star input path covers the search vertical too."""
    import types

    from mfas_tpu.data.ntu_pack import (PackedNTU,
                                        make_device_normalize_inputs_prep,
                                        make_synthetic_packed_ntu)

    make_synthetic_packed_ntu(str(tmp_path), n=4, frames=4, h=16, w=16)
    args = types.SimpleNamespace(modality="both", no_norm=False)
    host = PackedNTU(str(tmp_path), args=args)
    dev = PackedNTU(str(tmp_path), args=args, device_normalize=True)

    prep = make_device_normalize_inputs_prep(use_pallas=False)
    for i in range(2):
        a = host[i]
        b = dev[i]
        assert b["rgb"].dtype == np.uint8
        rgb_dev, ske_dev = prep((jnp.asarray(b["rgb"][None]),
                                 jnp.asarray(b["ske"][None])))
        np.testing.assert_allclose(np.asarray(rgb_dev[0]), a["rgb"],
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(ske_dev[0]), a["ske"])


def test_searcher_wires_input_prep_for_device_normalize(tmp_path):
    """NTUSearcher(--packed_datadir --device_input_normalize) must hand the
    fused prep to the population trainer (VERDICT r1 item 10)."""
    import os
    import types

    from mfas_tpu.data.ntu_pack import make_synthetic_packed_ntu
    from mfas_tpu.search.searchers import NTUSearcher

    for split in ("trainexp", "dev"):
        make_synthetic_packed_ntu(os.path.join(str(tmp_path), split), n=4,
                                  frames=4, h=16, w=16)
    args = types.SimpleNamespace(
        num_outputs=60, vid_len=(2, 32), drpt=0.0,
        inner_representation_size=8, multitask=False, alphas=False,
        batchnorm=False, batchsize=2, num_workers=1,
        max_progression_levels=2, packed_datadir=str(tmp_path),
        datadir="", checkpointdir=str(tmp_path), ske_cp="x", rgb_cp="y",
        random_backbones=True, device_input_normalize=True,
        modality="both", no_norm=False, verbose=False)
    s = NTUSearcher(args)
    assert s.train_fn.trainer.input_prep is not None
    assert s.train_fn.sequential_fallback.batch_prep is not None
    assert s.dataloaders["train"].dataset.device_normalize

    args.device_input_normalize = False
    s2 = NTUSearcher(args)
    assert s2.train_fn.trainer.input_prep is None
