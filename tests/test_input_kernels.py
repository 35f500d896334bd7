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
