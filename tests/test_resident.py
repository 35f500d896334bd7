"""HBM-resident dataset path (data/resident.py): the device-side
gather + temporal-resample + normalize pipeline must reproduce the
streaming MapLoader+PackedNTU path sample-for-sample — same shuffle
order, same augmentation draws, same values (float association aside)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mfas_tpu.data import ntu as d
from mfas_tpu.data.loader import MapLoader
from mfas_tpu.data.ntu_pack import PackedNTU, make_synthetic_packed_ntu
from mfas_tpu.data.resident import (ResidentLoader, ResidentNTUStore,
                                    make_resident_prep, plan_temporal)

N, FRAMES, H, W, SKEL = 10, 6, 16, 16, 80
VID_LEN = (4, 16)


def _pack(tmp_path, name="pack"):
    out = str(tmp_path / name)
    make_synthetic_packed_ntu(out, n=N, frames=FRAMES, h=H, w=W,
                              skel_frames=SKEL, num_classes=5, seed=3)
    # vary the true skeleton lengths (the synthetic store writes them all
    # equal); exercises per-sample interp windows incl. the <64 clamp
    lens = np.random.RandomState(7).randint(SKEL // 2, SKEL + 1,
                                            N).astype(np.int32)
    np.save(f"{out}/ske_len.npy", lens)
    return out


def _tfms():
    return {
        "val": d.Compose([d.NormalizeLen(VID_LEN)]),
        "train": d.Compose([d.AugCrop(), d.NormalizeLen(VID_LEN)]),
    }


# ---------------------------------------------------------------------------
# planner: index plan reconstructs the host transform output exactly
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("kind", ["val", "train"])
def test_plan_temporal_reconstructs_host_transform(kind):
    rs = np.random.RandomState(0)
    rgb = rs.randint(0, 256, (FRAMES, H, W, 3)).astype(np.float32)
    L = 70
    ske = rs.randn(3, L, 25, 2).astype(np.float32)
    tfm = _tfms()[kind]

    host = tfm({"rgb": rgb, "ske": ske, "label": 0},
               rng=np.random.RandomState(11))
    plan = plan_temporal(tfm, FRAMES, L, rng=np.random.RandomState(11))

    # rgb: pure gather -> bit-identical
    np.testing.assert_array_equal(host["rgb"], rgb[plan["rgb_t"]])
    # ske: same lo/hi/w plan -> identical lerp
    lo, hi, w = plan["ske_lo"], plan["ske_hi"], plan["ske_w"]
    lerp = (ske[:, lo] * (1.0 - w)[None, :, None, None]
            + ske[:, hi] * w[None, :, None, None])
    np.testing.assert_allclose(host["ske"], lerp, rtol=1e-6, atol=1e-6)


def test_plan_temporal_rejects_chain_without_normalize_len():
    with pytest.raises(ValueError):
        plan_temporal(d.Compose([d.AugCrop()]), FRAMES, SKEL,
                      rng=np.random.RandomState(0))


# ---------------------------------------------------------------------------
# end to end: resident device batches == streaming host batches
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("kind,shuffle", [("val", False), ("train", True)])
def test_resident_matches_streaming_loader(tmp_path, kind, shuffle):
    pack = _pack(tmp_path)
    tfm = _tfms()[kind]
    B = 4  # 10 samples -> last batch exercises pad+mask

    host_loader = MapLoader(PackedNTU(pack, transform=tfm), B,
                            shuffle=shuffle, seed=5, deterministic=True)
    res_loader = ResidentLoader(ResidentNTUStore(pack), B, transform=tfm,
                                shuffle=shuffle, seed=5)
    prep = jax.jit(make_resident_prep())

    for epoch in range(2):   # epoch 2 pins identical RNG stream evolution
        host_batches = list(host_loader)
        res_batches = list(res_loader)
        assert len(host_batches) == len(res_batches) == 3
        for hb, rb in zip(host_batches, res_batches):
            got = prep({k: v if isinstance(v, jax.Array) else jnp.asarray(v)
                        for k, v in rb.items()})
            np.testing.assert_array_equal(hb["label"], np.asarray(got["label"]))
            np.testing.assert_array_equal(hb["_mask"], np.asarray(got["_mask"]))
            assert got["rgb"].shape == hb["rgb"].shape
            np.testing.assert_allclose(hb["rgb"], np.asarray(got["rgb"]),
                                       rtol=1e-5, atol=1e-5)
            assert got["ske"].shape == hb["ske"].shape
            np.testing.assert_allclose(hb["ske"], np.asarray(got["ske"]),
                                       rtol=1e-5, atol=1e-5)


def test_resident_modality_sentinels(tmp_path):
    """rgb-/skeleton-only stores ship the (B,1) zero sentinel for the
    missing modality, like PackedNTU samples do."""
    pack = _pack(tmp_path)

    class A:
        modality = "skeleton"
        no_norm = False

    store = ResidentNTUStore(pack, args=A())
    assert store.rgb_dev is None
    loader = ResidentLoader(store, 4, transform=_tfms()["val"])
    batch = next(iter(loader))
    assert "rgb_t" not in batch
    got = jax.jit(make_resident_prep())(
        {k: v if isinstance(v, jax.Array) else jnp.asarray(v)
         for k, v in batch.items()})
    assert got["rgb"].shape == (4, 1)
    assert got["ske"].shape == (4, 3, VID_LEN[1], 25, 2)


# ---------------------------------------------------------------------------
# mesh: replicated and sample-axis-sharded stores
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("shard", [False, True],
                         ids=["replicated", "sharded_store"])
def test_resident_under_mesh_matches_single_device(tmp_path, shard):
    from mfas_tpu.engine.classifier import place_batch
    from mfas_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    pack = _pack(tmp_path)
    tfm = _tfms()["train"]
    B = 8
    prep = jax.jit(make_resident_prep())

    single = list(ResidentLoader(ResidentNTUStore(pack), B, transform=tfm,
                                 shuffle=True, seed=9))
    ref = [prep({k: v if isinstance(v, jax.Array) else jnp.asarray(v)
                 for k, v in b.items()}) for b in single]

    mesh = make_mesh(8)
    loader = ResidentLoader(ResidentNTUStore(pack, mesh=mesh, shard=shard),
                            B, transform=tfm, shuffle=True, seed=9)
    for want, batch in zip(ref, loader):
        store_leaves = {k: v for k, v in batch.items()
                        if isinstance(v, jax.Array)}
        placed = place_batch(batch, mesh)
        for k, v in store_leaves.items():
            assert placed[k] is v, f"{k} was re-placed"
        got = prep(placed)
        np.testing.assert_allclose(np.asarray(want["rgb"]),
                                   np.asarray(got["rgb"]), rtol=1e-6,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(want["ske"]),
                                   np.asarray(got["ske"]), rtol=1e-6,
                                   atol=1e-6)


# ---------------------------------------------------------------------------
# CLI: found-NTU end to end on the resident path
# ---------------------------------------------------------------------------
@pytest.mark.slow
def test_main_found_ntu_hbm_resident(tmp_path, monkeypatch, capsys):
    import sys

    import main_found_ntu as m

    for split in ("train", "dev", "test"):
        make_synthetic_packed_ntu(str(tmp_path / "packed" / split), n=6,
                                  frames=4, h=32, w=32, skel_frames=64,
                                  num_classes=3, seed=hash(split) % 1000)
    monkeypatch.setattr(sys, "argv", [
        "main_found_ntu.py",
        "--datadir", str(tmp_path), "--checkpointdir", str(tmp_path),
        "--packed_datadir", str(tmp_path / "packed"), "--hbm_resident",
        "--conf", "4", "--num_outputs", "3", "--batchsize", "3",
        "--epochs", "1", "--inner_representation_size", "8",
        "--vid_len", "2", "32", "--vid_dim", "32",
        # shrunken backbone: this pins the resident input path (plans,
        # gather, fused normalize), not the backbone scale
        "--resnet3d_layers", "1", "1", "1", "1",
        "--resnet3d_base_width", "16",
        "--random_backbones", "--no-verbose",
    ])
    m.main()
    assert "Model Acc:" in capsys.readouterr().out
