"""Native C++ IO kernels vs their numpy/python oracles."""

import os

import numpy as np
import pytest

from mfas_tpu.data import native
from mfas_tpu.data import ntu as dntu


def make_skeleton_file(path, num_frames=5, persons=2):
    rs = np.random.RandomState(0)
    lines = [str(num_frames)]
    vals = rs.randn(num_frames, persons, 25, 3).astype(np.float32)
    for t in range(num_frames):
        lines.append(str(persons))
        for p in range(persons):
            lines.append("pid 0 0 0 0 0 0 0 0 1")
            lines.append("25")
            for j in range(25):
                x, y, z = vals[t, p, j]
                lines.append(f"{x:.6f} {y:.6f} {z:.6f} 0 0 0 0 0 0 0 0 2")
    path.write_text("\n".join(lines) + "\n")
    return vals


def test_native_lib_builds():
    lib = native.get_lib()
    assert lib is not None, "C++ toolchain present in image; build must work"


def test_cpp_skeleton_parser_matches_python(tmp_path):
    p = tmp_path / "S001C001P001R001A001.skeleton"
    make_skeleton_file(p, num_frames=7)

    want = dntu.get_3D_skeleton(str(p))
    got, n = native.parse_skeleton(str(p), max_frames=7)
    assert n == 7
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_cpp_parser_single_person_and_truncation(tmp_path):
    p = tmp_path / "one.skeleton"
    make_skeleton_file(p, num_frames=10, persons=1)
    got, n = native.parse_skeleton(str(p), max_frames=4)
    assert n == 10
    assert got.shape == (3, 4, 25, 2)
    assert np.all(got[:, :, :, 1] == 0)  # absent person


def test_gather_normalize_u8_matches_numpy():
    rs = np.random.RandomState(0)
    base = rs.randint(0, 256, (10, 4, 6, 3), np.uint8)
    idx = np.array([3, 0, 7, 7])
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    got = native.gather_normalize_u8(base, idx, mean, std, num_threads=3)
    want = (base[idx].astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_gather_f32_matches_numpy():
    rs = np.random.RandomState(1)
    base = rs.randn(8, 5, 2).astype(np.float32)
    idx = np.array([7, 1, 1, 0])
    got = native.gather_f32(base, idx, num_threads=2)
    np.testing.assert_array_equal(got, base[idx])


def test_device_normalize_path_matches_host_path(tmp_path):
    """PackedNTU(device_normalize=True) + the in-graph prep must produce
    the same normalized clip as the host C++ path."""
    cv2 = pytest.importorskip("cv2")
    import types
    import jax.numpy as jnp
    from mfas_tpu.data.ntu_pack import (PackedNTU, make_device_normalize_prep,
                                        pack_ntu)

    rgb_dir = tmp_path / "nturgbd_rgb" / "avi_256x256_30"
    ske_dir = tmp_path / "nturgbd_skeletons"
    rgb_dir.mkdir(parents=True)
    ske_dir.mkdir(parents=True)
    name = "S001C001P001R001A001"
    vw = cv2.VideoWriter(str(rgb_dir / f"{name}_rgb.avi"),
                         cv2.VideoWriter_fourcc(*"MJPG"), 30, (32, 32))
    rs = np.random.RandomState(0)
    for _ in range(12):
        vw.write(rs.randint(0, 255, (32, 32, 3), np.uint8))
    vw.release()
    make_skeleton_file(ske_dir / f"{name}.skeleton", num_frames=12)

    args = types.SimpleNamespace(modality="both", no_norm=False,
                                 no_bad_skel=False)
    out = tmp_path / "packed"
    pack_ntu(str(tmp_path), str(out), "train", args=args, frames=8,
             max_skel_frames=32, verbose=False)

    tfm = dntu.Compose([dntu.NormalizeLen((4, 16))])
    host = PackedNTU(str(out), transform=tfm, args=args)[0]
    dev = PackedNTU(str(out), transform=tfm, args=args,
                    device_normalize=True)[0]
    assert dev["rgb"].dtype == np.uint8

    prep = make_device_normalize_prep(use_pallas=False)  # XLA math on CPU
    got = np.asarray(prep({"rgb": jnp.asarray(dev["rgb"][None])})["rgb"][0])
    np.testing.assert_allclose(got, host["rgb"], rtol=1e-5, atol=1e-5)


def test_packed_ntu_roundtrip(tmp_path):
    cv2 = pytest.importorskip("cv2")
    import types
    from mfas_tpu.data.ntu_pack import PackedNTU, pack_ntu

    # build a tiny raw NTU layout (one train subject)
    rgb_dir = tmp_path / "nturgbd_rgb" / "avi_256x256_30"
    ske_dir = tmp_path / "nturgbd_skeletons"
    rgb_dir.mkdir(parents=True)
    ske_dir.mkdir(parents=True)
    for name, nfr in (("S001C001P001R001A001", 30),
                      ("S001C001P001R001A002", 26)):
        vw = cv2.VideoWriter(str(rgb_dir / f"{name}_rgb.avi"),
                             cv2.VideoWriter_fourcc(*"MJPG"), 30, (32, 32))
        for t in range(nfr):
            vw.write(np.full((32, 32, 3), (t * 7) % 255, np.uint8))
        vw.release()
        make_skeleton_file(ske_dir / f"{name}.skeleton", num_frames=nfr)

    args = types.SimpleNamespace(modality="both", no_norm=False,
                                 no_bad_skel=False)
    out = tmp_path / "packed"
    n = pack_ntu(str(tmp_path), str(out), "train", args=args, frames=8,
                 max_skel_frames=64, verbose=False)
    assert n == 2

    tfm = dntu.Compose([dntu.NormalizeLen((4, 16))])
    ds = PackedNTU(str(out), transform=tfm, args=args)
    s = ds[0]
    assert s["rgb"].shape == (4, 32, 32, 3)
    assert s["ske"].shape == (3, 16, 25, 2)
    assert s["label"] in (0, 1)
    # skeleton was centered on joint 2 of person 1
    # (applied before NormalizeLen interp; values finite)
    assert np.isfinite(s["ske"]).all()


def test_parse_skeleton_rejects_truncated_file(tmp_path):
    """A file cut off mid-frame must raise, not parse into silent zeros
    (the Python oracle raises on the same input)."""
    import pytest
    from mfas_tpu.data import native

    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    good = (
        "2\n"
        "1\n"
        "0 0 0 0 0 0 0 0 0 0\n"
        "25\n" + "0.1 0.2 0.3 0 0 0 0 0 0 0 0 0\n" * 25
    )
    # second frame declared but missing -> truncated
    f = tmp_path / "trunc.skeleton"
    f.write_text(good)
    with pytest.raises(IOError):
        native.parse_skeleton(str(f), 8)
