"""Data-layer tests: parsers, transforms, loaders (SURVEY.md §4.3/§4.5)."""


import numpy as np
import pytest

from mfas_tpu.data import ntu as dntu
from mfas_tpu.data.avmnist import load_avmnist_arrays, make_synthetic_avmnist
from mfas_tpu.data.mm_imdb import (MM_IMDB, MMIMDBLoader, make_synthetic_mmimdb,
                                   samples_f1)


def test_interpolate_skeleton_time_matches_torch(tmp_path):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as TF

    rs = np.random.RandomState(0)
    skel = rs.randn(3, 50, 25, 2).astype(np.float32)
    got = dntu.interpolate_skeleton_time(skel, 32)

    # reference path (datasets/ntu.py:112-119): channels C*V*M over time
    C, T, V, M = skel.shape
    data = torch.tensor(skel).permute(0, 2, 3, 1).contiguous().view(C * V * M, T)
    data = data[None, :, :, None]
    data = TF.interpolate(data, size=(32, 1), mode="bilinear",
                          align_corners=False).squeeze(3).squeeze(0)
    want = data.view(C, V, M, 32).permute(0, 3, 1, 2).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_skeleton_parser_golden(tmp_path):
    # 2 frames; frame0: 1 person, frame1: 2 persons
    lines = ["2"]
    lines.append("1")
    lines.append("pid 0 0 0 0 0 0 0 0 1")  # person info
    lines.append("25")                      # joint count
    for j in range(25):
        lines.append(f"{j * 0.1:.3f} {j * 0.2:.3f} {j * 0.3:.3f} 0 0 0 0 0 0 0 0 2")
    lines.append("2")
    for p in range(2):
        lines.append("pid 0 0 0 0 0 0 0 0 1")
        lines.append("25")
        for j in range(25):
            v = (p + 1) * 1.0
            lines.append(f"{v} {v} {v} 0 0 0 0 0 0 0 0 2")
    path = tmp_path / "S001C001P001R001A001.skeleton"
    path.write_text("\n".join(lines) + "\n")

    out = dntu.get_3D_skeleton(str(path))
    assert out.shape == (3, 2, 25, 2)
    assert out[0, 0, 3, 0] == pytest.approx(0.3, abs=1e-6)
    assert out[1, 0, 3, 1] == 0.0            # absent person zeroed
    assert out[0, 1, 0, 0] == 1.0 and out[0, 1, 0, 1] == 2.0


def test_skeleton_normalization_centers_on_joint2_of_person1():
    skel = np.random.RandomState(1).randn(3, 4, 25, 2).astype(np.float32)
    _, normed = dntu.normalize_modalities(np.zeros([1], np.float32), skel,
                                          modality="skeleton")
    np.testing.assert_allclose(normed[:, :, 1, 0], 0.0, atol=1e-6)


def test_augcrop_and_normalizelen_shapes():
    rs = np.random.RandomState(0)
    sample = {"rgb": rs.rand(30, 16, 16, 3).astype(np.float32),
              "ske": rs.randn(3, 100, 25, 2).astype(np.float32),
              "label": 5}
    aug = dntu.AugCrop(seed=3)
    out = aug(sample)
    assert out["ske"].shape[1] >= 64
    norm = dntu.NormalizeLen((8, 32))
    out = norm(out)
    assert out["rgb"].shape[0] == 8
    assert out["ske"].shape == (3, 32, 25, 2)
    cc = dntu.CenterCrop(0.9)
    out2 = cc(sample)
    # same int-truncation arithmetic as the reference (datasets/ntu.py:133-135)
    bias = int((1 - 0.9) * 100 / 2)
    assert out2["ske"].shape[1] == 100 - 2 * bias


def test_ntu_dataset_end_to_end(tmp_path):
    cv2 = pytest.importorskip("cv2")
    import types

    rgb_dir = tmp_path / "nturgbd_rgb" / "avi_256x256_30"
    ske_dir = tmp_path / "nturgbd_skeletons"
    rgb_dir.mkdir(parents=True)
    ske_dir.mkdir(parents=True)

    # two samples: subject 1 (train) and subject 2 (dev), labels A001/A002
    names = [("S001C001P001R001A001", 10), ("S001C001P002R001A002", 12)]
    for name, nframes in names:
        vw = cv2.VideoWriter(str(rgb_dir / f"{name}_rgb.avi"),
                             cv2.VideoWriter_fourcc(*"MJPG"), 30, (32, 32))
        for t in range(nframes):
            vw.write(np.full((32, 32, 3), t * 10, np.uint8))
        vw.release()
        lines = [str(nframes)]
        for _ in range(nframes):
            lines.append("1")
            lines.append("pid 0 0 0 0 0 0 0 0 1")
            lines.append("25")
            for j in range(25):
                lines.append("0.5 0.5 0.5 0 0 0 0 0 0 0 0 2")
        (ske_dir / f"{name}.skeleton").write_text("\n".join(lines) + "\n")

    # filename parsing: subject = name[9:12] -> P001/P002; label name[17:20]
    args = types.SimpleNamespace(modality="both", no_norm=False,
                                 no_bad_skel=False)
    tfm = dntu.Compose([dntu.NormalizeLen((4, 16))])
    ds = dntu.NTU(str(tmp_path), transform=tfm, stage="train", args=args)
    assert len(ds) == 1
    sample = ds[0]
    assert sample["rgb"].shape == (4, 32, 32, 3)
    assert sample["ske"].shape == (3, 16, 25, 2)
    assert sample["label"] == 0  # A001 -> label 1 -> zero-based 0

    dev = dntu.NTU(str(tmp_path), transform=tfm, stage="dev", args=args)
    assert len(dev) == 1 and dev[0]["label"] == 1


def test_ntu_pairs_by_stem_not_position(tmp_path, capsys):
    """A video without a matching .skeleton must be DROPPED (with a
    warning), not positionally cross-paired: the official skeleton
    release omits 302 clips the RGB release has, and sorted-position
    zipping (the reference's scheme) silently pairs every later video
    with the wrong skeleton."""
    cv2 = pytest.importorskip("cv2")
    import types

    rgb_dir = tmp_path / "nturgbd_rgb" / "avi_256x256_30"
    ske_dir = tmp_path / "nturgbd_skeletons"
    rgb_dir.mkdir(parents=True)
    ske_dir.mkdir(parents=True)

    # three train-subject clips; the FIRST one's skeleton is missing, so
    # positional pairing would shift every later pair by one
    names = ["S001C001P001R001A001", "S001C001P001R001A002",
             "S001C001P001R001A003"]
    for name in names:
        vw = cv2.VideoWriter(str(rgb_dir / f"{name}_rgb.avi"),
                             cv2.VideoWriter_fourcc(*"MJPG"), 30, (32, 32))
        for t in range(8):
            vw.write(np.full((32, 32, 3), t * 10, np.uint8))
        vw.release()
    for name in names[1:]:                      # skeletons: A002, A003 only
        lines = ["8"]
        for _ in range(8):
            lines += ["1", "pid 0 0 0 0 0 0 0 0 1", "25"]
            lines += ["0.5 0.5 0.5 0 0 0 0 0 0 0 0 2"] * 25
        (ske_dir / f"{name}.skeleton").write_text("\n".join(lines) + "\n")

    args = types.SimpleNamespace(modality="both", no_norm=False,
                                 no_bad_skel=False)
    ds = dntu.NTU(str(tmp_path), transform=None, stage="train", args=args)
    assert "no .skeleton pair" in capsys.readouterr().out
    assert len(ds) == 2                          # A001 dropped, not shifted
    assert sorted(ds.labels) == [2, 3]           # raw A-ids of the survivors
    for r, s in zip(ds.rgb_list, ds.ske_list):   # stems really agree
        import os as _os
        assert _os.path.basename(r)[:20] == _os.path.basename(s)[:20]


def test_avmnist_disk_roundtrip(tmp_path):
    make_synthetic_avmnist(str(tmp_path), n_train=16, n_test=8)
    arrays = load_avmnist_arrays(str(tmp_path), "train")
    assert arrays["image"].shape == (16, 1, 28, 28)
    assert arrays["audio"].shape == (16, 1, 112, 112)
    assert arrays["label"].shape == (16,)
    # normalization applied
    assert abs(float(arrays["image"].mean())) < 5.0


def test_mmimdb_transforms():
    from mfas_tpu.data.mm_imdb import Normalize, RandomModalityMuting
    rs = np.random.RandomState(0)
    sample = {"image": rs.rand(3, 8, 8).astype(np.float32),
              "text": rs.randn(5, 10).astype(np.float32),
              "label": np.ones(4, np.float32), "textlen": 5}
    out = Normalize((0.5, 0.5, 0.5), (0.25, 0.25, 0.25))(sample)
    np.testing.assert_allclose(out["image"], (sample["image"] - 0.5) / 0.25,
                               rtol=1e-6)
    mute = RandomModalityMuting(p_muting=1.0, seed=0)
    muted = mute(sample)
    assert (np.all(muted["image"] == 0)) != (np.all(muted["text"] == 0))


def test_mmimdb_loader_padding_and_f1(tmp_path):
    sklearn = pytest.importorskip("sklearn.metrics")
    n = make_synthetic_mmimdb(str(tmp_path), "train", n=10)
    ds = MM_IMDB(str(tmp_path), stage="train", len_data=n)
    loader = MMIMDBLoader(ds, batch_size=4)
    batch = next(iter(loader))
    assert batch["image"].shape[1] == 3          # channel-first
    assert batch["text"].shape[0] == 4
    assert (batch["text"].shape[1] & (batch["text"].shape[1] - 1)) == 0  # pow2
    # padding value is -10
    i = int(np.argmin(batch["textlen"][:4]))
    assert batch["text"][i, -1, 0] == -10.0

    rs = np.random.RandomState(0)
    y_true = rs.rand(50, 23) > 0.8
    y_pred = rs.rand(50, 23) > 0.8
    want = sklearn.f1_score(y_true, y_pred, average="samples", zero_division=0)
    assert samples_f1(y_true, y_pred) == pytest.approx(want, abs=1e-9)
