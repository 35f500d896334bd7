"""PyTorch checkpoint compatibility round-trips (SURVEY.md §5.4) — torch is
only the test oracle."""

import numpy as np
import pytest

from mfas_tpu.core import flatten_tree
from mfas_tpu.runtime import checkpoint as ckpt

torch = pytest.importorskip("torch")


def make_torch_model():
    m = torch.nn.Sequential(
        torch.nn.Conv2d(3, 4, 3, padding=1),
        torch.nn.BatchNorm2d(4),
        torch.nn.Linear(7, 5),
    )
    return m


def test_read_modern_zip_checkpoint(tmp_path):
    m = make_torch_model()
    path = tmp_path / "m.checkpoint"
    torch.save(m.state_dict(), str(path))

    flat = ckpt.load_state_dict(str(path))
    sd = m.state_dict()
    assert set(flat) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(flat[k], sd[k].numpy())
    assert flat["1.num_batches_tracked"].dtype == np.int64


def test_read_legacy_checkpoint(tmp_path):
    m = make_torch_model()
    path = tmp_path / "legacy.checkpoint"
    torch.save(m.state_dict(), str(path), _use_new_zipfile_serialization=False)

    flat = ckpt.load_state_dict(str(path))
    sd = m.state_dict()
    assert set(flat) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(flat[k], sd[k].numpy())


def test_read_dataparallel_prefix_strip(tmp_path):
    m = make_torch_model()
    sd = {"module." + k: v for k, v in m.state_dict().items()}
    path = tmp_path / "dp.checkpoint"
    torch.save(sd, str(path))
    flat = ckpt.load_state_dict(str(path))
    assert set(flat) == set(m.state_dict())


def test_write_readable_by_torch(tmp_path):
    tree = {
        "conv.weight": np.random.RandomState(0).randn(4, 3, 3, 3).astype(np.float32),
        "bn.num_batches_tracked": np.asarray(7, np.int32),
        "fc.bias": np.random.RandomState(1).randn(5).astype(np.float32),
    }
    path = tmp_path / "ours.checkpoint"
    ckpt.save(tree, str(path))

    loaded = torch.load(str(path), weights_only=False)
    assert set(loaded) == set(tree)
    np.testing.assert_array_equal(loaded["conv.weight"].numpy(), tree["conv.weight"])
    assert loaded["bn.num_batches_tracked"].item() == 7
    assert loaded["bn.num_batches_tracked"].dtype == torch.int64
    np.testing.assert_array_equal(loaded["fc.bias"].numpy(), tree["fc.bias"])


def test_write_read_roundtrip_no_torch(tmp_path):
    tree = {"a.weight": np.arange(12, dtype=np.float32).reshape(3, 4),
            "b": np.asarray([True, False]),
            "c.half": np.asarray([1.5, 2.5], np.float16)}
    path = tmp_path / "rt.checkpoint"
    ckpt.save(tree, str(path))
    back = ckpt.load_state_dict(str(path))
    for k in tree:
        np.testing.assert_array_equal(back[k], tree[k])


def test_load_refuses_arbitrary_globals(tmp_path):
    """Checkpoints are untrusted third-party files: a pickle referencing a
    non-allowlisted global (the os.system RCE shape) must be REFUSED, not
    resolved through the default find_class."""
    import pickle
    import zipfile

    class Evil:
        def __reduce__(self):
            import os
            return (os.system, ("echo pwned > " +
                                str(tmp_path / "pwned"),))

    path = tmp_path / "evil.checkpoint"
    with zipfile.ZipFile(path, "w") as z:   # minimal modern container
        z.writestr("archive/data.pkl", pickle.dumps({"x": Evil()}))
        z.writestr("archive/version", "3")
    with pytest.raises(Exception) as ei:
        ckpt.load(str(path))
    assert "disallowed global" in str(ei.value)
    assert not (tmp_path / "pwned").exists()   # nothing executed


def test_legacy_storage_views_refused():
    """torch<1.6 storage-VIEW persistent ids (6th pid element) would load
    against the root storage with view-relative offsets — silently wrong
    values. The reader must refuse them loudly."""
    import io

    from mfas_tpu.runtime.checkpoint import _StorageType, _Unpickler

    up = _Unpickler(io.BytesIO(b""), loader=lambda *a: None)
    # view_metadata=None (the only case this framework targets) loads fine
    assert up.persistent_load(
        ("storage", _StorageType("FloatStorage"), "0", "cpu", 4,
         None)) is None
    with pytest.raises(NotImplementedError, match="storage views"):
        up.persistent_load(
            ("storage", _StorageType("FloatStorage"), "0", "cpu", 4,
             ("view_key", 2, 2)))


def test_save_dedups_tied_weights(tmp_path):
    """Two tree paths referencing the SAME array (tied weights) must share
    one storage on disk, so the tie survives a round-trip (torch.save's
    storage-memo semantics) and the bytes are written once."""
    import zipfile

    w = np.arange(6, dtype=np.float32).reshape(2, 3)
    tree = {"emb.weight": w, "head.weight": w,
            "other": np.ones((2, 3), np.float32)}
    path = tmp_path / "tied.checkpoint"
    ckpt.save(tree, str(path))
    back = ckpt.load(str(path))
    np.testing.assert_array_equal(back["emb.weight"], w)
    np.testing.assert_array_equal(back["head.weight"], w)
    # the tie is structural, not just equal values: one shared storage
    assert np.shares_memory(back["emb.weight"], back["head.weight"])
    assert not np.shares_memory(back["emb.weight"], back["other"])
    with zipfile.ZipFile(path) as z:
        data_records = [n for n in z.namelist() if "/data/" in n]
    assert len(data_records) == 2, data_records   # w once + other once


def test_backbone_tree_injection_against_torch_reference(tmp_path):
    """A torch GP_LeNet-shaped state_dict loads into our GP_LeNet tree and
    the forward agrees (torch as behavior oracle)."""
    import types
    import jax.numpy as jnp
    from mfas_tpu.core.module import Ctx
    from mfas_tpu.models.avmnist import GP_LeNet

    class TorchGPLeNet(torch.nn.Module):
        def __init__(self, ch=4, num_outputs=10):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(1, ch, 5, padding=2, bias=False)
            self.bn1 = torch.nn.BatchNorm2d(ch)
            self.conv2 = torch.nn.Conv2d(ch, 2 * ch, 3, padding=1, bias=False)
            self.bn2 = torch.nn.BatchNorm2d(2 * ch)
            self.conv3 = torch.nn.Conv2d(2 * ch, 4 * ch, 3, padding=1, bias=False)
            self.bn3 = torch.nn.BatchNorm2d(4 * ch)
            self.classifier = torch.nn.Sequential(torch.nn.Linear(4 * ch, num_outputs))

        def forward(self, x):
            out1 = torch.relu(self.bn1(self.conv1(x)))
            out = torch.nn.functional.max_pool2d(out1, 2)
            out2 = torch.relu(self.bn2(self.conv2(out)))
            out = torch.nn.functional.max_pool2d(out2, 2)
            out3 = torch.relu(self.bn3(self.conv3(out)))
            gp3 = out3.flatten(2).mean(2)
            return self.classifier(gp3)

    tm = TorchGPLeNet().eval()
    path = tmp_path / "gp.checkpoint"
    torch.save(tm.state_dict(), str(path))

    args = types.SimpleNamespace(channels=4, num_outputs=10)
    net = GP_LeNet(args, 1)
    template = net.init(0)
    tree = ckpt.tree_from_state_dict(ckpt.load_state_dict(str(path)), template)

    x = np.random.RandomState(2).randn(2, 1, 28, 28).astype(np.float32)
    ours = np.asarray(net(tree, Ctx(train=False), jnp.asarray(x))[0])
    theirs = tm(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_bf16_save_load_roundtrip(tmp_path):
    """The writer must serialize bfloat16 (BFloat16Storage) symmetrically
    with the reader."""
    import ml_dtypes
    from mfas_tpu.runtime import checkpoint as ckpt

    sd = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)
          .astype(ml_dtypes.bfloat16),
          "b": np.ones((3,), np.float32)}
    path = tmp_path / "bf16.checkpoint"
    ckpt.save(sd, str(path))
    back = ckpt.load(str(path))
    assert back["w"].dtype == np.dtype(ml_dtypes.bfloat16)
    np.testing.assert_array_equal(back["w"].astype(np.float32),
                                  sd["w"].astype(np.float32))


def test_load_state_dict_unwraps_training_wrapper(tmp_path):
    """{'state_dict': {...}, 'epoch': N} is the common torch training
    checkpoint layout — unwrap it instead of object-arraying it."""
    from mfas_tpu.runtime import checkpoint as ckpt

    inner = {"lin.weight": np.ones((2, 2), np.float32),
             "lin.bias": np.zeros((2,), np.float32)}
    path = tmp_path / "wrapped.checkpoint"
    ckpt.save({"state_dict": inner, "epoch": 3}, str(path))
    flat = ckpt.load_state_dict(str(path))
    assert set(flat) == set(inner)
    np.testing.assert_array_equal(flat["lin.weight"], inner["lin.weight"])
