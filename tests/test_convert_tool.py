"""tools/convert_torchvision.py end-to-end: a fabricated torchvision-layout
ResNet-50 checkpoint converts to a loadable inflated-3D backbone checkpoint
(no torchvision in this image; the key layout matches torchvision's because
our ResNet3D mirrors its module names)."""

import subprocess
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from mfas_tpu.core.module import flatten_tree
from mfas_tpu.models.resnet3d import inflated_resnet50
from mfas_tpu.runtime import checkpoint as ckpt


def fabricate_2d_resnet50_state():
    """Shapes derived from our 3D template by dropping the time axis —
    identical to torchvision resnet50's state_dict layout."""
    template = flatten_tree(inflated_resnet50().init(0))
    rs = np.random.RandomState(0)
    flat = {}
    for k, v in template.items():
        v = np.asarray(v)
        if v.ndim == 5:
            flat[k] = rs.randn(v.shape[0], v.shape[1], v.shape[3],
                               v.shape[4]).astype(np.float32)
        elif k.endswith("num_batches_tracked"):
            flat[k] = np.asarray(0, np.int64)
        else:
            flat[k] = rs.randn(*v.shape).astype(np.float32) \
                if v.ndim else np.asarray(v)
    flat["fc.weight"] = rs.randn(1000, 2048).astype(np.float32)
    flat["fc.bias"] = rs.randn(1000).astype(np.float32)
    return flat


def test_resnet50_inflate_cli(tmp_path):
    src = tmp_path / "resnet50_2d.checkpoint"
    dst = tmp_path / "rgb_backbone_init.checkpoint"
    ckpt.save(fabricate_2d_resnet50_state(), str(src))

    out = subprocess.run(
        [sys.executable, "tools/convert_torchvision.py", "resnet50_inflate",
         "--src", str(src), "--dst", str(dst)],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": REPO + os.pathsep
             + os.environ.get("PYTHONPATH", "")})
    assert out.returncode == 0, out.stderr
    assert "wrote" in out.stdout

    # loads cleanly into the 3D template and is center-inflated
    net = inflated_resnet50()
    template = net.init(0)
    tree = ckpt.tree_from_state_dict(ckpt.load_state_dict(str(dst)), template)
    flat = flatten_tree(tree)
    w = np.asarray(flat["layer1.0.conv2.weight"])   # (O, I, 3, 3, 3)
    assert w.shape[2] == 3
    assert np.all(w[:, :, 0] == 0) and np.all(w[:, :, 2] == 0)
    assert np.any(w[:, :, 1] != 0)
