"""Serving export (runtime/export.py + tools/export_model.py): the
serialized StableHLO artifact reproduces the live model's eval forward,
including through the torch-format checkpoint chain."""

import os
import subprocess
import sys
import types

import numpy as np

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiny_avmnist_net():
    from mfas_tpu.fusion.avmnist import Searchable_Audio_Image_Net

    args = types.SimpleNamespace(
        channels=4, num_outputs=10, inner_representation_size=8, drpt=0.0,
        multitask=False, alphas=False, batchnorm=False)
    model = Searchable_Audio_Image_Net(args, np.array([[4, 2, 1], [4, 2, 0]]))
    return model, model.init(3)


def test_export_roundtrip_matches_live_forward(tmp_path):
    from mfas_tpu.core.module import Ctx
    from mfas_tpu.runtime.export import load_exported, save_exported

    model, tree = _tiny_avmnist_net()
    rs = np.random.RandomState(0)
    image = rs.randn(2, 1, 28, 28).astype(np.float32)
    audio = rs.randn(2, 1, 112, 112).astype(np.float32)

    def fwd(img, aud):
        out = model.apply(tree, Ctx(train=False), (img, aud))
        return out[0] if isinstance(out, (tuple, list)) else out

    path = str(tmp_path / "m.stablehlo")
    save_exported(path, fwd,
                  (jax.ShapeDtypeStruct(image.shape, jnp.float32),
                   jax.ShapeDtypeStruct(audio.shape, jnp.float32)))

    exp = load_exported(path)
    got = np.asarray(exp.call(image, audio))
    want = np.asarray(fwd(image, audio))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_export_cli_bakes_checkpoint_weights(tmp_path):
    """tools/export_model.py --test_cp: the artifact carries the
    CHECKPOINT's weights (differs from a random-init export, matches the
    live model loaded from the same checkpoint)."""
    from mfas_tpu.core.module import Ctx
    from mfas_tpu.runtime import checkpoint as ckpt
    from mfas_tpu.runtime.export import load_exported
    from main_found_avmnist import FOUND_CONFS
    from mfas_tpu.fusion.avmnist import Searchable_Audio_Image_Net

    args = types.SimpleNamespace(
        channels=4, num_outputs=10, inner_representation_size=8, drpt=0.0,
        multitask=False, alphas=False, batchnorm=False)
    model = Searchable_Audio_Image_Net(args, FOUND_CONFS[0])
    tree = model.init(7)
    cp = "m.checkpoint"
    ckpt.save(ckpt.state_dict_from_tree(tree), str(tmp_path / cp))

    out = str(tmp_path / "m.stablehlo")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    run = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "export_model.py"),
         "avmnist", "--conf", "0", "--test_cp", cp,
         "--checkpointdir", str(tmp_path), "--channels", "4",
         "--inner_representation_size", "8", "--batch", "2", "--out", out],
        env=env, capture_output=True, text=True, timeout=600)
    assert run.returncode == 0, run.stdout + run.stderr

    rs = np.random.RandomState(1)
    image = rs.randn(2, 1, 28, 28).astype(np.float32)
    audio = rs.randn(2, 1, 112, 112).astype(np.float32)
    got = np.asarray(load_exported(out).call(image, audio))
    live = model.apply(tree, Ctx(train=False), (image, audio))
    live = np.asarray(live[0] if isinstance(live, (tuple, list)) else live)
    np.testing.assert_allclose(got, live, rtol=1e-5, atol=1e-6)


def test_export_cli_all_verticals_smoke(tmp_path):
    """mmimdb + cifar exports (ntu/avmnist covered above) reload and run."""
    from mfas_tpu.runtime.export import load_exported

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    cases = {
        "mmimdb": (["--model", "simplevt", "--text_first_hidden", "8",
                    "--channels", "4", "--image_size", "32", "48"],
                   ((2, 300), (2, 3, 32, 48)), 23),
        # exercises the fusingmix/fusetype args the CentralNet variants read
        # the CentralNet variants are shape-consistent only for specific
        # (channels, fusingmix) combos — a reference quirk (see
        # test_reference_oracle_more); this combo matches
        # test_mmimdb_models.py's working config
        "mmimdb-central": (["--model", "simplevt_centralnet",
                            "--fusingmix", "11,23", "--fusetype", "wsum",
                            "--text_first_hidden", "128", "--channels", "16",
                            "--image_size", "64", "64"],
                           ((2, 300), (2, 3, 64, 64)), 23),
        "cifar": (["--planes", "8", "--net_str", "1", "1", "2"],
                  ((2, 3, 32, 32),), 10),
    }
    for vertical, (extra, shapes, n_out) in cases.items():
        out = str(tmp_path / f"{vertical}.stablehlo")
        run = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "export_model.py"),
             vertical.split("-")[0], "--random_init", "--batch", "2",
             "--out", out, *extra],
            env=env, capture_output=True, text=True, timeout=600)
        assert run.returncode == 0, (vertical, run.stdout + run.stderr)
        rs = np.random.RandomState(0)
        inputs = [rs.randn(*s).astype(np.float32) for s in shapes]
        got = np.asarray(load_exported(out).call(*inputs))
        assert got.shape == (2, n_out), (vertical, got.shape)
        assert np.all(np.isfinite(got)), vertical


import pytest

_POLY_CASES = {
    # --bf16 composes with --polymorphic_batch (one bf16 artifact, any B)
    "avmnist": (["avmnist", "--conf", "0", "--channels", "4",
                 "--inner_representation_size", "8", "--bf16"],
                ((1, 28, 28), (1, 112, 112)), 10),
    # the REAL NTU architecture, shrunken via the found-CLI knobs so the
    # inflated-ResNet3D + HCN trace stays CPU-sized
    "ntu": (["ntu", "--conf", "0", "--vid_len", "2", "32", "--vid_dim",
             "32", "--inner_representation_size", "8",
             "--resnet3d_layers", "1", "1", "1", "1",
             "--resnet3d_base_width", "8"],
            ((2, 32, 32, 3), (3, 32, 25, 2)), 60),
    "mmimdb": (["mmimdb", "--model", "simplevt", "--text_first_hidden",
                "8", "--channels", "4", "--image_size", "32", "48"],
               ((300,), (3, 32, 48)), 23),
    "cifar": (["cifar", "--planes", "8", "--net_str", "1", "1", "2"],
              ((3, 32, 32),), 10),
}


@pytest.mark.parametrize("vertical", sorted(_POLY_CASES))
def test_export_polymorphic_batch(tmp_path, vertical):
    """--polymorphic_batch: one artifact serves any batch size — asserted
    for every vertical (VERDICT r3 next-8), with --check exercising the
    export-time reload+run validation."""
    from mfas_tpu.runtime.export import load_exported

    extra, per_sample_shapes, n_out = _POLY_CASES[vertical]
    out = str(tmp_path / "poly.stablehlo")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    run = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "export_model.py"),
         *extra, "--random_init", "--polymorphic_batch", "--check",
         "--out", out],
        env=env, capture_output=True, text=True, timeout=600)
    assert run.returncode == 0, (vertical, run.stdout + run.stderr)
    assert "check OK" in run.stdout, run.stdout
    exp = load_exported(out)
    rs = np.random.RandomState(0)
    for B in (1, 5):
        got = np.asarray(exp.call(*(rs.randn(B, *s).astype(np.float32)
                                    for s in per_sample_shapes)))
        assert got.shape == (B, n_out), (vertical, got.shape)


def test_export_bf16_artifact(tmp_path):
    """--bf16: the artifact keeps an f32 interface, tracks the f32 export
    to bf16 tolerance, and is materially smaller (weights baked as bf16
    constants)."""
    from mfas_tpu.runtime.export import load_exported

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    outs = {}
    for tag, extra in (("f32", []), ("bf16", ["--bf16"])):
        out = str(tmp_path / f"m_{tag}.stablehlo")
        run = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "export_model.py"),
             "avmnist", "--conf", "0", "--random_init", "--channels", "4",
             "--inner_representation_size", "8", "--batch", "2",
             "--out", out, *extra],
            env=env, capture_output=True, text=True, timeout=600)
        assert run.returncode == 0, (tag, run.stdout + run.stderr)
        outs[tag] = out

    rs = np.random.RandomState(2)
    image = rs.randn(2, 1, 28, 28).astype(np.float32)
    audio = rs.randn(2, 1, 112, 112).astype(np.float32)
    # --random_init seeds identically across invocations (seed 0), so the
    # two artifacts hold the same weights at different dtypes
    want = np.asarray(load_exported(outs["f32"]).call(image, audio))
    got = np.asarray(load_exported(outs["bf16"]).call(image, audio))
    assert got.dtype == np.float32, got.dtype        # interface stays f32
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)
    assert not np.allclose(got, want, rtol=1e-7, atol=1e-7)  # really bf16
    size_f32 = os.path.getsize(outs["f32"])
    size_bf16 = os.path.getsize(outs["bf16"])
    assert size_bf16 < 0.75 * size_f32, (size_bf16, size_f32)


def test_export_is_multi_platform(tmp_path):
    """Artifacts lower for cpu+tpu+cuda by default, so a CPU-exported
    model runs on a TPU/GPU serving host (jax.export's platform check)."""
    import types

    from mfas_tpu.core.module import Ctx
    from mfas_tpu.runtime.export import load_exported, save_exported

    model, tree = _tiny_avmnist_net()

    def fwd(img, aud):
        out = model.apply(tree, Ctx(train=False), (img, aud))
        return out[0] if isinstance(out, (tuple, list)) else out

    path = str(tmp_path / "m.stablehlo")
    save_exported(path, fwd,
                  (jax.ShapeDtypeStruct((2, 1, 28, 28), jnp.float32),
                   jax.ShapeDtypeStruct((2, 1, 112, 112), jnp.float32)))
    exp = load_exported(path)
    assert set(exp.platforms) >= {"cpu", "tpu", "cuda"}, exp.platforms


def test_compiled_init_advances_rng_stream_like_eager():
    """After init, the caller's Rng stream position matches the eager
    path's — post-init draws are backend-independent."""
    import numpy as np

    from mfas_tpu.core.module import Rng

    model, _ = _tiny_avmnist_net()
    r1, r2 = Rng(9), Rng(9)
    model.init(r1, compile=False)
    model.init(r2, compile=True)
    np.testing.assert_array_equal(np.asarray(r1.next()),
                                  np.asarray(r2.next()))
