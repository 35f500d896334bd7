"""Smoke coverage for the perf tools' tool-side contracts: they reach into
engine/trainer internals (e.g. ``_train_step_impl``) that refactors can
silently break — bench_proxy did exactly that when the population impls
moved to the program host."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_profile_step_visual_fwd_tiny_cpu():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    run = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "profile_step.py"),
         "--what", "visual_fwd", "--batch", "2", "--img", "32"],
        env=env, capture_output=True, text=True, timeout=1800)
    assert run.returncode == 0, run.stdout + run.stderr
    assert "ms/iter" in run.stdout


def test_bf16_sweep_importable():
    # the sweep itself needs a TPU; pin that its module-level wiring
    # (imports, engine attribute names) stays valid
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bf16_sweep", os.path.join(REPO, "tools", "bf16_sweep.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert hasattr(mod, "main") or hasattr(mod, "_timeit")


@pytest.mark.slow
def test_parity_kit_synthetic_ready(tmp_path):
    """tools/parity_kit.py --synthetic must build fixtures, pass every
    precondition check (dataset layout, zip AND legacy checkpoint loads,
    shape match) and print READY + the exact parity commands."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    run = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "parity_kit.py"),
         "--synthetic", str(tmp_path)],
        env=env, capture_output=True, text=True, timeout=1800)
    assert run.returncode == 0, run.stdout + run.stderr
    assert "[READY] all preconditions pass" in run.stdout
    assert "--test_cp best_3_1_1_1_3_0_1_1_1_3_3_0_0.9134.checkpoint" \
        in run.stdout
    assert "--hbm_resident --bf16" in run.stdout
    assert "main_searchable_ntu.py" in run.stdout


def test_parity_kit_not_ready_reports_missing(tmp_path):
    """Missing checkpoints -> rc=1, [missing] lines naming each file, and
    the commands still printed for when they exist."""
    from mfas_tpu.data import ntu  # noqa: F401 (repo import path)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    (tmp_path / "nturgbd_rgb").mkdir()
    run = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "parity_kit.py"),
         "--datadir", str(tmp_path), "--checkpointdir", str(tmp_path),
         "--resnet3d_layers", "1", "1", "1", "1",
         "--resnet3d_base_width", "16", "--num_outputs", "3",
         "--inner_representation_size", "8", "--no_batchnorm"],
        env=env, capture_output=True, text=True, timeout=1800)
    assert run.returncode == 1, run.stdout + run.stderr
    assert "[FAIL]" in run.stdout
    assert "[missing]" in run.stdout
    assert "[NOT READY]" in run.stdout
