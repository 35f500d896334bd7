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
        env=env, capture_output=True, text=True, timeout=900)
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
