"""Persistent XLA compilation cache gate + bounded device probe
(runtime/compile_cache.py) and the dryrun's no-TPU-touch routing
(__graft_entry__.py, VERDICT r3 next-1)."""

import json
import os
import subprocess
import sys
import time

import pytest

from mfas_tpu.data.native import _host_tag
from mfas_tpu.runtime import compile_cache as cc
from mfas_tpu.runtime.compile_cache import enable_persistent_compilation_cache

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(autouse=True)
def _restore_cache_config():
    """These tests repoint jax_compilation_cache_dir at tmp dirs that die
    with the test; later suite compiles must go back to the session cache
    (tests/conftest.py) instead of erroring into a deleted path."""
    import jax

    before = jax.config.jax_compilation_cache_dir
    yield
    jax.config.update("jax_compilation_cache_dir", before)


def _expected(base):
    # CPU-backend cache entries embed host-ISA AOT code; the dir is keyed
    # by the host's CPU features so a migrated image recompiles instead of
    # failing in cpu_aot_loader (or SIGILL) — VERDICT r3 next-3
    return os.path.join(base, f"host-{_host_tag()}")


def test_enable_creates_host_keyed_dir_and_sets_config(tmp_path, monkeypatch):
    import jax

    target = str(tmp_path / "xla")
    monkeypatch.delenv("MFAS_COMPILE_CACHE", raising=False)
    got = enable_persistent_compilation_cache(target)
    assert got == _expected(target) and os.path.isdir(got)
    assert jax.config.jax_compilation_cache_dir == got


def test_env_opt_out(monkeypatch, tmp_path):
    monkeypatch.setenv("MFAS_COMPILE_CACHE", "0")
    assert enable_persistent_compilation_cache(str(tmp_path / "x")) is None
    assert not (tmp_path / "x").exists()


def test_env_dir_override(monkeypatch, tmp_path):
    monkeypatch.delenv("MFAS_COMPILE_CACHE", raising=False)
    monkeypatch.setenv("MFAS_COMPILE_CACHE_DIR", str(tmp_path / "y"))
    assert enable_persistent_compilation_cache() == _expected(
        str(tmp_path / "y"))


# ---------------------------------------------------------------------------
# device probe verdict cache (VERDICT r3 next-1c: bench and the dryrun share
# one probe instead of each paying a multi-minute budget)
# ---------------------------------------------------------------------------
def test_probe_verdict_roundtrip_and_ttl(tmp_path, monkeypatch):
    monkeypatch.setenv("MFAS_PROBE_CACHE_DIR", str(tmp_path))
    assert cc._read_cached_verdict(600) is None        # empty dir
    cc._write_cached_verdict(True)
    assert cc._read_cached_verdict(600) is True
    cc._write_cached_verdict(False)
    assert cc._read_cached_verdict(600) is False
    # expire: rewrite the timestamp into the past
    path = cc._probe_verdict_path()
    with open(path) as f:
        rec = json.load(f)
    rec["t"] = time.time() - 1000
    with open(path, "w") as f:
        json.dump(rec, f)
    assert cc._read_cached_verdict(600) is None
    # corrupt file -> None, not an exception
    with open(path, "w") as f:
        f.write("{torn")
    assert cc._read_cached_verdict(600) is None


def test_device_init_hangs_uses_cached_verdict(tmp_path):
    """A fresh process (jax unimported, no cpu pin, relay check bypassed)
    must honor a cached hangs=True verdict WITHOUT paying a probe."""
    with open(os.path.join(str(tmp_path), "device_probe.json"), "w") as f:
        json.dump({"t": time.time(), "hangs": True}, f)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("MFAS_SKIP_DEVICE_PROBE", None)
    env["MFAS_PROBE_CACHE_DIR"] = str(tmp_path)
    # bypass the relay TCP check so the cached verdict is what decides
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["MFAS_DEVICE_PROBE_TIMEOUT"] = "600"   # a real probe would blow the
    t0 = time.time()                           # 60 s budget below
    proc = subprocess.run(
        [sys.executable, "-c",
         "from mfas_tpu.runtime.compile_cache import device_init_hangs;"
         "print('hangs=%s' % device_init_hangs())"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=60)
    assert proc.returncode == 0, proc.stderr
    assert "hangs=True" in proc.stdout
    assert time.time() - t0 < 55


def test_device_init_hangs_cpu_pin_short_circuits(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert cc.device_init_hangs() is False


# ---------------------------------------------------------------------------
# the cpu_aot_loader mismatch warning is benign: a cached CPU executable
# loads and runs correctly in a FRESH process (no SIGILL, identical output)
# (VERDICT r4 next-6 — the warning itself is fd-filtered by
# runtime/logfilter.py; this test is the proof that filtering is safe)
# ---------------------------------------------------------------------------
def test_cached_executable_reload_fresh_process(tmp_path):
    prog = (
        "import numpy as np\n"
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "from mfas_tpu.runtime.compile_cache import "
        "enable_persistent_compilation_cache\n"
        # min_compile_secs=0: even this tiny program is written to / served
        # from the persistent cache
        "enable_persistent_compilation_cache({d!r}, min_compile_secs=0.0)\n"
        "import jax.numpy as jnp\n"
        "f = jax.jit(lambda x: jnp.tanh(x @ x.T).sum())\n"
        "x = jnp.asarray(np.random.RandomState(0).randn(64, 64), "
        "jnp.float32)\n"
        "print('RESULT', float(f(x)))\n"
    ).format(d=str(tmp_path / "xla"))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_COMPILATION_CACHE_DIR", None)   # the suite's shared cache
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    def run():
        return subprocess.run([sys.executable, "-c", prog], env=env,
                              capture_output=True, text=True, timeout=300)

    def entries():
        root = _expected(str(tmp_path / "xla"))
        return sorted(os.path.join(dp, f) for dp, _, fs in os.walk(root)
                      for f in fs)

    p1 = run()
    assert p1.returncode == 0, p1.stderr[-2000:]
    files1 = entries()
    assert files1, "first run must write a persistent cache entry"
    p2 = run()
    # rc=0 in a fresh process == no SIGILL on the AOT-loaded executable
    assert p2.returncode == 0, p2.stderr[-2000:]
    r1 = [ln for ln in p1.stdout.splitlines() if ln.startswith("RESULT")]
    r2 = [ln for ln in p2.stdout.splitlines() if ln.startswith("RESULT")]
    assert r1 and r1 == r2, (p1.stdout, p2.stdout)
    # same key => same file: any RE-compile would have added a new entry
    # (min_compile_secs=0), so an unchanged file set proves run 2 was
    # served from the cache — the load path actually executed
    assert entries() == files1


# ---------------------------------------------------------------------------
# dryrun routing: on a single-chip tunnel deployment, n_devices>1 must go
# straight to the CPU child — no TPU probe, no backend init in the parent
# (the r03 artifact failed rc=124 exactly here)
# ---------------------------------------------------------------------------
def test_dryrun_single_chip_tunnel_goes_straight_to_child(monkeypatch):
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as ge
    finally:
        sys.path.pop(0)
    calls = []
    monkeypatch.setattr(ge, "_run_cpu_child", lambda n: calls.append(n))
    monkeypatch.setattr(
        ge, "_tpu_init_would_hang",
        lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("probe must not run on the short-circuit path")))
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.1")
    ge.dryrun_multichip(8)
    assert calls == [8]


def test_dryrun_cpu_pin_serves_in_process(monkeypatch):
    """With JAX_PLATFORMS=cpu and >= n virtual devices live (the test
    session's own backend), the dryrun must not spawn a child."""
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as ge
    finally:
        sys.path.pop(0)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    spawned = []
    monkeypatch.setattr(ge, "_run_cpu_child", lambda n: spawned.append(n))
    ran = []
    monkeypatch.setattr(ge, "_dryrun_impl",
                        lambda n, devs: ran.append((n, len(devs))))
    ge.dryrun_multichip(2)
    assert ran == [(2, 2)] and not spawned


# ---------------------------------------------------------------------------
# bench dead-tunnel line: stale data must be unmistakable for a fresh run
# (ADVICE r3: value/vs_baseline 0.0; reprint under last_recorded_*)
# ---------------------------------------------------------------------------
def test_bench_dead_tunnel_line_is_not_parseable_as_fresh(tmp_path):
    import shutil
    shutil.copy(os.path.join(REPO, "bench.py"), tmp_path / "bench.py")
    with open(tmp_path / "bench_detail.json", "w") as f:
        json.dump({"metric": "mfas_search_speedup_vs_sequential_candidates",
                   "value": 20.03, "unit": "x", "vs_baseline": 20.03,
                   "measured_at": "2026-08-17T00:00:00+0000",
                   "detail": {}}, f)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)     # skip the relay TCP check
    probe_dir = tmp_path / "probe"
    probe_dir.mkdir()
    with open(probe_dir / "device_probe.json", "w") as f:
        json.dump({"t": time.time(), "hangs": True}, f)
    env["MFAS_PROBE_CACHE_DIR"] = str(probe_dir)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, str(tmp_path / "bench.py")], env=env,
        cwd=str(tmp_path), capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr
    line = json.loads(proc.stdout.strip().splitlines()[-1])
    assert line["tpu_unreachable"] is True
    assert line["value"] == 0.0 and line["vs_baseline"] == 0.0
    assert line["last_recorded_value"] == 20.03
    assert line["last_recorded_at"] == "2026-08-17T00:00:00+0000"
    # the failed attempt is timestamped into the sidecar, measurements kept
    with open(tmp_path / "bench_detail.json") as f:
        side = json.load(f)
    assert side["value"] == 20.03
    assert len(side["tpu_unreachable_attempts"]) == 1
