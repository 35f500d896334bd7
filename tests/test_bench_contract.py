"""The bench harness's output contract, enforced by the suite.

Three of four official bench records failed while the measurements were
real (BENCH_r02 parsed=null, r03 stale reprint, r04 rc=124 seconds before
the print). The contract is now testable: a record line after every
section, a SIGTERM fallback reprint, self-describing section failures,
and a default budget with real margin. These tests run ``bench.py`` as a
subprocess exactly the way the driver does (CPU-pinned here).
"""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _env(**extra):
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "MFAS_BENCH_FAST": "1",
        "MFAS_BENCH_BF16": "0",
    })
    env.update({k: str(v) for k, v in extra.items()})
    return env


def _record_lines(stdout):
    recs = []
    for line in stdout.splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        if rec.get("metric") == "mfas_search_speedup_vs_sequential_candidates":
            recs.append(rec)
    return recs


@pytest.fixture(scope="module")
def fast_run(tmp_path_factory):
    """One FAST bench subprocess shared by the happy-path asserts.
    MFAS_BENCH_BUDGET_S mirrors the driver's soft budget; the hard
    ``timeout`` below is the driver's kill. The sidecar is redirected so
    the suite never clobbers the repo's real bench_detail.json."""
    tmp = tmp_path_factory.mktemp("bench_fast")
    bench_copy = os.path.join(str(tmp), "bench.py")
    with open(BENCH) as f:
        src = f.read()
    with open(bench_copy, "w") as f:
        f.write(src)
    env = _env(MFAS_BENCH_BUDGET_S="600")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    t0 = time.monotonic()
    proc = subprocess.run([sys.executable, bench_copy], env=env,
                          capture_output=True, text=True, timeout=900)
    return proc, time.monotonic() - t0, str(tmp)


def test_fast_run_exits_zero_and_prints_records(fast_run):
    proc, _, _ = fast_run
    assert proc.returncode == 0, proc.stderr[-3000:]
    recs = _record_lines(proc.stdout)
    # at least the post-proxy partial line and the final line
    assert len(recs) >= 2, proc.stdout[-3000:]
    final = recs[-1]
    assert "partial_after_section" not in final
    assert final["unit"] == "x"
    assert isinstance(final["value"], (int, float))
    assert final["vs_baseline"] == final["value"]
    assert final["measured_at"]          # freshness is machine-checkable
    # the partial line is itself a complete, valid record
    assert recs[0]["partial_after_section"] == "bench_proxy"
    assert recs[0]["unit"] == "x"


def test_fast_run_sidecar_is_valid_json(fast_run):
    proc, _, tmp = fast_run
    assert proc.returncode == 0
    # non-TPU backends write a SUFFIXED sidecar so ad-hoc CPU validation
    # runs can never clobber the official on-chip bench_detail.json (and
    # never poison its carry-forward chain)
    assert not os.path.exists(os.path.join(tmp, "bench_detail.json"))
    with open(os.path.join(tmp, "bench_detail.cpu.json")) as f:
        record = json.load(f)
    assert record["detail"]["device_kind"] == "cpu"
    assert record["measured_at"]


def test_injected_section_failure_still_prints_parseable_line(tmp_path):
    """VERDICT r4 next-8: a section error must not silently drop keys —
    the printed line still parses and carries an errors count."""
    bench_copy = tmp_path / "bench.py"
    bench_copy.write_text(open(BENCH).read())
    env = _env(MFAS_BENCH_INJECT_ERROR="bench_proxy")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run([sys.executable, str(bench_copy)], env=env,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-3000:]
    recs = _record_lines(proc.stdout)
    assert recs, proc.stdout[-3000:]
    final = recs[-1]
    assert final.get("errors", 0) >= 1
    assert "bench_proxy_error" in final.get("error_keys", [])


def test_sigterm_reprints_latest_record(tmp_path):
    """The kill-time fallback: SIGTERM mid-run must leave a parseable
    record as the LAST line of stdout (the driver tails output)."""
    bench_copy = tmp_path / "bench.py"
    bench_copy.write_text(open(BENCH).read())
    # instant 'measurement' (injected proxy failure) + a stuck section
    env = _env(MFAS_BENCH_INJECT_ERROR="bench_proxy",
               MFAS_BENCH_HANG_S="300")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    errfile = open(tmp_path / "stderr.txt", "w")   # a PIPE could fill/block
    proc = subprocess.Popen([sys.executable, str(bench_copy)], env=env,
                            stdout=subprocess.PIPE, stderr=errfile,
                            text=True)
    try:
        # wait for the first emitted line, then kill mid-"section"
        first = None
        deadline = time.monotonic() + 300
        while time.monotonic() < deadline:
            line = proc.stdout.readline()
            if line.strip().startswith("{"):
                first = line
                break
            if line == "" and proc.poll() is not None:
                break
        assert first is not None, \
            "no record line before deadline: " + \
            (tmp_path / "stderr.txt").read_text()[-2000:]
        proc.send_signal(signal.SIGTERM)
        rest, _ = proc.communicate(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate()
        errfile.close()
    recs = _record_lines(first + rest)
    assert recs, first + rest
    # the handler's reprint: last line is a full valid record
    last = recs[-1]
    assert last["metric"] == "mfas_search_speedup_vs_sequential_candidates"
    assert "value" in last and "vs_baseline" in last


def test_default_budget_has_margin():
    """bench.py:61 regression guard: the default soft budget must keep
    >=15% margin under the driver's observed 3600 s hard kill."""
    src = open(BENCH).read()
    import re
    m = re.search(r'MFAS_BENCH_BUDGET_S",\s*"(\d+)"', src)
    assert m, "budget default not found"
    assert int(m.group(1)) <= 3060, "soft budget must be <=85% of 3600"
