"""Multi-host (DCN) runtime smoke test (SURVEY.md §5.8): two OS processes
join through ``parallel.mesh.initialize_distributed`` (jax.distributed), a
global mesh spans both processes' CPU devices, and a jitted global reduction
runs a real cross-process collective. This exercises the code path the
framework uses across hosts — the single-process tests cover ICI-style
sharding only.

Marked slow: spawns 2 python subprocesses with fresh jax inits.
"""

import os
import socket
import subprocess
import sys

import pytest

_CHILD = r"""
import os, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["MFAS_REPO"])
from mfas_tpu.parallel import mesh as pm

pid = int(os.environ["MFAS_PID"])
pm.initialize_distributed(os.environ["MFAS_COORD"], num_processes=2,
                          process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 2 * jax.local_device_count()

mesh = pm.make_mesh()                       # 1-D 'data' mesh, global devices
n = jax.device_count()
global_data = np.arange(n * 3, dtype=np.float32).reshape(n, 3)
arr = jax.make_array_from_callback(
    global_data.shape, pm.batch_sharding(mesh),
    lambda idx: global_data[idx])

import jax.numpy as jnp
total = jax.jit(jnp.sum, out_shardings=pm.replicated(mesh))(arr)
got = float(np.asarray(jax.device_get(total)))
want = float(global_data.sum())
assert got == want, (got, want)
print(f"proc {pid}: global sum {got} over {n} devices OK", flush=True)
"""


@pytest.mark.slow
def test_two_process_dcn_collective(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        flags = [f for f in env.get("XLA_FLAGS", "").split()
                 if "host_platform_device_count" not in f]
        flags.append("--xla_force_host_platform_device_count=2")
        env["XLA_FLAGS"] = " ".join(flags)
        env["MFAS_COORD"] = f"127.0.0.1:{port}"
        env["MFAS_PID"] = str(pid)
        env["MFAS_REPO"] = os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _CHILD], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid}: global sum" in out
