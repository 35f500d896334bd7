"""Multi-host (DCN) runtime tests (SURVEY.md §5.8): two OS processes join
through ``parallel.mesh.initialize_distributed`` (jax.distributed), a
global mesh spans both processes' CPU devices, and

  * a jitted global reduction runs a real cross-process collective
    (plumbing smoke), and
  * one ``ClassifierEngine._train_step`` on a tiny fusion net runs over
    the 2-process global mesh — batch sharded across processes, params
    replicated, XLA's gradient all-reduce riding the DCN transport — and
    its loss must equal a single-process unsharded run of the same step.

This exercises the code path the framework uses across hosts — the
single-process tests cover ICI-style sharding only.

Marked slow: spawns 2 python subprocesses with fresh jax inits.
"""

import os
import socket
import subprocess
import sys
import types

import numpy as np
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


# one engine train step over the 2-process global mesh; prints the loss
_CHILD_ENGINE = r"""
import os, sys, types
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["MFAS_REPO"])
import jax.numpy as jnp
from mfas_tpu.parallel import mesh as pm

pid = int(os.environ["MFAS_PID"])
pm.initialize_distributed(os.environ["MFAS_COORD"], num_processes=2,
                          process_id=pid)
mesh = pm.make_mesh()                       # spans BOTH processes' devices
assert jax.process_count() == 2

sys.path.insert(0, os.environ["MFAS_REPO"] + "/tests")
from test_multihost import _tiny_engine_setup
engine, trainable, frozen, opt, batch = _tiny_engine_setup()

trainable = pm.replicate_tree(trainable, mesh)
frozen = pm.replicate_tree(frozen, mesh)
opt = pm.replicate_tree(opt, mesh)
batch = pm.shard_batch(batch, mesh)         # batch split across processes

with mesh:
    t2, f2, o2, loss, corr = engine._train_step(
        trainable, frozen, opt, batch, jnp.float32(1e-3),
        jnp.zeros(2, jnp.uint32))
    loss = float(np.asarray(jax.device_get(
        jax.jit(lambda x: x, out_shardings=pm.replicated(mesh))(loss))))
print(f"proc {pid}: engine step loss {loss:.8f}", flush=True)
"""


def _tiny_engine_setup():
    """Deterministic tiny fusion net + batch, shared by the DCN children
    and the in-process single-device oracle (global batch 8 divides the
    4-device global mesh)."""
    from mfas_tpu.core.module import partition
    from mfas_tpu.core.optim import adam_init
    from mfas_tpu.engine.classifier import ClassifierEngine
    from mfas_tpu.fusion.avmnist import Searchable_Audio_Image_Net

    args = types.SimpleNamespace(
        channels=4, num_outputs=5, inner_representation_size=8, drpt=0.0,
        multitask=False, alphas=False, batchnorm=False)
    model = Searchable_Audio_Image_Net(args, np.array([[4, 2, 0], [1, 1, 1]]))
    tree = model.init(0)
    engine = ClassifierEngine(model, multitask=False,
                              input_keys=("image", "audio"))
    trainable, frozen = partition(tree, model.param_predicate())
    opt = adam_init(trainable)
    B = 8
    rs = np.random.RandomState(7)
    batch = {
        "image": rs.randn(B, 1, 28, 28).astype(np.float32),
        "audio": rs.randn(B, 1, 112, 112).astype(np.float32),
        "label": rs.randint(0, args.num_outputs, B).astype(np.int32),
        "_mask": np.ones((B,), np.float32),
    }
    return engine, trainable, frozen, opt, batch


def _spawn_two(child_src, extra_env=None):
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
        env.update(extra_env or {})
        procs.append(subprocess.Popen(
            [sys.executable, "-c", child_src], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:   # a wedged distributed barrier must not leak
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
    return outs


def test_partial_dist_flags_rejected():
    """--dist_num_processes/--dist_process_id without --dist_coordinator
    must raise instead of silently running N standalone jobs."""
    from mfas_tpu.parallel.mesh import initialize_from_args

    args = types.SimpleNamespace(dist_coordinator=None,
                                 dist_num_processes=2, dist_process_id=0)
    with pytest.raises(ValueError, match="dist_coordinator"):
        initialize_from_args(args)
    # and stays a clean no-op when nothing is configured
    initialize_from_args(types.SimpleNamespace())


@pytest.mark.slow
def test_two_process_dcn_collective(tmp_path):
    outs = _spawn_two(_CHILD)
    for pid, out in enumerate(outs):
        assert f"proc {pid}: global sum" in out


# the population train step over a 2-process (pop, data) mesh: pop stays
# communication-free, the data axis crosses the process boundary
_CHILD_POP = r"""
import os, sys, types
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["MFAS_REPO"])
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from mfas_tpu.parallel import mesh as pm

pid = int(os.environ["MFAS_PID"])
pm.initialize_distributed(os.environ["MFAS_COORD"], num_processes=2,
                          process_id=pid)
assert jax.device_count() == 4

sys.path.insert(0, os.environ["MFAS_REPO"] + "/tests")
from test_multihost import _tiny_population_setup
trainer, confs, enc_np, feats_np, label_np, wmask_np = \
    _tiny_population_setup()

mesh = Mesh(np.asarray(jax.devices()).reshape(2, 2), ("pop", "data"))
pop_sh = NamedSharding(mesh, P("pop"))
data_sh = NamedSharding(mesh, P("data"))
repl = NamedSharding(mesh, P())

from mfas_tpu.search.population import init_population
from mfas_tpu.core.optim import adam_init


def put(tree, sh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(np.asarray(x), sh), tree)

params_l, bn_l = init_population(confs, trainer.spec, seed=0)
opt_l = adam_init(params_l)  # from LOCAL params: leaves stay fetchable
params, bn = put(params_l, pop_sh), put(bn_l, pop_sh)
enc = put(enc_np, pop_sh)
opt = {"m": put(opt_l["m"], pop_sh), "v": put(opt_l["v"], pop_sh),
       "step": jax.device_put(np.asarray(opt_l["step"]), repl)}
feats = put(feats_np, data_sh)
label = put(label_np, data_sh)
wmask = put(wmask_np, data_sh)
with mesh:
    params, bn, opt, loss_c, corr_c = trainer._train_step(
        params, bn, opt, enc, *feats, label, wmask,
        jnp.float32(1e-3), jnp.zeros(2, jnp.uint32))
    loss_c = jax.jit(lambda x: x, out_shardings=repl)(loss_c)
    losses = np.asarray(jax.device_get(loss_c))
print(f"proc {pid}: pop losses " + " ".join(f"{v:.8f}" for v in losses),
      flush=True)
"""


def _tiny_population_setup():
    """Deterministic population trainer + synthetic NTU-width features,
    shared by the DCN children and the in-process oracle. Global batch 4
    (divides data=2), population 4 (divides pop=2)."""
    from mfas_tpu.fusion import ntu as f_ntu
    from mfas_tpu.search.population import (PopulationSpec,
                                            PopulationTrainer, encode_confs)

    args = types.SimpleNamespace(
        num_outputs=6, vid_len=(2, 32), drpt=0.0,
        inner_representation_size=8, multitask=False, alphas=False,
        batchnorm=False)
    sizes_a, sizes_b = f_ntu.tap_sizes(args)
    spec = PopulationSpec(
        sizes_a=tuple(sizes_a), sizes_b=tuple(sizes_b),
        hidden=args.inner_representation_size, num_outputs=args.num_outputs,
        max_rows=4, batchnorm=False, drpt=0.0, use_alphas=False,
        multitask=False)
    trainer = PopulationTrainer(spec, None, None)
    confs = [np.array([[3, 1, 1]]), np.array([[1, 3, 0], [1, 1, 1]]),
             np.array([[0, 0, 0]]), np.array([[2, 2, 1]])]
    enc = encode_confs(confs, spec)
    rs = np.random.RandomState(5)
    B = 4
    feats = (rs.randn(B, len(sizes_a), max(sizes_a)).astype(np.float32),
             rs.randn(B, len(sizes_b), max(sizes_b)).astype(np.float32),
             None, None)
    label = rs.randint(0, args.num_outputs, B).astype(np.int32)
    wmask = np.ones((B,), np.float32)
    return trainer, confs, enc, feats, label, wmask


@pytest.mark.slow
def test_two_process_dcn_population_step(tmp_path):
    """One population train step over the 2-process (pop, data) mesh:
    per-candidate losses equal the single-process unsharded run."""
    import jax.numpy as jnp

    from mfas_tpu.core.optim import adam_init
    from mfas_tpu.search.population import init_population

    trainer, confs, enc_np, feats_np, label_np, wmask_np = \
        _tiny_population_setup()
    params, bn = init_population(confs, trainer.spec, seed=0)
    enc = {k: jnp.asarray(v) for k, v in enc_np.items()}
    feats = tuple(None if f is None else jnp.asarray(f) for f in feats_np)
    _, _, _, loss_c, _ = trainer._train_step(
        params, bn, adam_init(params), enc, *feats,
        jnp.asarray(label_np), jnp.asarray(wmask_np),
        jnp.float32(1e-3), jnp.zeros(2, np.uint32))
    want = np.asarray(loss_c)

    outs = _spawn_two(_CHILD_POP)
    for pid, out in enumerate(outs):
        line = [ln for ln in out.splitlines()
                if ln.startswith(f"proc {pid}: pop losses ")]
        assert line, f"proc {pid} printed no losses:\n{out}"
        got = np.asarray([float(v) for v in line[0].split("losses ")[1].split()])
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


@pytest.mark.slow
def test_two_process_cli_found_avmnist(tmp_path):
    """The full found-arch CLI across two DCN processes (the additive
    --dist_* flags, SURVEY.md §5.8): one process per 'host', a global
    4-device data mesh, every process feeding the identical seeded loader
    stream. Both processes must print the same test accuracy, and it must
    match a single-process run of the same command."""
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    _sys.path.insert(0, repo)
    from mfas_tpu.data.avmnist import make_synthetic_avmnist
    data = tmp_path / "data"
    make_synthetic_avmnist(str(data), n_train=48, n_test=16)

    def cli_args(extra):
        return [sys.executable, os.path.join(repo, "main_found_avmnist.py"),
                "--datadir", str(data), "--checkpointdir", str(tmp_path),
                "--channels", "4", "--batchsize", "8", "--epochs", "1",
                "--inner_representation_size", "8", "--random_backbones",
                "--no-verbose", "--j", "2", "--use_dataparallel", *extra]

    def env_for(n_local_devices):
        # the CLI children take coordinator/process id from the --dist_*
        # flags, not env
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        flags = [f for f in env.get("XLA_FLAGS", "").split()
                 if "host_platform_device_count" not in f]
        flags.append(
            f"--xla_force_host_platform_device_count={n_local_devices}")
        env["XLA_FLAGS"] = " ".join(flags)
        return env

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = [subprocess.Popen(
        cli_args(["--dist_coordinator", f"127.0.0.1:{port}",
                  "--dist_num_processes", "2", "--dist_process_id", str(pid)]),
        env=env_for(2), stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"

    def acc_of(out):
        line = [ln for ln in out.splitlines() if ln.startswith("Model Acc:")]
        assert line, out
        return float(line[0].split(":")[1])

    acc0, acc1 = acc_of(outs[0]), acc_of(outs[1])
    assert acc0 == acc1

    single = subprocess.run(
        cli_args([]), env=env_for(4), capture_output=True,
        text=True, timeout=600)
    assert single.returncode == 0, single.stdout + single.stderr
    np.testing.assert_allclose(acc0, acc_of(single.stdout), atol=1e-6)


# MM-IMDB eval over the 2-process mesh: the per-sample prediction fetch
# must land replicated (engine/mmimdb.py _get_step) — a raw sharded
# output spans non-addressable devices and np.asarray would raise
_CHILD_MMIMDB = r"""
import os, sys, types
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["MFAS_REPO"])
from mfas_tpu.parallel import mesh as pm

pid = int(os.environ["MFAS_PID"])
pm.initialize_distributed(os.environ["MFAS_COORD"], num_processes=2,
                          process_id=pid)
mesh = pm.make_mesh()
assert jax.process_count() == 2

sys.path.insert(0, os.environ["MFAS_REPO"] + "/tests")
from test_multihost import _tiny_mmimdb_setup
engine, tree, loader = _tiny_mmimdb_setup(os.environ["MFAS_DATA"], mesh)
f1 = engine.test_track_f1(tree, loader)
print(f"proc {pid}: mmimdb f1 {f1:.8f}", flush=True)
"""


def _tiny_mmimdb_setup(datadir, mesh):
    """Tiny SimpleVTNet + test loader over pre-made synthetic MM-IMDB
    data; deterministic (seeded init, eval-mode forward only)."""
    from mfas_tpu.data.mm_imdb import MM_IMDB, MMIMDBLoader
    from mfas_tpu.engine.mmimdb import MMIMDBEngine
    from mfas_tpu.models import mm_imdb as M

    args = types.SimpleNamespace(num_outputs=5, channels=4)
    model = M.SimpleVTNet(args, 8, 3)
    tree = model.init(0)
    ds = MM_IMDB(datadir, stage="test", feat_dim=300, average_text=True,
                 len_data=8)
    loader = MMIMDBLoader(ds, 8, shuffle=False, seed=0)
    return MMIMDBEngine(model, mesh=mesh), tree, loader


@pytest.mark.slow
def test_two_process_dcn_mmimdb_eval(tmp_path):
    """MM-IMDB test-set eval across the 2-process mesh equals the
    single-process run — pins the replicated-output eval fetch."""
    from mfas_tpu.data.mm_imdb import make_synthetic_mmimdb

    data = str(tmp_path / "data")
    make_synthetic_mmimdb(data, "test", n=8, feat_dim=300, num_labels=5)

    engine, tree, loader = _tiny_mmimdb_setup(data, None)
    want = engine.test_track_f1(tree, loader)

    outs = _spawn_two(_CHILD_MMIMDB, extra_env={"MFAS_DATA": data})
    for pid, out in enumerate(outs):
        line = [ln for ln in out.splitlines()
                if ln.startswith(f"proc {pid}: mmimdb f1 ")]
        assert line, f"proc {pid} printed no f1:\n{out}"
        got = float(line[0].rsplit(" ", 1)[1])
        np.testing.assert_allclose(got, want, atol=1e-8)


@pytest.mark.slow
def test_two_process_dcn_engine_step(tmp_path):
    """One real engine train step across the 2-process mesh equals the
    single-process unsharded step (VERDICT r2 item 6)."""
    import jax.numpy as jnp

    engine, trainable, frozen, opt, batch = _tiny_engine_setup()
    _, _, _, loss, _ = engine._train_step(
        trainable, frozen, opt,
        {k: jnp.asarray(v) for k, v in batch.items()},
        jnp.float32(1e-3), jnp.zeros(2, np.uint32))
    want = float(np.asarray(loss))

    outs = _spawn_two(_CHILD_ENGINE)
    for pid, out in enumerate(outs):
        line = [ln for ln in out.splitlines()
                if ln.startswith(f"proc {pid}: engine step loss ")]
        assert line, f"proc {pid} printed no loss:\n{out}"
        got = float(line[0].rsplit(" ", 1)[1])
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)
