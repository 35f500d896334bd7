#!/usr/bin/env python3
"""Benchmark harness (driver contract: prints ONE JSON line).

Headline metric (BASELINE.md): MFAS search speedup vs the reference's
sequential candidate loop, at the NTU vertical's shapes. Two views:

1. **Per-step proxy** (headline `value`): measured on-device with synthetic
   NTU-shaped data,
     sequential unit cost  = frozen-backbone forward + ONE candidate's
       fusion-head train step (the reference trains candidates one at a
       time, re-running the backbones for every one —
       models/search/ntu_searchable.py:38-102);
     population unit cost  = the same backbone forward ONCE + one vmapped
       train step for the whole K-candidate population;
     speedup = K * t_sequential / t_population.
   Baseline definition (also in detail.baseline_definition): the
   sequential side is charged one backbone forward + one head train step
   per candidate and ZERO model-construction / checkpoint-reload /
   recompile cost — i.e. the proxy is conservative in the rebuild's favor.

2. **End-to-end search wall-clock** (detail.search_wallclock_*): a real
   tiny EPNAS search (NTUSearcher, synthetic packed store, MapLoader
   workers, device-side normalize, surrogate training, sampling — the
   whole host loop) timed in population mode; the sequential side is BOTH
   (a) measured: one full ``--sequential_candidates`` EPNAS run of the
   same config (seq_measured), and (b) extrapolated: N_candidates x a
   measured WARM per-candidate training wall-clock with per-candidate
   jit-retrace/compile-cache costs excluded (seq_extrap — conservative:
   the reference pays no per-candidate compile). Headline speedups use
   the conservative extrapolated basis; *_measured fields carry the real
   run.

Output contract: prints a compact driver-parseable JSON record line after
EVERY completed section (the last printed line is the record — an early
line survives a mid-section kill), re-prints the latest line on
SIGTERM/SIGINT, and finishes inside MFAS_BENCH_BUDGET_S (default 2900 s,
>=15% margin under the driver's observed 3600 s hard kill). The full
detail dict is written (atomically, after every section) to
``bench_detail.json`` next to this file. Official runs use the LEAN
profile — settled experiments carry forward from the previous sidecar,
labeled as carried; MFAS_BENCH_FULL=1 re-measures everything.

Timing methodology: the remote-tunneled backend defers execution past
block_until_ready, so compiled-region measurements are a ``lax.scan`` of N
steps with REAL data dependencies between iterations inside one jit,
fenced by a scalar host transfer; wall-clock sections are fenced by the
host fetches their loops already perform.
"""

import dataclasses
import json
import os
import sys
import time
import types

import numpy as np

INNER = 4        # scan length for backbone/full-train loops
INNER_HEAD = 16  # cheap head steps need a longer chain for stable timing

# soft wall-clock budget: optional sections (measured sequential search,
# amortization trend) are skipped when the remaining budget can't cover
# them, so the harness always reaches the final printed line even under
# an external timeout. Skips are recorded in the detail record.
# Default 2900 s: the driver's observed hard kill is 3600 s and round 4's
# record died at rc=124 because the soft budget EQUALLED the hard window
# (the sidecar was stamped seconds before the kill; the print never ran).
# >=15% margin is the contract now, not a hope.
_T0 = time.perf_counter()
BUDGET_S = float(os.environ.get("MFAS_BENCH_BUDGET_S", "2900"))

# Official runs use the LEAN profile: settled experiments whose answers
# are already documented (TPU_DESIGN.md §5.1 and the sidecar history) —
# the bf16 batch sweep, the chunked-H2D experiment, the measured
# --sequential_candidates run, the amortization trend, and the full-scale
# 197-candidate section — default to carry-forward from the previous
# sidecar instead of re-measuring. MFAS_BENCH_FULL=1 re-runs everything
# (and the per-section env switches still override individually).
FULL = os.environ.get("MFAS_BENCH_FULL", "0") == "1"


def _maybe_inject(name):
    """Test hook: MFAS_BENCH_INJECT_ERROR=<section> makes that section
    raise, so the contract 'a section failure still prints a parseable
    line with an errors count' is testable without breaking real code."""
    if os.environ.get("MFAS_BENCH_INJECT_ERROR") == name:
        raise RuntimeError(f"injected failure in {name} (test hook)")


def _budget_left():
    return BUDGET_S - (time.perf_counter() - _T0)


_PREV_SIDECAR = None


def _sidecar_path():
    """bench_detail.json is the OFFICIAL (TPU) record and the carry-forward
    source for official runs; an ad-hoc CPU run of the real bench.py must
    not clobber it (observed r05: a CPU validation run overwrote the fresh
    on-chip sidecar), so non-TPU backends get their own suffixed file."""
    here = os.path.dirname(os.path.abspath(__file__))
    backend = "unknown"
    try:
        import jax
        backend = jax.default_backend()
    except Exception:  # noqa: BLE001 — pre-init / dead tunnel: official file
        backend = "tpu"
    name = ("bench_detail.json" if backend == "tpu"
            else "bench_detail.%s.json" % backend)
    return os.path.join(here, name)


def _load_prev_sidecar():
    """Snapshot the PREVIOUS run's sidecar exactly once per process.
    _emit rewrites bench_detail.json after every section, so a late
    _carry_forward reading the file directly would 'carry' from this
    run's own partial record — the snapshot keeps the carry source the
    previous run, whenever it is read."""
    global _PREV_SIDECAR
    if _PREV_SIDECAR is None:
        try:
            with open(_sidecar_path()) as f:
                _PREV_SIDECAR = json.load(f)
        except Exception:  # noqa: BLE001 — no sidecar, nothing to carry
            _PREV_SIDECAR = {}
    return _PREV_SIDECAR


def _carry_forward(detail, keys, reason):
    """A budget-skipped section must not ERASE the last real measurement:
    the driver rewrites bench_detail.json every run, so without this a
    short-budget official run would drop the expensive sections (measured
    sequential search, full-scale search) recorded by a longer run. Copies
    the keys from the previous sidecar, stamped with the run they came
    from — carried values are labeled, never mistakable for fresh ones."""
    prev = _load_prev_sidecar()
    prev_detail = prev.get("detail", {})
    carried = {k: prev_detail[k] for k in keys if k in prev_detail}
    if carried:
        detail.update(carried)
        # provenance chains: if the previous run ALSO carried these keys,
        # keep the original measurement's timestamp, not the reprint's
        prev_stamp = prev_detail.get(keys[0] + "_carried_from", {})
        detail[keys[0] + "_carried_from"] = {
            "measured_at": (prev_stamp.get("measured_at")
                            or prev.get("measured_at")),
            "skip_reason": reason,
            "note": ("these keys are from the previous bench run (budget-"
                     "skipped this run); ratios among them are intra-THAT-"
                     "run, not comparable to this run's fresh timings")}

# ---------------------------------------------------------------------------
# Record emission: the one-line JSON contract, made kill-proof.
#
# Three of four official bench records failed while the measurements were
# real (r02 tail overflow, r03 stale reprint, r04 rc=124 seconds before the
# print). The contract is now: (1) a full, valid record line is printed
# after EVERY completed section — the driver tails stdout and the last
# line wins, so a kill mid-section leaves the freshest complete record in
# the tail; (2) SIGTERM/SIGINT re-print the latest line before exiting, so
# even a kill that lands between sections leaves a parseable tail.
# ---------------------------------------------------------------------------
_LATEST_LINE = None

_COMPACT_KEYS = (
    "device_kind",
    "search_wallclock_speedup", "search_wallclock_cached_speedup",
    "search_wallclock_resident_speedup",
    "search_wallclock_cached_resident_speedup",
    "search_wallclock_measured_speedup",
    "search_wallclock_cached_measured_speedup",
    "search_wallclock_seq_measured_s", "search_wallclock_seq_s",
    "search_wallclock_pop_s", "search_wallclock_pop_cached_s",
    "search_trend_speedup", "search_trend_cached_speedup",
    "search_trend_candidates",
    "search_fullscale_candidates", "search_fullscale_pop_cached_s",
    "search_fullscale_cached_speedup", "search_fullscale_speedup",
    "found_train_clips_per_s", "found_train_bf16_clips_per_s",
    "found_train_bf16_batch_sweep_clips_per_s",
    "found_infer_clips_per_s", "found_infer_bf16_clips_per_s",
    "mfu_estimate_bf16",
    "e2e_train_clips_per_s", "e2e_train_clips_per_s_resident",
    "e2e_train_clips_per_s_resident_bf16",
    "h2d_gbps", "search_speedup_proxy",
)


def _emit(detail, headline, prev_attempts=None, partial_after=None):
    """Write the sidecar atomically and print the one-line JSON record.

    Returns the printed line. ``partial_after`` names the last completed
    section when the record is an intermediate one (absent on the final
    emit), so a tail cut mid-run is self-describing."""
    global _LATEST_LINE
    errors = sorted(k for k in detail if k.endswith("_error"))
    carried = sorted(k[: -len("_carried_from")] for k in detail
                     if k.endswith("_carried_from"))
    sidecar = _sidecar_path()
    record = {"metric": "mfas_search_speedup_vs_sequential_candidates",
              "value": round(headline, 3), "unit": "x",
              "vs_baseline": round(headline, 3),
              "measured_at": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
              "detail": detail}
    if prev_attempts:
        record["tpu_unreachable_attempts"] = prev_attempts
    if partial_after:
        record["partial_after_section"] = partial_after
    try:
        with open(sidecar + ".tmp", "w") as f:   # atomic: a killed run
            json.dump(record, f, indent=1)       # never leaves torn JSON
        os.replace(sidecar + ".tmp", sidecar)
    except OSError as e:
        detail["sidecar_write_error"] = repr(e)

    line = {
        "metric": "mfas_search_speedup_vs_sequential_candidates",
        "value": round(headline, 3),
        "unit": "x",
        "vs_baseline": round(headline, 3),
        "measured_at": record["measured_at"],
        "detail_file": os.path.basename(_sidecar_path()),
        "detail": {k: detail[k] for k in _COMPACT_KEYS if k in detail},
    }
    if errors:
        line["errors"] = len(errors)
        line["error_keys"] = errors
    if carried:
        line["carried"] = carried
    if partial_after:
        line["partial_after_section"] = partial_after
    _LATEST_LINE = json.dumps(line)
    print(_LATEST_LINE, flush=True)
    return _LATEST_LINE


def _install_signal_fallback():
    """SIGTERM/SIGINT -> re-print the latest complete record and exit.
    Best-effort (a handler can't preempt a blocked native call), but it
    converts the common kill-between-sections case from parsed:null into
    a valid record. The primary defense is still the budget margin."""
    import signal

    def handler(signum, frame):  # noqa: ARG001
        if _LATEST_LINE is not None:
            sys.stdout.write("\n" + _LATEST_LINE + "\n")
            sys.stdout.flush()
        os._exit(113)

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, handler)
        except (ValueError, OSError):
            pass   # non-main thread / exotic platform: margin still holds


# bf16 peak TFLOP/s by device kind (MFU denominators; f32 programs are
# reported against the same peak, i.e. as a lower bound)
_PEAK_TFLOPS = {"v5 lite": 197.0, "v5e": 197.0, "v5p": 459.0,
                "v4": 275.0, "v6e": 918.0, "trillium": 918.0, "v6": 918.0}


def _ntu_args(**kw):
    d = dict(num_outputs=60, vid_len=(8, 32), drpt=0.5,
             inner_representation_size=16, multitask=False, alphas=False,
             batchnorm=False, num_classes=60)
    d.update(kw)
    return types.SimpleNamespace(**d)


def _timeit(fn, warmup=1, iters=3, inner=INNER):
    """fn() must return a scalar jax array (fenced via host transfer)."""
    for _ in range(warmup):
        float(np.asarray(fn()))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(np.asarray(fn()))
        times.append((time.perf_counter() - t0) / inner)
    return float(np.median(times))


def _peak_tflops(device):
    kind = getattr(device, "device_kind", "").lower()
    for key, val in _PEAK_TFLOPS.items():
        if key in kind:
            return val
    return None


# ---------------------------------------------------------------------------
# Section 1+2: per-step proxy + found-arch throughput (compiled scans)
# ---------------------------------------------------------------------------
def bench_proxy(detail):
    global INNER, INNER_HEAD
    _maybe_inject("bench_proxy")
    import jax
    import jax.numpy as jnp
    from jax import lax

    from mfas_tpu.core.optim import adam_init
    from mfas_tpu.fusion.ntu import (NTUFeatureExtractor,
                                     Searchable_Skeleton_Image_Net, tap_sizes)
    from mfas_tpu.core.module import Rng, partition
    from mfas_tpu.engine.classifier import ClassifierEngine
    from mfas_tpu.search.population import (PopulationSpec, PopulationTrainer,
                                            encode_confs, init_population)

    B = 16             # near the reference's batchsize=20, mesh-friendly
    IMG = 256          # the reference's NTU clip resolution (vid_dim 256)
    K = 15             # reference --num_samples
    if jax.default_backend() == "cpu":
        # safety net: without an accelerator the 256px ResNet-50 scans
        # would take tens of minutes per measurement — shrink the footprint
        # hard so the harness still completes (numbers then reflect CPU,
        # not TPU)
        B, IMG, INNER, INNER_HEAD = 2, 32, 1, 2
        args = _ntu_args(vid_len=(2, 32))
    else:
        args = _ntu_args()

    rs = np.random.RandomState(0)
    rgb = jnp.asarray(rs.randn(B, args.vid_len[0], IMG, IMG, 3), jnp.float32)
    ske = jnp.asarray(rs.randn(B, 3, args.vid_len[1], 25, 2), jnp.float32)
    label = jnp.asarray(rs.randint(0, 60, B), jnp.int32)
    wmask = jnp.ones((B,), jnp.float32)

    extractor = NTUFeatureExtractor(args)
    backbone_tree = extractor.init(0)

    sizes_ske, sizes_ims = tap_sizes(args)
    spec = PopulationSpec(
        sizes_a=tuple(sizes_ske), sizes_b=tuple(sizes_ims),
        hidden=args.inner_representation_size, num_outputs=60, max_rows=4,
        batchnorm=False, drpt=args.drpt, use_alphas=False, multitask=False)
    trainer = PopulationTrainer(spec, extractor.apply, backbone_tree)

    rows = [[a, b, n] for a in range(4) for b in range(4) for n in range(2)]
    confs_K = [np.array([rows[i % 32], rows[(7 * i) % 32]]) for i in range(K)]
    conf1 = [confs_K[0]]

    key = Rng(0).next()
    zero = jnp.float32(0.0)  # traced zero: defeats constant folding/DCE

    # ---- backbone feature extraction, INNER chained forwards
    @jax.jit
    def feats_loop(backbone_tree, rgb, ske, eps):
        def body(acc, _):
            fa, fb, lb, la = trainer._features(
                backbone_tree, (rgb + acc * eps, ske), key, train=True)
            return jnp.sum(lb) + jnp.sum(fa[:, 0, 0]), None

        acc, _ = lax.scan(body, jnp.float32(0), None, length=INNER)
        return acc

    t_backbone = _timeit(lambda: feats_loop(backbone_tree, rgb, ske, zero),
                         inner=INNER)

    # bf16 measurements (2 extra programs, minutes of remote compile each);
    # default ON so every round records them — MFAS_BENCH_BF16=0 to skip
    with_bf16 = os.environ.get("MFAS_BENCH_BF16", "1") != "0"

    t_backbone_bf16 = None
    if with_bf16:
        spec_bf16 = dataclasses.replace(spec, feature_dtype="bfloat16")
        trainer_bf16 = PopulationTrainer(spec_bf16, extractor.apply,
                                         backbone_tree)

        @jax.jit
        def feats_loop_bf16(backbone_tree, rgb, ske, eps):
            def body(acc, _):
                fa, fb, lb, la = trainer_bf16._features(
                    backbone_tree, (rgb + acc * eps, ske), key, train=True)
                return jnp.sum(lb) + jnp.sum(fa[:, 0, 0]), None

            acc, _ = lax.scan(body, jnp.float32(0), None, length=INNER)
            return acc

        t_backbone_bf16 = _timeit(
            lambda: feats_loop_bf16(backbone_tree, rgb, ske, zero),
            inner=INNER)

    fa, fb, lb, la = trainer._features(backbone_tree, (rgb, ske), key,
                                       train=True)

    # ---- head step, population of 1 (sequential unit) vs K: params/opt
    # naturally chain between scan iterations (real training steps)
    def make_pop_loop(confs):
        params, bn = init_population(confs, spec, seed=0)
        opt = adam_init(params)
        enc = {k: jnp.asarray(v) for k, v in encode_confs(confs, spec).items()}

        @jax.jit
        def loop(params, bn, opt):
            def body(carry, _):
                params, bn, opt = carry
                params, bn, opt, loss_c, corr_c = trainer._train_step(
                    params, bn, opt, enc, fa, fb, lb, la, label, wmask,
                    jnp.float32(1e-3), key)
                return (params, bn, opt), jnp.sum(loss_c)

            carry, losses = lax.scan(body, (params, bn, opt), None,
                                     length=INNER_HEAD)
            return jnp.sum(losses)

        return lambda: loop(params, bn, opt)

    t_head_seq1 = _timeit(make_pop_loop(conf1), inner=INNER_HEAD)
    t_head_popK = _timeit(make_pop_loop(confs_K), inner=INNER_HEAD)

    t_seq_candidate = t_backbone + t_head_seq1
    t_pop = t_backbone + t_head_popK
    speedup = K * t_seq_candidate / t_pop

    # ---- found-arch full train step throughput (clips/sec/chip)
    fargs = _ntu_args(inner_representation_size=256, drpt=0.4, multitask=True)
    model = Searchable_Skeleton_Image_Net(
        fargs, np.array([[3, 1, 1], [1, 3, 0], [1, 1, 1], [3, 3, 0]]))
    tree = model.init(0)
    engine = ClassifierEngine(model, multitask=True, input_keys=("rgb", "ske"))
    trainable, frozen = partition(tree, model.param_predicate())
    opt = adam_init(trainable)
    batch = {"rgb": rgb, "ske": ske, "label": label, "_mask": wmask}

    @jax.jit
    def full_loop(trainable, frozen, opt):
        def body(carry, _):
            trainable, frozen, opt = carry
            trainable, frozen, opt, loss, corr = engine._train_step_impl(
                trainable, frozen, opt, batch, jnp.float32(1e-3), key)
            return (trainable, frozen, opt), loss

        carry, losses = lax.scan(body, (trainable, frozen, opt), None,
                                 length=INNER)
        return jnp.sum(losses)

    t_full = _timeit(lambda: full_loop(trainable, frozen, opt), inner=INNER)

    # train-step FLOPs from XLA's client-side HLO cost analysis (no device
    # compile): fwd+bwd+Adam of the whole multitask net incl. backbones
    flops_step = None
    try:
        lowered = jax.jit(engine._train_step_impl).lower(
            trainable, frozen, opt, batch, jnp.float32(1e-3), key)
        cost = lowered.cost_analysis()
        if cost is None:
            # some jax versions only expose cost analysis post-compile.
            # NOTE: this compiles the bare (scan-less) step — a fresh HLO,
            # potentially minutes through a remote-compile tunnel; it only
            # runs on jax versions whose pre-compile cost_analysis is None,
            # and the persistent compile cache amortizes repeats
            cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_step = float(cost["flops"])
    except Exception as e:  # noqa: BLE001
        detail["cost_analysis_error"] = repr(e)

    t_full_bf16 = None
    if with_bf16:
        engine_bf16 = ClassifierEngine(model, multitask=True,
                                       input_keys=("rgb", "ske"),
                                       compute_dtype="bfloat16")

        @jax.jit
        def full_loop_bf16(trainable, frozen, opt):
            def body(carry, _):
                trainable, frozen, opt = carry
                trainable, frozen, opt, loss, corr = \
                    engine_bf16._train_step_impl(
                        trainable, frozen, opt, batch, jnp.float32(1e-3), key)
                return (trainable, frozen, opt), loss

            carry, losses = lax.scan(body, (trainable, frozen, opt), None,
                                     length=INNER)
            return jnp.sum(losses)

        t_full_bf16 = _timeit(lambda: full_loop_bf16(trainable, frozen, opt),
                              inner=INNER)

        # ---- bf16 found-train batch-size sweep (VERDICT r3 next-6):
        # the fixed-B headline hides where clips/s saturates; one compiled
        # scan per B, same net/optimizer, OOM recorded instead of crashing.
        # SETTLED (saturation at B32 documented, TPU_DESIGN.md §5.1):
        # lean-profile runs carry the last measurement forward.
        sweep_bs = (16, 32, 48, 64) if jax.default_backend() != "cpu" \
            else (2, 4)   # CPU: exercise the code path only
        if not FULL:
            sweep_bs = ()
            _carry_forward(detail,
                           ["found_train_bf16_batch_sweep_clips_per_s"],
                           "lean profile (MFAS_BENCH_FULL=0)")
        sweep = {}
        for bs in sweep_bs:
            if bs == B and t_full_bf16 is not None:
                sweep[str(bs)] = round(B / t_full_bf16, 2)
                continue
            try:
                rgb_s = jnp.asarray(
                    rs.randn(bs, args.vid_len[0], IMG, IMG, 3), jnp.float32)
                ske_s = jnp.asarray(
                    rs.randn(bs, 3, args.vid_len[1], 25, 2), jnp.float32)
                batch_s = {"rgb": rgb_s, "ske": ske_s,
                           "label": jnp.asarray(
                               rs.randint(0, 60, bs), jnp.int32),
                           "_mask": jnp.ones((bs,), jnp.float32)}

                # batch_s is a real ARGUMENT, not a closure: a closed-over
                # concrete array is embedded in the lowered module as a
                # constant, and at B>=48 the ~150 MB literal exceeded the
                # remote-compile transport's upload limit (HTTP 413) — the
                # sweep's old "error: JaxRuntimeError" entries were that,
                # not HBM OOM (probed round 4)
                @jax.jit
                def sweep_loop(trainable, frozen, opt, batch_s):
                    def body(carry, _):
                        trainable, frozen, opt = carry
                        trainable, frozen, opt, loss, corr = \
                            engine_bf16._train_step_impl(
                                trainable, frozen, opt, batch_s,
                                jnp.float32(1e-3), key)
                        return (trainable, frozen, opt), loss

                    carry, losses = lax.scan(
                        body, (trainable, frozen, opt), None, length=INNER)
                    return jnp.sum(losses)

                t_s = _timeit(
                    lambda: sweep_loop(trainable, frozen, opt, batch_s),
                    inner=INNER)
                sweep[str(bs)] = round(bs / t_s, 2)
                del rgb_s, ske_s, batch_s
            except Exception as e:  # noqa: BLE001 — OOM at large B is data
                sweep[str(bs)] = f"error: {type(e).__name__}"
        if sweep:   # lean profile: don't clobber the carried value with {}
            detail["found_train_bf16_batch_sweep_clips_per_s"] = sweep

    @jax.jit
    def infer_loop(trainable, frozen, eps):
        def body(acc, _):
            b = dict(batch)
            b["rgb"] = batch["rgb"] + acc * eps
            loss, corr = engine._eval_step_impl(trainable, frozen, b)
            return loss, None

        acc, _ = lax.scan(body, jnp.float32(0), None, length=INNER)
        return acc

    t_infer = _timeit(lambda: infer_loop(trainable, frozen, zero), inner=INNER)

    t_infer_bf16 = None
    if with_bf16:
        # serving dtype (tools/export_model.py --bf16 bakes the same
        # mixed-precision scheme into the StableHLO artifact)
        @jax.jit
        def infer_loop_bf16(trainable, frozen, eps):
            def body(acc, _):
                b = dict(batch)
                b["rgb"] = batch["rgb"] + acc * eps
                loss, corr = engine_bf16._eval_step_impl(trainable, frozen, b)
                return loss, None

            acc, _ = lax.scan(body, jnp.float32(0), None, length=INNER)
            return acc

        t_infer_bf16 = _timeit(
            lambda: infer_loop_bf16(trainable, frozen, zero), inner=INNER)

    peak = _peak_tflops(jax.devices()[0])
    detail.update({
        "batch": B, "img": IMG, "K": K,
        "baseline_definition": (
            "sequential unit = 1 backbone fwd + 1 single-candidate head "
            "train step per candidate, with ZERO model-build/checkpoint-"
            "reload/recompile cost charged (conservative); population unit "
            "= 1 backbone fwd + 1 vmapped K-candidate head train step"),
        "t_backbone_s": round(t_backbone, 4),
        "t_head_seq1_s": round(t_head_seq1, 4),
        "t_head_popK_s": round(t_head_popK, 4),
        "search_speedup_proxy": round(speedup, 3),
        "found_train_clips_per_s": round(B / t_full, 2),
        "found_infer_clips_per_s": round(B / t_infer, 2),
    })
    if t_infer_bf16 is not None:
        detail["found_infer_bf16_clips_per_s"] = round(B / t_infer_bf16, 2)
    if flops_step is not None:
        achieved = flops_step / t_full / 1e12
        detail["found_train_step_tflops"] = round(flops_step / 1e12, 3)
        detail["found_train_achieved_tflops_per_s"] = round(achieved, 2)
        if peak:
            detail["assumed_peak_bf16_tflops"] = peak
            detail["mfu_estimate"] = round(achieved / peak, 4)
    if t_backbone_bf16 is not None:
        detail["t_backbone_bf16_s"] = round(t_backbone_bf16, 4)
        detail["search_speedup_bf16_features"] = round(
            K * (t_backbone_bf16 + t_head_seq1)
            / (t_backbone_bf16 + t_head_popK), 3)
    if t_full_bf16 is not None:
        detail["found_train_bf16_clips_per_s"] = round(B / t_full_bf16, 2)
        if flops_step is not None and peak:
            detail["mfu_estimate_bf16"] = round(
                flops_step / t_full_bf16 / 1e12 / peak, 4)

    return speedup


# ---------------------------------------------------------------------------
# Section 3: end-to-end search wall-clock (real tiny EPNAS on packed data)
# ---------------------------------------------------------------------------
def _search_args(packed_dir, ckpt_dir, batch, **overrides):
    """Search-CLI args against a packed store (whose files already fix the
    input resolution; there is no separate image-size flag)."""
    import main_searchable_ntu as ms

    argv = sys.argv
    try:
        sys.argv = [
            "main_searchable_ntu.py",
            "--datadir", "", "--checkpointdir", ckpt_dir,
            "--packed_datadir", packed_dir,
            "--batchsize", str(batch), "--epochs", "1",
            "--search_iterations", "1", "--max_fusions", "2",
            "--num_samples", "4", "--epochs_surrogate", "10",
            "--random_backbones", "--no-verbose",
            "--device_input_normalize", "--seed", "0",
            # the default 16 loader threads thrash small bench hosts
            "--num_workers", "2",
            # few classes so 1-epoch candidates have NONZERO dev accuracy:
            # the reference's sampler draws with p ~ acc^(1/T) and crashes
            # on all-zero accuracies (preserved behavior)
            "--num_outputs", "4",
        ]
        args = ms.parse_args()
    finally:
        sys.argv = argv
    for k, v in overrides.items():
        setattr(args, k, v)
    return args


def bench_search_wallclock(detail, tmp_root):
    _maybe_inject("bench_search_wallclock")
    import jax

    from mfas_tpu.data.ntu_pack import make_synthetic_packed_ntu
    from mfas_tpu.search.searchers import NTUSearcher
    from mfas_tpu.fusion.ntu import Searchable_Skeleton_Image_Net

    # representative shapes: the reference's 256px clips; enough samples
    # that per-epoch fixed costs amortize (the real search runs thousands
    # of batches per level)
    on_tpu = jax.default_backend() != "cpu"
    img, batch = (256, 16) if on_tpu else (32, 4)
    n_train, n_dev = (128, 64) if on_tpu else (8, 4)
    epochs = 2 if on_tpu else 1
    packed = os.path.join(tmp_root, "packed")
    make_synthetic_packed_ntu(os.path.join(packed, "trainexp"), n=n_train,
                              frames=8, h=img, w=img, num_classes=4)
    make_synthetic_packed_ntu(os.path.join(packed, "dev"), n=n_dev,
                              frames=8, h=img, w=img, num_classes=4)

    def run_search(searcher=None, **overrides):
        if searcher is None:
            overrides.setdefault("epochs", epochs)
            args = _search_args(packed, tmp_root, batch, **overrides)
            searcher = NTUSearcher(args)
        np.random.seed(0)
        t0 = time.perf_counter()
        searcher.search()
        return time.perf_counter() - t0, searcher

    def min2(runs_key, *thunks):
        """min-of-N damping 1-core host noise; the individual run times are
        recorded so round-over-round variance is self-describing."""
        times = [t() for t in thunks]
        spreads[runs_key] = [round(t, 2) for t in times]
        return min(times)

    spreads = {}

    # run 1 pays the XLA compiles; later FRESH-searcher runs are the WARM
    # wall-clock of building a brand-new searcher — which by design reuses
    # this process's compiled programs (population.population_programs /
    # surrogate program cache), so it measures real re-setup cost (loader
    # + backbone build + bank extraction), not re-retrieval of
    # executables; RESIDENT runs re-enter search() on the same searcher
    # (live feature bank for the cached variant), the symmetric basis to
    # the sequential side below (which also times a resident engine — the
    # reference pays no per-candidate compile or retrace either).
    # min-of-N damps 1-core host-scheduling noise.
    wall_pop_cold, pop_searcher = run_search()
    args = pop_searcher.args
    n_trained = 32 + args.num_samples  # level 0 trains all 32 unfoldings,
    # level 1 trains the K sampled (reference searchable.py:48-137)

    # Build the sequential per-candidate engine NOW (same engine/shape as
    # the reference's candidate loop) so pop runs and per-candidate runs
    # can be timed in adjacent PAIRS below: this deployment's tunnel/host
    # throughput drifts minute to minute (observed r05: the same fed pop
    # search measured 73 s inside one bench run and 33-42 s half an hour
    # later), and when the two sides of the speedup ratio are measured
    # minutes apart the drift lands in the RATIO (observed official
    # headlines 9.26x vs 26.13x across runs of semantically identical
    # code). Pairing makes each ratio sample see one tunnel state; the
    # median pair-ratio is the headline.
    seq_args = _search_args(packed, tmp_root, batch, epochs=epochs,
                            sequential_candidates=True)
    seq_searcher = NTUSearcher(seq_args)
    seq = seq_searcher.train_fn
    from mfas_tpu.core.module import tree_set
    from mfas_tpu.core.sched import LRCosineAnnealingScheduler
    from mfas_tpu.engine.classifier import ClassifierEngine

    conf = np.array([[3, 1, 1], [1, 3, 0]])
    model = Searchable_Skeleton_Image_Net(seq_args, conf)
    tree = model.init(1)
    for attr, btree in seq.backbone_trees.items():
        tree = tree_set(tree, attr, btree)
    engine = ClassifierEngine(model, multitask=False,
                              input_keys=("rgb", "ske"),
                              batch_prep=seq.batch_prep)
    seq_loaders = seq_searcher.dataloaders
    sizes = {k: dl.dataset_size for k, dl in seq_loaders.items()}

    def one_candidate(num_epochs=epochs):
        sched = LRCosineAnnealingScheduler(
            seq_args.eta_max, seq_args.eta_min, seq_args.Ti, seq_args.Tm,
            sizes["train"] / seq_args.batchsize)
        t0 = time.perf_counter()
        engine.train_track_acc(tree, model.central_params(), seq_loaders,
                               sizes, sched, num_epochs=num_epochs,
                               print_loss=False)
        return time.perf_counter() - t0

    one_candidate()                      # cold (compiles train+eval)

    # 5 pairs on TPU: the median then survives TWO drift-poisoned pairs
    # (observed 2026-08-19: one pop run of nine stalled 345 s mid-tunnel,
    # putting a 1.97x ratio in its pair — with 3 pairs a second stall
    # would have made that the median). ~4 min extra, well inside budget.
    pairs = []                           # (t_pop, t_cand) timed back-to-back
    for _ in range(5 if on_tpu else 2):
        pairs.append((run_search()[0], one_candidate()))
    wall_pop = min(tp for tp, _ in pairs)
    t_cand = min(tc for _, tc in pairs)
    spreads["pop"] = [round(tp, 2) for tp, _ in pairs]
    spreads["seq_percand"] = [round(tc, 2) for _, tc in pairs]
    pair_ratios = sorted(n_trained * tc / tp for tp, tc in pairs)
    n_r = len(pair_ratios)
    speedup_paired = (pair_ratios[n_r // 2] if n_r % 2
                      else (pair_ratios[n_r // 2 - 1]
                            + pair_ratios[n_r // 2]) / 2)

    wall_pop_res = min2("pop_resident",
                        lambda: run_search(searcher=pop_searcher)[0],
                        lambda: run_search(searcher=pop_searcher)[0])

    # opt-in HBM-resident feature bank (--cache_features): backbones run
    # once per sample total, all later epochs/populations gather from HBM
    _, cached_searcher = run_search(cache_features=True)
    wall_pop_cached = min2("pop_cached",
                          lambda: run_search(cache_features=True)[0],
                          lambda: run_search(cache_features=True)[0])
    wall_pop_cached_res = min2(
        "pop_cached_resident",
        lambda: run_search(searcher=cached_searcher)[0],
        lambda: run_search(searcher=cached_searcher)[0])
    # bf16 features are the default under --cache_features (round 4;
    # ranking agreement rho=1.0, docs/PARITY.md) — label what was measured
    detail["cached_search_feature_dtype"] = str(
        cached_searcher.train_fn.trainer.spec.feature_dtype or "float32")

    # MEASURED sequential wall-clock: one full --sequential_candidates
    # EPNAS run of the SAME config — the reference's candidate loop run
    # for real (matches /root/reference/main_searchable_ntu.py:79-82's
    # printed measured search time). Includes per-candidate model build +
    # jit retrace + persistent-compile-cache retrieval, costs the
    # extrapolated basis below deliberately excludes; first-ever execution
    # additionally pays one-time XLA compiles for each distinct fusion
    # shape (served from the persistent cache on every later run).
    # worst observed cost: 2244 s on a slow-tunnel day (round 3) — the
    # guard must cover that, not just the typical ~700 s
    # SETTLED on the lean profile (measured r03: 2245 s, r04-era sidecars
    # carry 2200.61 s): the extrapolated basis it validates is unchanged
    # code, so official runs carry it; MFAS_BENCH_FULL=1 (or
    # MFAS_BENCH_SEQ_MEASURED=1) re-measures.
    wall_seq_measured = None
    _seq_default = "1" if FULL else "0"
    if os.environ.get("MFAS_BENCH_SEQ_MEASURED", _seq_default) != "0":
        if _budget_left() > 2600:
            wall_seq_measured = run_search(sequential_candidates=True)[0]
        else:
            reason = f"budget: {_budget_left():.0f}s left"
            detail["search_wallclock_seq_measured_skipped"] = reason
            _carry_forward(detail, ["search_wallclock_seq_measured_s",
                                    "search_wallclock_measured_speedup",
                                    "search_wallclock_cached_measured_speedup"],
                           reason)
    else:
        _carry_forward(detail, ["search_wallclock_seq_measured_s",
                                "search_wallclock_measured_speedup",
                                "search_wallclock_cached_measured_speedup"],
                       "lean profile (MFAS_BENCH_FULL=0)")

    # sequential wall-clock basis: candidates x the warm per-candidate
    # time measured in the interleaved pairs above (compile excluded —
    # see module docstring)
    wall_seq = n_trained * t_cand

    detail.update({
        "search_wallclock_pop_s": round(wall_pop, 2),
        "search_wallclock_pop_cold_s": round(wall_pop_cold, 2),
        "search_wallclock_pop_resident_s": round(wall_pop_res, 2),
        "search_wallclock_resident_speedup": round(wall_seq / wall_pop_res, 2),
        "search_wallclock_pop_cached_s": round(wall_pop_cached, 2),
        "search_wallclock_cached_speedup": round(wall_seq / wall_pop_cached, 2),
        "search_wallclock_pop_cached_resident_s": round(wall_pop_cached_res, 2),
        "search_wallclock_cached_resident_speedup": round(
            wall_seq / wall_pop_cached_res, 2),
        "search_wallclock_seq_s": round(wall_seq, 2),
        "search_wallclock_seq_percand_s": round(t_cand, 3),
        "search_wallclock_candidates": n_trained,
        "search_wallclock_run_spreads_s": spreads,
        "search_wallclock_config": {
            "img": img, "batch": batch, "n_train": n_train, "n_dev": n_dev,
            "search_iterations": 1, "max_fusions": 2, "num_samples": 4,
            "epochs": epochs},
        "search_wallclock_speedup": round(speedup_paired, 2),
        "search_wallclock_speedup_pairs": [round(r, 2) for r in pair_ratios],
        "search_wallclock_speedup_minbasis": round(wall_seq / wall_pop, 2),
        "search_wallclock_note": (
            "pop = full EPNAS loop incl. surrogate/sampling/host IO, WARM "
            "run (a NEW searcher in the same process; it shares the "
            "process's compiled programs by design — "
            "population_programs — so this is re-setup + training cost; "
            "the 1st run's one-time XLA compiles are pop_cold); seq = "
            "candidates x measured WARM "
            "per-candidate training wall-clock (per-candidate XLA compile "
            "and model-build excluded, matching basis: the reference pays "
            "no per-candidate compile). speedup = MEDIAN of per-PAIR "
            "ratios (each pop run timed back-to-back with a per-candidate "
            "run, so tunnel/host drift between the two sides of a ratio "
            "cancels; min-basis ratio kept for comparison). "
            "seq_measured = ONE real "
            "--sequential_candidates EPNAS run of the same config, "
            "including the per-candidate model-build/retrace costs the "
            "extrapolation excludes (headline speedups stay on the "
            "conservative extrapolated basis; *_measured_speedup uses the "
            "real run). resident_* = re-entering search() on the SAME "
            "searcher object: jit caches live, and for the cached variant "
            "the feature bank persists — the steady-state per-search-level "
            "cost of a long-running process (a real 197-candidate search "
            "builds the bank once and amortizes it over 11 levels). "
            "Conservative in the pop's favor on one axis only: all "
            "candidates are charged the measured 2-row head cost though "
            "the 32 level-0 entries train 1-row heads — immaterial at "
            "256px where the backbone forward dominates"),
    })
    if wall_seq_measured is not None:
        detail.update({
            "search_wallclock_seq_measured_s": round(wall_seq_measured, 2),
            "search_wallclock_measured_speedup": round(
                wall_seq_measured / wall_pop, 2),
            "search_wallclock_cached_measured_speedup": round(
                wall_seq_measured / wall_pop_cached, 2),
        })

    # amortization trend: one LARGER config (2 search iterations x 3
    # fusion levels, K=8 -> 32 + 5*8 = 72 candidates) so per-level fixed
    # costs (surrogate fit, sampling, bank build) are shown to amortize
    # rather than asserted. Sequential basis = extrapolation from the
    # same measured warm per-candidate cost.
    _trend_keys = ["search_trend_config", "search_trend_candidates",
                   "search_trend_pop_s", "search_trend_pop_cached_s",
                   "search_trend_seq_s", "search_trend_speedup",
                   "search_trend_cached_speedup"]
    _trend_on = os.environ.get("MFAS_BENCH_TREND",
                               "1" if FULL else "0") != "0"
    if on_tpu and not _trend_on:
        # SETTLED (amortization shown at 26.4x/200x, r04 sidecar)
        _carry_forward(detail, _trend_keys, "lean profile (MFAS_BENCH_FULL=0)")
    elif on_tpu and _trend_on and _budget_left() <= 900:
        _carry_forward(detail, _trend_keys,
                       f"budget: {_budget_left():.0f}s left")
    if (on_tpu and _trend_on and _budget_left() > 900):
        # NOTE: the CLI's --max_fusions parses into args.max_progression_levels
        big = dict(search_iterations=2, max_progression_levels=3,
                   num_samples=8)
        run_search(**big)                            # compiles (3-row head)
        big_pop = min2("trend_pop", lambda: run_search(**big)[0],
                       lambda: run_search(**big)[0])
        run_search(cache_features=True, **big)
        big_pop_cached = min2(
            "trend_pop_cached",
            lambda: run_search(cache_features=True, **big)[0],
            lambda: run_search(cache_features=True, **big)[0])
        n_big = 32 + (big["search_iterations"]
                      * big["max_progression_levels"] - 1) \
            * big["num_samples"]
        detail.update({
            "search_trend_config": big,
            "search_trend_candidates": n_big,
            "search_trend_pop_s": round(big_pop, 2),
            "search_trend_pop_cached_s": round(big_pop_cached, 2),
            "search_trend_seq_s": round(n_big * t_cand, 2),
            "search_trend_speedup": round(n_big * t_cand / big_pop, 2),
            "search_trend_cached_speedup": round(
                n_big * t_cand / big_pop_cached, 2),
        })

    # FULL-SCALE config: the reference's actual NTU search shape
    # (/root/reference/main_searchable_ntu.py defaults: 3 search
    # iterations x 4 progression levels, K=15, epochs=3 ->
    # 32 + 11*15 = 197 candidates; SURVEY §3.2). The tiny configs above
    # isolate per-level mechanics; this answers BASELINE.md's "search
    # wall-clock" question directly: what does the WHOLE search cost on
    # one chip? Population side runs the recommended --cache_features
    # config; the sequential basis is re-measured at 3 epochs (same warm
    # engine — more epochs is the same program run longer).
    # MFAS_BENCH_FULLSCALE: "1" = run on TPU (default only under
    # MFAS_BENCH_FULL=1 — SETTLED at 547x cached / 24.5x uncached, r04
    # sidecar), "0" = skip/carry, "force" = run even on CPU (tiny-shape
    # smoke of the section itself)
    _fullscale_env = os.environ.get("MFAS_BENCH_FULLSCALE",
                                    "1" if FULL else "0")
    _fullscale_on = (_fullscale_env != "0"
                     and (on_tpu or _fullscale_env == "force"))
    _fullscale_keys = ["search_fullscale_pop_cached_s",
                       "search_fullscale_pop_cached_cold_s",
                       "search_fullscale_pop_cached_resident_s",
                       "search_fullscale_pop_s",
                       "search_fullscale_seq_percand_s",
                       "search_fullscale_seq_s",
                       "search_fullscale_cached_speedup",
                       "search_fullscale_cached_resident_speedup",
                       "search_fullscale_speedup",
                       "search_fullscale_candidates",
                       "search_fullscale_config"]
    if on_tpu and not _fullscale_on:
        _carry_forward(detail, _fullscale_keys,
                       "lean profile (MFAS_BENCH_FULL=0)")
    if _fullscale_on and _budget_left() <= 900:
        _carry_forward(detail, _fullscale_keys,
                       f"budget: {_budget_left():.0f}s left")
    if _fullscale_on and _budget_left() > 900:
        full = dict(search_iterations=3, max_progression_levels=4,
                    num_samples=15, epochs=3)
        t_cand3 = min2("fullscale_seq_percand",
                       lambda: one_candidate(3), lambda: one_candidate(3))
        n_full = 32 + (full["search_iterations"]
                       * full["max_progression_levels"] - 1) \
            * full["num_samples"]
        # cold run compiles the 3- and 4-row population programs (one-time;
        # persistent cache serves them on later rounds)
        full_cold, full_searcher = run_search(cache_features=True, **full)
        full_pop_cached = min2(
            "fullscale_pop_cached",
            lambda: run_search(cache_features=True, **full)[0],
            lambda: run_search(cache_features=True, **full)[0])
        full_pop_cached_res = min2(
            "fullscale_pop_cached_resident",
            lambda: run_search(searcher=full_searcher)[0],
            lambda: run_search(searcher=full_searcher)[0])
        detail.update({
            "search_fullscale_config": full,
            "search_fullscale_candidates": n_full,
            "search_fullscale_pop_cached_cold_s": round(full_cold, 2),
            "search_fullscale_pop_cached_s": round(full_pop_cached, 2),
            "search_fullscale_pop_cached_resident_s": round(
                full_pop_cached_res, 2),
            "search_fullscale_seq_percand_s": round(t_cand3, 3),
            "search_fullscale_seq_s": round(n_full * t_cand3, 2),
            "search_fullscale_cached_speedup": round(
                n_full * t_cand3 / full_pop_cached, 2),
            "search_fullscale_cached_resident_speedup": round(
                n_full * t_cand3 / full_pop_cached_res, 2),
        })
        if _budget_left() > 1200:
            # one non-cached run for the same structure (backbones re-run
            # per epoch per level — what --cache_features removes)
            full_pop = min2("fullscale_pop",
                            lambda: run_search(**full)[0])
            detail.update({
                "search_fullscale_pop_s": round(full_pop, 2),
                "search_fullscale_speedup": round(
                    n_full * t_cand3 / full_pop, 2),
            })


# ---------------------------------------------------------------------------
# Section 4: end-to-end input-fed found-arch training throughput
# ---------------------------------------------------------------------------
def bench_e2e_input(detail, tmp_root):
    _maybe_inject("bench_e2e_input")
    import jax
    import jax.numpy as jnp

    from mfas_tpu.core.module import Rng, partition
    from mfas_tpu.core.optim import adam_init
    from mfas_tpu.data.loader import MapLoader
    from mfas_tpu.data.ntu import Compose, NormalizeLen
    from mfas_tpu.data.ntu_pack import (PackedNTU,
                                        make_device_normalize_prep,
                                        make_synthetic_packed_ntu)
    from mfas_tpu.engine.classifier import ClassifierEngine
    from mfas_tpu.fusion.ntu import Searchable_Skeleton_Image_Net

    on_tpu = jax.default_backend() != "cpu"
    B, IMG = (16, 256) if on_tpu else (2, 32)
    fargs = _ntu_args(inner_representation_size=256, drpt=0.4,
                      multitask=True, modality="both", no_norm=False)
    if not on_tpu:
        fargs.vid_len = (2, 32)

    store = os.path.join(tmp_root, "e2e")
    n = 12 * B   # enough batches that prefetch startup amortizes
    make_synthetic_packed_ntu(store, n=n, frames=fargs.vid_len[0],
                              h=IMG, w=IMG)
    ds = PackedNTU(store, transform=Compose([NormalizeLen(fargs.vid_len)]),
                   args=fargs, device_normalize=True)
    loader = MapLoader(ds, B, shuffle=True, num_workers=4, prefetch=2)

    model = Searchable_Skeleton_Image_Net(
        fargs, np.array([[3, 1, 1], [1, 3, 0], [1, 1, 1], [3, 3, 0]]))
    tree = model.init(0)
    engine = ClassifierEngine(model, multitask=True,
                              input_keys=("rgb", "ske"),
                              batch_prep=make_device_normalize_prep())
    trainable, frozen = partition(tree, model.param_predicate())
    opt = adam_init(trainable)
    rng = Rng(7)

    def epoch():
        nonlocal trainable, frozen, opt
        t0 = time.perf_counter()
        nb = 0
        last = None
        for _, batch in engine._prefetched(loader):
            trainable, frozen, opt, loss, corr = engine._train_step(
                trainable, frozen, opt, batch, jnp.float32(1e-3), rng.next())
            last = loss
            nb += 1
        float(np.asarray(last))          # fence
        return time.perf_counter() - t0, nb

    epoch()                              # cold: compile + page-in
    t1, nb = epoch()
    t2, _ = epoch()
    detail["e2e_epoch_runs_s"] = [round(t1, 2), round(t2, 2)]
    t = min(t1, t2)
    detail["e2e_train_clips_per_s"] = round(nb * B / t, 2)
    detail["e2e_config"] = {"batch": B, "img": IMG, "n_samples": n,
                            "num_workers": 4, "device_normalize": True}

    # H2D strategy experiment (VERDICT r3 next-4): split each batch's
    # transfer into N device_puts issued from the prefetch thread
    # (data/loader.chunked_device_put). If smaller puts interleave with
    # the running step, epoch time drops toward the h2d bound and the
    # old serialization was the LOADER's single blocking put; if it is
    # unchanged (or worse), the serialization is the transport's.
    # SETTLED (negative result: chunking is a wash/worse, r04 sidecar +
    # TPU_DESIGN.md §5.1) — lean-profile runs carry it forward.
    if FULL:
        chunk_runs = {}
        for n_chunks in (2, 4):
            engine.h2d_chunks = n_chunks
            epoch()                      # warm the concat programs
            c1, _ = epoch()
            c2, _ = epoch()
            chunk_runs[str(n_chunks)] = round(nb * B / min(c1, c2), 2)
        engine.h2d_chunks = None
        detail["e2e_train_clips_per_s_chunked"] = chunk_runs
    else:
        _carry_forward(detail, ["e2e_train_clips_per_s_chunked"],
                       "lean profile (MFAS_BENCH_FULL=0)")

    # HBM-resident path (data/resident.py): the store is uploaded once and
    # batches become index plans (a few KB over the link); gather +
    # temporal resample + normalize run inside the jitted step. On a
    # transport that serializes H2D with execution this removes the
    # per-batch transfer term entirely — the epoch should land on the
    # device_step_resident bound below.
    from mfas_tpu.data.resident import (ResidentLoader, ResidentNTUStore,
                                        make_resident_prep)
    res_loader = ResidentLoader(
        ResidentNTUStore(store, args=fargs), B,
        transform=Compose([NormalizeLen(fargs.vid_len)]), shuffle=True)
    res_engine = ClassifierEngine(model, multitask=True,
                                  input_keys=("rgb", "ske"),
                                  batch_prep=make_resident_prep())
    r_trainable, r_frozen = partition(tree, model.param_predicate())
    r_opt = adam_init(r_trainable)

    def res_epoch():
        nonlocal r_trainable, r_frozen, r_opt
        t0 = time.perf_counter()
        nb2 = 0
        last = None
        for _, batch in res_engine._prefetched(res_loader):
            r_trainable, r_frozen, r_opt, loss, corr = res_engine._train_step(
                r_trainable, r_frozen, r_opt, batch, jnp.float32(1e-3),
                rng.next())
            last = loss
            nb2 += 1
        float(np.asarray(last))
        return time.perf_counter() - t0, nb2

    res_epoch()                          # cold: compile + store upload
    r1, rnb = res_epoch()
    r2, _ = res_epoch()
    detail["e2e_train_clips_per_s_resident"] = round(
        rnb * B / min(r1, r2), 2)

    # bf16 + resident: the production configuration (--hbm_resident
    # --bf16, main_found_ntu.py). The resident path sits at the f32 step
    # bound; bf16 lowers the step bound itself, so this is the full e2e
    # training ceiling of the framework on this link.
    if os.environ.get("MFAS_BENCH_BF16", "1") != "0":
        # production wiring (main_found_ntu.py --hbm_resident --bf16):
        # the prep emits bf16 straight from the XLA gather+normalize
        # (affine in f32, one rounding on the store), so the f32
        # intermediate never round-trips HBM (r4 VERDICT item 5;
        # Pallas variants measured and rejected, TPU_DESIGN.md §5.4)
        res_engine = ClassifierEngine(model, multitask=True,
                                      input_keys=("rgb", "ske"),
                                      batch_prep=make_resident_prep(
                                          compute_dtype="bfloat16"),
                                      compute_dtype="bfloat16")
        r_trainable, r_frozen = partition(tree, model.param_predicate())
        r_opt = adam_init(r_trainable)
        res_epoch()                      # cold: compile the bf16 programs
        rb1, rnb = res_epoch()
        rb2, _ = res_epoch()
        detail["e2e_train_clips_per_s_resident_bf16"] = round(
            rnb * B / min(rb1, rb2), 2)

    # breakdown: where does the e2e epoch go? (a) host produce+collate
    # only (no device), (b) compiled step only on one resident batch —
    # together with the raw H2D transfer below these explain any gap to
    # the link-bound ceiling.
    def host_only_epoch():
        t0 = time.perf_counter()
        nb2 = 0
        for batch in loader:
            nb2 += 1
        return (time.perf_counter() - t0) / nb2

    host_only_epoch()
    t_host = min(host_only_epoch(), host_only_epoch())

    resident = self_batch = None
    for batch in loader:
        self_batch = {k: jnp.asarray(v) for k, v in batch.items()}
        break
    resident = self_batch

    def step_only():
        nonlocal trainable, frozen, opt
        t0 = time.perf_counter()
        last = None
        for _ in range(4):
            trainable, frozen, opt, loss, corr = engine._train_step(
                trainable, frozen, opt, resident, jnp.float32(1e-3),
                rng.next())
            last = loss
        float(np.asarray(last))
        return (time.perf_counter() - t0) / 4

    step_only()
    t_step = min(step_only(), step_only())
    detail["e2e_breakdown_per_batch_s"] = {
        "host_produce_collate": round(t_host, 4),
        "device_step_resident": round(t_step, 4),
        "epoch_total": round(t / nb, 4)}
    detail["e2e_note"] = (
        "epoch_total ~= device_step + H2D transfer: this remote-tunneled "
        "backend serializes device_put with program execution, so the "
        "prefetch thread cannot overlap them and the h2d bound below "
        "(which assumes overlap) is unreachable here; the host produce+"
        "collate side is fully hidden. A locally-attached chip overlaps "
        "H2D DMA with compute.")

    # raw host->device bandwidth at the same transfer size, so the e2e
    # number is self-explaining when the link (e.g. a remote-tunneled
    # chip) is the bottleneck rather than the input pipeline or the step
    buf = np.zeros((B, fargs.vid_len[0], IMG, IMG, 3), np.uint8)

    def put_fenced():
        # scalar read-back fences the transfer (block_until_ready defers
        # on the remote-tunneled backend)
        arr = jax.device_put(buf)
        return int(np.asarray(arr[0, 0, 0, 0, 0]))

    put_fenced()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        put_fenced()
        times.append(time.perf_counter() - t0)
    h2d = buf.nbytes / np.median(times) / 1e9
    detail["h2d_gbps"] = round(h2d, 3)
    detail["e2e_h2d_bound_clips_per_s"] = round(
        h2d * 1e9 / (buf.nbytes / B), 2)


# ---------------------------------------------------------------------------
# Section 5: host input pipeline (native C++ gather+normalize)
# ---------------------------------------------------------------------------
def bench_host_input(detail):
    _maybe_inject("bench_host_input")
    from mfas_tpu.data import native as nat

    B, IMG, T = 16, 256, 8
    store = np.random.RandomState(1).randint(
        0, 256, (64, T, IMG, IMG, 3), np.uint8)
    idx = np.random.RandomState(2).randint(0, 64, B).astype(np.int64)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)

    best = (0.0, None)
    for nt in (1, 2, 4):
        nat.gather_normalize_u8(store, idx, mean, std, num_threads=nt)
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = nat.gather_normalize_u8(store, idx, mean, std,
                                          num_threads=nt)
            times.append(time.perf_counter() - t0)
        gbps = out.nbytes * 1.25 / np.median(times) / 1e9
        if gbps > best[0]:
            best = (gbps, nt)
    detail["native_input_normalize_gbps"] = round(best[0], 2)
    detail["native_input_normalize_threads"] = best[1]


def main():
    import tempfile

    _install_signal_fallback()

    from mfas_tpu.runtime.compile_cache import device_init_hangs
    if device_init_hangs():
        # No measurement is possible. value/vs_baseline are 0.0 so a naive
        # parser can never record stale data as fresh (ADVICE r3); the last
        # on-chip figure rides under distinct last_recorded_* keys, and the
        # failed attempt is timestamped into bench_detail.json so the
        # reprint's age is machine-readable (VERDICT r3 next-2).
        here = os.path.dirname(os.path.abspath(__file__))
        sidecar = os.path.join(here, "bench_detail.json")
        try:
            with open(sidecar) as f:
                last = json.load(f)
        except Exception:          # missing OR truncated/corrupt sidecar
            last = {}
        attempts = list(last.get("tpu_unreachable_attempts", []))[-19:]
        attempts.append(time.strftime("%Y-%m-%dT%H:%M:%S%z"))
        last["tpu_unreachable_attempts"] = attempts
        try:
            with open(sidecar + ".tmp", "w") as f:
                json.dump(last, f, indent=1)
            os.replace(sidecar + ".tmp", sidecar)
        except OSError:
            pass
        print(json.dumps({
            "metric": last.get(
                "metric", "mfas_search_speedup_vs_sequential_candidates"),
            "value": 0.0,
            "unit": last.get("unit", "x"),
            "vs_baseline": 0.0,
            "tpu_unreachable": True,
            "last_recorded_value": last.get("value"),
            "last_recorded_vs_baseline": last.get("vs_baseline"),
            "last_recorded_at": last.get("measured_at"),
            "note": ("device init cannot complete (TPU tunnel down/"
                     "wedged); no fresh measurement — last on-chip run is "
                     "under last_recorded_*"),
        }))
        return

    from mfas_tpu.runtime.compile_cache import \
        enable_persistent_compilation_cache
    cache_dir = enable_persistent_compilation_cache()

    import jax

    detail = {"device": str(jax.devices()[0]),
              "device_kind": getattr(jax.devices()[0], "device_kind", "?"),
              "compile_cache_dir": cache_dir,
              "bench_profile": "full" if FULL else "lean"}
    fast = os.environ.get("MFAS_BENCH_FAST") == "1"

    # snapshot the previous run's sidecar BEFORE the first _emit rewrites
    # it: _carry_forward's lazy read would otherwise "carry" from this
    # run's own partial record whenever no carry ran inside bench_proxy
    # (MFAS_BENCH_FULL=1, or bench_proxy raising), permanently erasing the
    # previous run's seq-measured/trend/fullscale history
    prev = _load_prev_sidecar()
    prev_attempts = prev.get("tpu_unreachable_attempts")

    try:
        speedup = bench_proxy(detail)
    except Exception as e:  # noqa: BLE001 — the final JSON line must print
        detail["bench_proxy_error"] = repr(e)
        speedup = 0.0

    # headline: the measured END-TO-END search wall-clock speedup on the
    # conservative (extrapolated-sequential) basis once the wall-clock
    # section has run; the per-step proxy is the interim headline (and the
    # final one for fast/CPU runs). Both bases and the fully-measured
    # ratios live in the detail record. A record line is emitted after
    # EVERY section: the driver tails stdout and the last line wins, so a
    # kill mid-section still leaves the freshest complete record.
    def headline():
        return detail.get("search_wallclock_speedup", speedup)

    _emit(detail, headline(), prev_attempts, partial_after="bench_proxy")

    hang = float(os.environ.get("MFAS_BENCH_HANG_S", "0"))
    if hang:   # test hook: simulate a stuck section (SIGTERM-fallback test)
        time.sleep(hang)

    with tempfile.TemporaryDirectory() as tmp_root:
        if not fast:
            for section in (bench_search_wallclock, bench_e2e_input):
                try:
                    section(detail, tmp_root)
                except Exception as e:  # noqa: BLE001
                    detail[section.__name__ + "_error"] = repr(e)
                _emit(detail, headline(), prev_attempts,
                      partial_after=section.__name__)
        try:
            bench_host_input(detail)
        except Exception as e:  # noqa: BLE001
            detail["bench_host_input_error"] = repr(e)

    detail["bench_wallclock_s"] = round(time.perf_counter() - _T0, 1)
    _emit(detail, headline(), prev_attempts)


if __name__ == "__main__":
    main()
