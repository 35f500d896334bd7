"""Population-parallel candidate training — the TPU-native replacement for
the reference's sequential per-candidate loop (SURVEY.md §2.2: "the headline
TPU feature"; reference models/search/ntu_searchable.py:38-102 trains ~197
candidates one by one, re-running the frozen backbones for every one).

Key observations making this sound:
  * during search only ``central_params()`` train — both backbones are
    frozen (ntu_searchable.py:59-62), so backbone features per batch can be
    computed ONCE and shared by every candidate;
  * candidates are independent — a *population* axis with zero
    communication, mapped with ``vmap`` (single chip) and shardable over a
    mesh ``pop`` axis (multi chip).

Heterogeneous fusion shapes (SURVEY §7.3 hard part 1) are handled by
padding: every tap is zero-padded to the widest tap of its modality, every
candidate's per-row Linear is embedded in a (hidden, Cmax_a+Cmax_b+hidden)
matrix whose padding columns only ever multiply zeros, and confs shorter
than ``max_rows`` carry the previous row's output through masked rows.
Per-row initialization uses the candidate's TRUE fan-in so each padded
layer is distributionally identical to the reference's
``nn.Linear(in_size, hidden)``.

The entire population's forward+backward+Adam is ONE jitted XLA program;
conf index tensors are traced arguments, so every search step with the same
population size reuses the same compilation.
"""

from __future__ import annotations

import itertools
import math
from dataclasses import astuple, dataclass

import numpy as np

import jax
import jax.numpy as jnp

from mfas_tpu.core import functional as F
from mfas_tpu.core.module import Ctx, Rng
from mfas_tpu.core.optim import adam_init, adam_update

# process-wide token source for the dev-feature cache (never reused, unlike
# id() after GC)
_cache_token_counter = itertools.count(1)


@dataclass
class PopulationSpec:
    sizes_a: tuple          # tap widths, modality A (ske / audio)
    sizes_b: tuple          # tap widths, modality B (rgb / image)
    hidden: int
    num_outputs: int
    max_rows: int
    batchnorm: bool = False
    drpt: float = 0.0
    use_alphas: bool = False
    multitask: bool = False
    weight_decay: float = 1e-4
    # optional reduced-precision frozen-backbone features ('bfloat16'):
    # the backbones are frozen during search, so feature precision only
    # perturbs candidate scores, not the final found-arch training
    feature_dtype: str | None = None

    @property
    def cmax_a(self):
        return max(self.sizes_a)

    @property
    def cmax_b(self):
        return max(self.sizes_b)

    @property
    def in_max(self):
        return self.cmax_a + self.cmax_b + self.hidden


# --------------------------------------------------------------------------
# conf encoding / parameter init
# --------------------------------------------------------------------------
def encode_confs(confs, spec: PopulationSpec):
    """List of (L_i, 3) int confs -> dict of (P, R) arrays + row mask."""
    P, R = len(confs), spec.max_rows
    sel_a = np.zeros((P, R), np.int32)
    sel_b = np.zeros((P, R), np.int32)
    act = np.zeros((P, R), np.int32)
    row_mask = np.zeros((P, R), np.float32)
    for p, conf in enumerate(confs):
        conf = np.asarray(conf)
        L = len(conf)
        sel_a[p, :L] = conf[:, 0]
        sel_b[p, :L] = conf[:, 1]
        act[p, :L] = conf[:, 2]
        row_mask[p, :L] = 1.0
    return {"sel_a": sel_a, "sel_b": sel_b, "act": act, "row_mask": row_mask}


def init_population(confs, spec: PopulationSpec, seed=0):
    """Stacked fusion-head params with per-candidate true-fan-in init."""
    P, R = len(confs), spec.max_rows
    rs = np.random.RandomState(seed)
    H, In = spec.hidden, spec.in_max
    ca, cb = spec.cmax_a, spec.cmax_b

    W = np.zeros((P, R, H, In), np.float32)
    b = np.zeros((P, R, H), np.float32)
    alpha = np.zeros((P, R), np.float32)
    cls_w = np.zeros((P, spec.num_outputs, H), np.float32)
    cls_b = np.zeros((P, spec.num_outputs), np.float32)

    for p, conf in enumerate(confs):
        conf = np.asarray(conf)
        for r in range(len(conf)):
            na = spec.sizes_a[int(conf[r, 0])]
            nb = spec.sizes_b[int(conf[r, 1])]
            fan_in = na + nb + (H if r > 0 else 0)
            bound = 1.0 / math.sqrt(fan_in)
            W[p, r, :, :na] = rs.uniform(-bound, bound, (H, na))
            W[p, r, :, ca:ca + nb] = rs.uniform(-bound, bound, (H, nb))
            if r > 0:
                W[p, r, :, ca + cb:] = rs.uniform(-bound, bound, (H, H))
            b[p, r] = rs.uniform(-bound, bound, H)
        if spec.use_alphas:
            alpha[p, :len(conf)] = rs.normal(0.0, 0.1, len(conf))
        cb_bound = 1.0 / math.sqrt(H)
        cls_w[p] = rs.uniform(-cb_bound, cb_bound, (spec.num_outputs, H))
        cls_b[p] = rs.uniform(-cb_bound, cb_bound, spec.num_outputs)

    params = {"W": jnp.asarray(W), "b": jnp.asarray(b),
              "cls_w": jnp.asarray(cls_w), "cls_b": jnp.asarray(cls_b)}
    if spec.use_alphas:
        params["alpha"] = jnp.asarray(alpha)
    if spec.batchnorm:
        params["bn_scale"] = jnp.ones((P, R, H), jnp.float32)
        params["bn_bias"] = jnp.zeros((P, R, H), jnp.float32)
    bn_state = {"mean": jnp.zeros((P, R, H), jnp.float32),
                "var": jnp.ones((P, R, H), jnp.float32)}
    return params, bn_state


def pad_taps(taps, cmax):
    """List of (B, C_i) pooled taps -> (B, n_taps, cmax), zero padded."""
    padded = [jnp.pad(t, ((0, 0), (0, cmax - t.shape[1]))) for t in taps]
    return jnp.stack(padded, axis=1)


def _quantize_rows(x):
    """Symmetric int8 over the channel (last) axis: per-row float32
    absmax/127 scale, values round-to-nearest clipped to [-127, 127].
    Rows are (sample, tap) for padded tap stacks (B, T, C) and (sample,)
    for logits (B, C) — the scale keeps each row's relative error at
    ~0.4% of its own absmax, independent of cross-row dynamic range."""
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _bank_value(got, k):
    """Dequantize one gathered bank column (the single definition of the
    int8-bank contract, used by the fused-epoch and per-batch paths): int8
    banks carry a per-row ``"<k>_scale"`` float32 factor from
    ``_quantize_rows``; dequant fuses into the consumer right after the
    gather, so only int8 rows ever move out of the bank — 4x less gather
    traffic than f32, and 4x less ICI for a sharded bank. f32/bf16 banks
    have no scale entry and pass through as float32."""
    x = got[k].astype(jnp.float32)
    s = got.get(k + "_scale")
    return x * s if s is not None else x


# --------------------------------------------------------------------------
# weight sharing across search steps (reference ntu_searchable.py:123-175)
# --------------------------------------------------------------------------
def _row_spans(spec, conf_row, row_index):
    na = spec.sizes_a[int(conf_row[0])]
    nb = spec.sizes_b[int(conf_row[1])]
    with_prev = row_index > 0
    return na, nb, with_prev


def extract_shared_states(params, bn_state, confs, spec, state_dict,
                          verbose=False):
    """Slice each candidate's padded row weights back to the TRUE shapes and
    store them under the reference's '{i}.L_{in}_{out}.A_{act}' keys, in the
    same nested Sequential layout the sequential trainer uses — the two
    trainer modes share one state_dict format. Candidates are written in
    population order (last wins per key, matching the final state after the
    reference's sequential pass)."""
    from mfas_tpu.fusion.layers import shared_weight_key

    H, ca, cb = spec.hidden, spec.cmax_a, spec.cmax_b
    W = np.asarray(params["W"])
    b = np.asarray(params["b"])
    if spec.batchnorm:
        # one bulk D2H transfer per array — per-(candidate,row) device
        # indexing would cost a round-trip each on remote deployments
        bn_scale = np.asarray(params["bn_scale"])
        bn_bias = np.asarray(params["bn_bias"])
        bn_mean = np.asarray(bn_state["mean"])
        bn_var = np.asarray(bn_state["var"])
    for p, conf in enumerate(confs):
        conf = np.asarray(conf)
        for r in range(len(conf)):
            na, nb, with_prev = _row_spans(spec, conf[r], r)
            in_size = na + nb + (H if with_prev else 0)
            pieces = [W[p, r, :, :na], W[p, r, :, ca:ca + nb]]
            if with_prev:
                pieces.append(W[p, r, :, ca + cb:ca + cb + H])
            entry = {"0": {"weight": np.concatenate(pieces, axis=1),
                           "bias": b[p, r].copy()}}
            if spec.batchnorm:
                # BN sits at Sequential slot 2 (Linear, act, BN, Dropout)
                entry["2"] = {
                    "weight": bn_scale[p, r].copy(),
                    "bias": bn_bias[p, r].copy(),
                    "running_mean": bn_mean[p, r].copy(),
                    "running_var": bn_var[p, r].copy(),
                    "num_batches_tracked": np.asarray(0, np.int32),
                }
            key = shared_weight_key(r, in_size, H, conf[r, 2])
            if verbose:
                print(("Updating" if key in state_dict else "Creating")
                      + " shared weight with ID: {}".format(key))
            state_dict[key] = entry
    return state_dict


def inject_shared_states(params, bn_state, confs, spec, state_dict,
                         verbose=False):
    """Load stored true-shape layers into the padded population slots where
    the '{i}.L_{in}_{out}.A_{act}' key matches."""
    from mfas_tpu.fusion.layers import shared_weight_key

    H, ca, cb = spec.hidden, spec.cmax_a, spec.cmax_b
    W = np.asarray(params["W"]).copy()
    b = np.asarray(params["b"]).copy()
    bn_scale = (np.asarray(params["bn_scale"]).copy()
                if spec.batchnorm else None)
    bn_bias = (np.asarray(params["bn_bias"]).copy()
               if spec.batchnorm else None)
    mean = np.asarray(bn_state["mean"]).copy()
    var = np.asarray(bn_state["var"]).copy()

    for p, conf in enumerate(confs):
        conf = np.asarray(conf)
        for r in range(len(conf)):
            na, nb, with_prev = _row_spans(spec, conf[r], r)
            in_size = na + nb + (H if with_prev else 0)
            key = shared_weight_key(r, in_size, H, conf[r, 2])
            if key not in state_dict:
                continue
            entry = state_dict[key]
            lw = np.asarray(entry["0"]["weight"])
            W[p, r, :, :na] = lw[:, :na]
            W[p, r, :, ca:ca + nb] = lw[:, na:na + nb]
            if with_prev:
                W[p, r, :, ca + cb:ca + cb + H] = lw[:, na + nb:]
            b[p, r] = np.asarray(entry["0"]["bias"])
            if spec.batchnorm and "2" in entry:
                bn_scale[p, r] = np.asarray(entry["2"]["weight"])
                bn_bias[p, r] = np.asarray(entry["2"]["bias"])
                mean[p, r] = np.asarray(entry["2"]["running_mean"])
                var[p, r] = np.asarray(entry["2"]["running_var"])
            if verbose:
                print("Loaded shared weight with ID: {}".format(key))

    params = dict(params)
    params["W"] = jnp.asarray(W)
    params["b"] = jnp.asarray(b)
    if spec.batchnorm:
        params["bn_scale"] = jnp.asarray(bn_scale)
        params["bn_bias"] = jnp.asarray(bn_bias)
    return params, {"mean": jnp.asarray(mean), "var": jnp.asarray(var)}


# --------------------------------------------------------------------------
# per-candidate forward (vmapped over the population axis)
# --------------------------------------------------------------------------
def _candidate_forward(spec, params_c, bn_c, conf_c, feats_a, feats_b,
                       train, rng_c, wmask=None):
    """One candidate's fusion head over shared padded taps.
    feats_a: (B, n_taps_a, cmax_a); returns (logits, new_bn_state).
    wmask (B,): validity weights — a ragged final batch is padded by
    repeating a sample, and BatchNorm statistics must cover only the real
    rows (the reference normalizes over the true smaller batch)."""
    B = feats_a.shape[0]
    H = spec.hidden
    out = jnp.zeros((B, H), feats_a.dtype)
    new_mean, new_var = [], []

    for r in range(spec.max_rows):
        fa = jnp.take(feats_a, conf_c["sel_a"][r], axis=1)
        fb = jnp.take(feats_b, conf_c["sel_b"][r], axis=1)
        if spec.use_alphas:
            g = jax.nn.sigmoid(params_c["alpha"][r])
            fa, fb = fa * g, fb * (1.0 - g)
        prev = out if r > 0 else jnp.zeros((B, H), feats_a.dtype)
        x = jnp.concatenate([fa, fb, prev], axis=1)
        h = x @ params_c["W"][r].T + params_c["b"][r]

        a = conf_c["act"][r]
        h = jnp.where(a == 0, jax.nn.relu(h),
                      jnp.where(a == 1, jax.nn.sigmoid(h),
                                jax.nn.leaky_relu(h, 0.01)))

        if spec.batchnorm:
            if train:
                # masked + centered statistics (same numerics rationale as
                # core _BatchNorm: the one-pass form cancels; the mask
                # excludes padding-duplicated rows of ragged batches)
                w = (jnp.ones((B,), h.dtype) if wmask is None
                     else wmask.astype(h.dtype))
                cnt = jnp.maximum(jnp.sum(w), 1.0)
                mean = jnp.sum(h * w[:, None], axis=0) / cnt
                var = jnp.sum(jnp.square(h - mean) * w[:, None],
                              axis=0) / cnt
                unbiased = var * (cnt / jnp.maximum(cnt - 1.0, 1.0))
                new_mean.append(0.9 * bn_c["mean"][r] + 0.1 * mean)
                new_var.append(0.9 * bn_c["var"][r] + 0.1 * unbiased)
            else:
                mean, var = bn_c["mean"][r], bn_c["var"][r]
            h = (h - mean) * jax.lax.rsqrt(var + 1e-5)
            h = h * params_c["bn_scale"][r] + params_c["bn_bias"][r]

        if spec.drpt > 1e-10 and train:
            rng_c, sub = jax.random.split(rng_c)
            h = F.dropout(h, spec.drpt, sub)

        m = conf_c["row_mask"][r]
        out = m * h + (1.0 - m) * out

    logits = out @ params_c["cls_w"].T + params_c["cls_b"]
    if spec.batchnorm and train:
        new_bn = {"mean": jnp.stack(new_mean), "var": jnp.stack(new_var)}
    else:
        new_bn = bn_c
    return logits, new_bn


# --------------------------------------------------------------------------
# compiled programs + process-level program cache
# --------------------------------------------------------------------------
class _PopulationPrograms:
    """The traced/compiled programs of a population trainer.

    Holds ONLY structural config (spec, mesh, extractor / input_prep
    callables) — never device arrays: all weights and optimizer/BN state
    enter the jitted functions as arguments. That invariant is what makes
    the process-level cache below safe (and leak-free): two trainers whose
    construction key matches share one program set, and therefore jax's
    in-process executable cache. Without sharing, every fresh searcher in
    a warm process re-enters compilation for ~6-8 programs — through the
    remote-TPU persistent compile cache that is ~2 s of executable
    deserialization per program, ~20 s per search (measured round 3:
    fresh cached search 22 s vs 1.4 s resident; the gap is exactly these
    re-retrievals plus retracing).
    """

    def __init__(self, spec, extractor, input_prep, mesh):
        self.spec = spec
        self.extractor = extractor
        self.input_prep = input_prep
        self.mesh = mesh
        self._data_sharded = mesh is not None and "data" in mesh.axis_names
        self.features = jax.jit(self._features_impl,
                                static_argnames=("train",))
        self.train_step = jax.jit(self._train_step_impl)
        self.eval_step = jax.jit(self._eval_step_impl)
        self.bank_gather = jax.jit(
            lambda bank, idx: jax.tree_util.tree_map(
                lambda a: jnp.take(a, idx, axis=0), bank))
        # fused-epoch scan (active only with the feature bank): the whole
        # epoch — every gather + train step + LR value — is ONE compiled
        # program (lax.scan over steps). On dispatch-bound deployments
        # (remote tunnel ~7 ms/call) this collapses ~2 dispatches/batch
        # into ~2/epoch; on local hosts it removes the host loop entirely.
        self.train_epoch = jax.jit(self._train_epoch_impl)
        self.eval_epoch = jax.jit(self._eval_epoch_impl)

    # ----- backbone feature cache (shared across all candidates)
    def _features_impl(self, backbone_tree, inputs, rng, train):
        if self.input_prep is not None:
            inputs = self.input_prep(inputs)
        if self.spec.feature_dtype:
            dt = jnp.dtype(self.spec.feature_dtype)

            def cast(x):
                return x.astype(dt) if jnp.issubdtype(x.dtype, jnp.floating) else x

            backbone_tree = jax.tree_util.tree_map(cast, backbone_tree)
            inputs = jax.tree_util.tree_map(cast, inputs)
        ctx = Ctx(train=train, rng=Rng(rng))
        taps_a, taps_b, logits_b, logits_a = self.extractor(
            backbone_tree, ctx, inputs)
        fa = pad_taps(taps_a, self.spec.cmax_a).astype(jnp.float32)
        fb = pad_taps(taps_b, self.spec.cmax_b).astype(jnp.float32)
        return (fa, fb, logits_b.astype(jnp.float32),
                logits_a.astype(jnp.float32))

    # ----- population step
    def _losses(self, params, bn_state, conf, fa, fb, logits_b, logits_a,
                label, wmask, train, rngs):
        spec = self.spec

        def fwd(params_c, bn_c, conf_c, rng_c):
            return _candidate_forward(spec, params_c, bn_c, conf_c,
                                      fa, fb, train, rng_c, wmask=wmask)

        logits, new_bn = jax.vmap(fwd, in_axes=(0, 0, 0, 0))(
            params, bn_state, conf, rngs)      # (P, B, O)

        def per_cand(lg):
            loss = F.cross_entropy(lg, label, wmask)
            summed = lg
            if spec.multitask:
                loss = loss + F.cross_entropy(logits_b, label, wmask) \
                            + F.cross_entropy(logits_a, label, wmask)
                summed = lg + logits_b + logits_a
            preds = jnp.argmax(summed, axis=1)
            corrects = jnp.sum((preds == label) * wmask)
            return loss, corrects

        loss_c, corr_c = jax.vmap(per_cand)(logits)
        return loss_c, corr_c, new_bn

    def _train_step_impl(self, params, bn_state, opt_state, conf,
                         fa, fb, logits_b, logits_a, label, wmask, lr, rng):
        P = conf["sel_a"].shape[0]
        rngs = jax.random.split(rng, P)

        def total_loss(params):
            loss_c, corr_c, new_bn = self._losses(
                params, bn_state, conf, fa, fb, logits_b, logits_a,
                label, wmask, True, rngs)
            return jnp.sum(loss_c), (loss_c, corr_c, new_bn)

        (_, (loss_c, corr_c, new_bn)), grads = jax.value_and_grad(
            total_loss, has_aux=True)(params)
        params, opt_state = adam_update(params, grads, opt_state, lr,
                                        weight_decay=self.spec.weight_decay)
        return params, new_bn, opt_state, loss_c, corr_c

    def _eval_step_impl(self, params, bn_state, conf,
                        fa, fb, logits_b, logits_a, label, wmask):
        P = conf["sel_a"].shape[0]
        rngs = jax.random.split(jax.random.PRNGKey(0), P)
        loss_c, corr_c, _ = self._losses(params, bn_state, conf, fa, fb,
                                         logits_b, logits_a, label, wmask,
                                         False, rngs)
        return loss_c, corr_c

    # ----- fused-epoch programs (feature-bank path): the whole epoch is
    # one lax.scan — gathers, train steps, and the per-batch LR values all
    # live inside a single XLA program, so the host issues ~2 dispatches
    # per epoch instead of ~2 per batch (SURVEY §2.2 north star; the
    # per-batch path above stays for the bankless/faithful modes)
    def _constrain_data(self, tree):
        """In-jit counterpart of _shard_data (device_put is host-side)."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        if self.mesh is None or not self._data_sharded:
            return tree
        n = self.mesh.shape["data"]
        sh = NamedSharding(self.mesh, P("data"))

        def place(x):
            if getattr(x, "ndim", 0) >= 1 and x.shape[0] % n == 0:
                return jax.lax.with_sharding_constraint(x, sh)
            return x

        return jax.tree_util.tree_map(place, tree)

    def _gathered_batch(self, bank, take_s):
        got = jax.tree_util.tree_map(lambda a: a[take_s], bank)
        fa, fb, lb, la = (_bank_value(got, k)
                          for k in ("fa", "fb", "lb", "la"))
        return tuple(self._constrain_data(t)
                     for t in (fa, fb, lb, la, got["label"]))

    def _train_epoch_impl(self, params, bn_state, opt_state, conf, bank,
                          take, wmask, etas, rng):
        keys = jax.random.split(rng, take.shape[0])

        def body(carry, xs):
            params, bn_state, opt_state, corr = carry
            take_s, wmask_s, eta_s, key = xs
            fa, fb, lb, la, label = self._gathered_batch(bank, take_s)
            params, bn_state, opt_state, _, corr_c = self._train_step_impl(
                params, bn_state, opt_state, conf, fa, fb, lb, la, label,
                self._constrain_data(wmask_s), eta_s, key)
            return (params, bn_state, opt_state, corr + corr_c), None

        P_ = conf["sel_a"].shape[0]
        corr0 = jnp.zeros((P_,), jnp.float32)
        (params, bn_state, opt_state, corr), _ = jax.lax.scan(
            body, (params, bn_state, opt_state, corr0),
            (take, wmask, etas, keys))
        return params, bn_state, opt_state, corr

    def _eval_epoch_impl(self, params, bn_state, conf, bank, take, wmask):
        def body(corr, xs):
            take_s, wmask_s = xs
            fa, fb, lb, la, label = self._gathered_batch(bank, take_s)
            _, corr_c = self._eval_step_impl(
                params, bn_state, conf, fa, fb, lb, la, label,
                self._constrain_data(wmask_s))
            return corr + corr_c, None

        P_ = conf["sel_a"].shape[0]
        corr, _ = jax.lax.scan(body, jnp.zeros((P_,), jnp.float32),
                               (take, wmask))
        return corr


_PROGRAM_CACHE: dict = {}


def population_programs(spec, extractor, input_prep, mesh,
                        program_key=None):
    """Program host for (spec, extractor, input_prep, mesh).

    ``program_key=None`` -> a private, uncached program set (always
    safe). Otherwise it must be a hashable token that uniquely
    determines the COMPUTATION of ``extractor`` and ``input_prep`` (the
    searchers derive it from every args field those closures read, e.g.
    ``("ntu", vid_len, num_outputs, resnet3d knobs, drpt, dev_norm)``);
    trainers constructed with an equal (program_key, spec, mesh) triple
    then share one compiled-program set, so fresh searchers in a warm
    process skip retracing and executable-cache retrieval entirely.
    """
    if program_key is None:
        return _PopulationPrograms(spec, extractor, input_prep, mesh)
    key = (program_key, astuple(spec), mesh)
    progs = _PROGRAM_CACHE.get(key)
    if progs is None:
        progs = _PROGRAM_CACHE[key] = _PopulationPrograms(
            spec, extractor, input_prep, mesh)
    return progs


# --------------------------------------------------------------------------
# trainer
# --------------------------------------------------------------------------
class PopulationTrainer:
    """Trains a whole population of fusion heads in one compiled step.

    feature_fn(backbone_tree, inputs, rng, train) must return
      (taps_a list, taps_b list, logits_b, logits_a)
    with every tap already globally pooled to (B, C_i).
    """

    def __init__(self, spec: PopulationSpec, feature_extractor,
                 backbone_tree, mesh=None, input_prep=None,
                 cache_train_features=False, fused_epochs=True,
                 shard_feature_bank=False, bank_batch=None,
                 int8_bank=False, program_key=None):
        """mesh: optional jax Mesh. A ('pop','data') mesh shards candidates
        over 'pop' (communication-free) and batches over 'data'; a 1-D
        ('data',) mesh shards batches only. Under jit/GSPMD the program is
        written once — XLA inserts the batch-axis reductions.

        input_prep: optional traced transform of the inputs tuple run
        in-graph before the extractor (e.g. the fused uint8 -> normalized
        float kernel for packed device_normalize batches).

        cache_train_features: opt-in HBM-resident feature bank (SURVEY.md
        §7.2.6). Train-split features are extracted ONCE (eval-mode
        backbone, so deterministic) into per-sample device arrays; every
        later epoch of every candidate population gathers shuffled batches
        straight from the bank — zero backbone forwards after the first
        pass. Approximation vs the faithful path (documented, default off):
        the augmentation draw and backbone BN batch-statistics are frozen
        at bank-build time.

        shard_feature_bank: with a 'data' mesh axis, store the bank's
        feature rows sharded over it instead of replicated — per-chip HBM
        footprint scales 1/data with mesh size (banks bigger than one
        chip's HBM), at the cost of a batch-sized collective per gather.
        Numerically identical to the replicated bank (gathers are
        index-exact); no-op without a data axis.

        bank_batch: optional target batch for the eval-mode extraction
        passes (bank build + dev features). Consecutive loader batches are
        concatenated up to ~bank_batch samples before the backbone forward
        and the outputs re-split, so downstream per-batch logic and the
        bank layout are unchanged. Larger eval batches use the MXU better
        (B32 measured ~+15% clips/s over B16 on one v5e chip for the NTU
        extractor, docs/TPU_DESIGN.md §5.3); features are identical —
        eval-mode forwards are per-sample deterministic.

        int8_bank: store the feature bank symmetric-int8 quantized with a
        per-row (sample x tap) float32 absmax/127 scale — 2x the per-chip
        bank capacity of the bf16 default (4x vs f32) and proportionally
        less gather/ICI traffic; dequant fuses into the epoch program
        right after the gather. Like the feature dtype itself this only
        ever touches candidate SCORING (frozen features, reference
        ntu_searchable.py:59-62) — ranking agreement measured in
        tests/test_feature_bank.py::test_int8_bank_ranking_agreement.
        No-op without cache_train_features."""
        self.spec = spec
        self.extractor = feature_extractor
        self.input_prep = input_prep
        self.mesh = mesh
        self._pop_sharded = mesh is not None and "pop" in mesh.axis_names
        self._data_sharded = mesh is not None and "data" in mesh.axis_names
        self.backbone_tree = self._replicate(backbone_tree)

        # traced programs, shared process-wide when program_key is given
        # (see population_programs; weights/state always enter as args)
        progs = population_programs(spec, feature_extractor, input_prep,
                                    mesh, program_key)
        self._features = progs.features
        self._train_step = progs.train_step
        self._eval_step = progs.eval_step
        self._bank_gather = progs.bank_gather
        self._train_epoch = progs.train_epoch
        self._eval_epoch = progs.eval_epoch

        # dev-split features are deterministic (eval-mode backbone with
        # checkpoint stats, deterministic transforms), so they are computed
        # once per search and reused across every epoch of every candidate
        # population — the sequential reference recomputes them ~600 times
        # (197 candidates x 3 epochs)
        self._dev_cache = None
        self._dev_cache_key = None

        self.cache_train_features = bool(cache_train_features)
        self.shard_feature_bank = bool(shard_feature_bank)
        self.bank_batch = int(bank_batch) if bank_batch else None
        self.int8_bank = bool(int8_bank)
        self._train_bank = None
        self._train_bank_key = None
        self.fused_epochs = bool(fused_epochs)
        self._dev_bank = None
        self._dev_bank_key = None
        # the ONE dev-cache ceiling: _dev_batches' max_cache_samples
        # defaults to this same attribute, so the fused-path gate and the
        # streaming cache can never disagree on it
        self.MAX_DEV_BANK = 50000

    # ----- sharding helpers
    def _put(self, tree, spec_):
        if self.mesh is None:
            return tree
        from jax.sharding import NamedSharding

        from mfas_tpu.parallel.mesh import device_put_global
        sh = NamedSharding(self.mesh, spec_)
        return jax.tree_util.tree_map(
            lambda x: device_put_global(x, sh), tree)

    def _replicate(self, tree):
        from jax.sharding import PartitionSpec as P
        return self._put(tree, P())

    def _shard_leading(self, tree, axis, enabled):
        from jax.sharding import NamedSharding, PartitionSpec as P
        if self.mesh is None or not enabled:
            return tree
        n = self.mesh.shape[axis]
        sharded = NamedSharding(self.mesh, P(axis))
        repl = NamedSharding(self.mesh, P())

        from mfas_tpu.parallel.mesh import device_put_global

        def place(x):
            # replicate anything whose leading dim doesn't divide the axis
            # (e.g. populations of 15 over 2 devices)
            ok = getattr(x, "ndim", 0) >= 1 and x.shape[0] % n == 0
            return device_put_global(x, sharded if ok else repl)

        return jax.tree_util.tree_map(place, tree)

    def _shard_pop(self, tree):
        return self._shard_leading(tree, "pop", self._pop_sharded)

    def _shard_data(self, tree):
        return self._shard_leading(tree, "data", self._data_sharded)

    @staticmethod
    def _epoch_index_plan(n, batch_size, rs=None):
        """Host-side (take, wmask) arrays of shape (steps, batch) for one
        epoch: a fresh permutation when rs is given (train) else sequential
        order (dev); the ragged final batch repeats its first index under a
        zero weight-mask."""
        idx = rs.permutation(n) if rs is not None else np.arange(n)
        steps = (n + batch_size - 1) // batch_size
        take = np.zeros((steps, batch_size), np.int32)
        wm = np.zeros((steps, batch_size), np.float32)
        for s in range(steps):
            part = idx[s * batch_size:(s + 1) * batch_size]
            take[s, :len(part)] = part
            if len(part) < batch_size:
                take[s, len(part):] = part[0]
            wm[s, :len(part)] = 1.0
        return take, wm

    def _cached_bank(self, which, loader, input_keys, label_key):
        """Token-keyed bank cache shared by the train and dev splits: one
        extraction pass per loader identity, reused across populations
        (features are deterministic — eval-mode backbone)."""
        bank_attr, key_attr = f"_{which}_bank", f"_{which}_bank_key"
        key = self._loader_token(loader)
        if key is not None and getattr(self, key_attr) == key:
            return getattr(self, bank_attr)
        bank = self._build_train_bank(loader, input_keys, label_key)
        if key is not None:
            setattr(self, bank_attr, bank)
            setattr(self, key_attr, key)
        return bank

    # ----- host loop
    def _placed_batches(self, loader, input_keys, label_key):
        """Yield (inputs, label, wmask) device tuples with host collation +
        H2D transfer prefetched one batch ahead on a background thread."""
        from mfas_tpu.data.loader import prefetch_to_device

        def place(batch):
            # host arrays straight to their shards: _shard_data goes through
            # device_put_global (collective-free under multi-process meshes,
            # safe from this prefetch thread); jnp.asarray only when there is
            # no mesh to shard over
            def to_dev(x):
                return jnp.asarray(x) if self.mesh is None else x
            inputs = tuple(self._shard_data(to_dev(batch[k]))
                           for k in input_keys)
            label = self._shard_data(to_dev(batch[label_key]))
            wmask = self._shard_data(to_dev(batch["_mask"]))
            return inputs, label, wmask

        return prefetch_to_device(loader, size=2, place=place)

    @staticmethod
    def _loader_token(loader):
        """Identity token for the dev-feature cache. Stored ON the loader
        object so a new loader can never inherit a GC-reused id(); loaders
        that refuse attributes are simply never cached."""
        tok = getattr(loader, "_mfas_cache_token", None)
        if tok is None:
            tok = next(_cache_token_counter)
            try:
                loader._mfas_cache_token = tok
            except AttributeError:
                return None
        return tok

    def _eval_feature_batches(self, loader, input_keys, label_key):
        """Eval-mode feature extraction over a loader, yielding
        (fa, fb, lb, la, label, wmask) per LOADER batch. With bank_batch
        set, consecutive loader batches are concatenated so the backbone
        forward runs on ~bank_batch samples (better MXU utilization,
        docs/TPU_DESIGN.md §5.3) and the outputs are re-split — callers
        see the same per-batch stream either way, and eval-mode forwards
        are per-sample deterministic so the features are identical."""
        # eval-mode forwards never consume the rng's VALUE, so extraction
        # uses a constant key and draws NOTHING from the caller's stream:
        # a crash-resumed process that rebuilds the bank/dev cache then
        # replays the exact per-step dropout keys of the uncrashed run
        # (the old per-batch draws shifted every later key on rebuild),
        # and bank_batch grouping trivially cannot perturb the stream
        zero_key = jnp.zeros(2, jnp.uint32)

        def extract(items):
            if len(items) == 1:
                inputs, label, wmask = items[0]
                fa, fb, lb, la = self._features(self.backbone_tree, inputs,
                                                zero_key, train=False)
                return [(fa, fb, lb, la, label, wmask)]
            inputs = tuple(
                self._shard_data(jnp.concatenate(
                    [it[0][i] for it in items], axis=0))
                for i in range(len(items[0][0])))
            fa, fb, lb, la = self._features(self.backbone_tree, inputs,
                                            zero_key, train=False)
            out, off = [], 0
            for _, label, wmask in items:
                sl = slice(off, off + int(label.shape[0]))
                out.append((fa[sl], fb[sl], lb[sl], la[sl], label, wmask))
                off = sl.stop
            return out

        group, buf = 1, []
        for item in self._placed_batches(loader, input_keys, label_key):
            if not buf and self.bank_batch:
                # loader batches are uniform (final batch mask-padded)
                group = max(1, self.bank_batch // int(item[1].shape[0]))
            buf.append(item)
            if len(buf) >= group:
                yield from extract(buf)
                buf = []
        if buf:
            yield from extract(buf)

    def _dev_batches(self, loader, input_keys, label_key,
                     cache=True, max_cache_samples=None):
        """Yield (fa, fb, lb, la, label, wmask) for the dev split, cached
        on device after the first pass."""
        if max_cache_samples is None:
            max_cache_samples = self.MAX_DEV_BANK
        key = self._loader_token(loader)
        if key is None:
            cache = False
        if cache and self._dev_cache is not None and self._dev_cache_key == key:
            yield from self._dev_cache
            return
        collected = []
        n = 0
        for item in self._eval_feature_batches(
                loader, input_keys, label_key):
            label = item[4]
            n += int(label.shape[0])
            if cache and n <= max_cache_samples:
                collected.append(item)
            else:
                cache = False
                collected = []
            yield item
        if cache and collected:
            self._dev_cache = collected
            self._dev_cache_key = key

    # ----- HBM-resident train-feature bank (opt-in, SURVEY §7.2.6)
    def _build_train_bank(self, loader, input_keys, label_key):
        """One eval-mode extraction pass over the train loader -> dict of
        per-sample device arrays (padding rows of the final batch dropped,
        so bank N == dataset_size). Stored bf16 when spec.feature_dtype is
        reduced — the bank only feeds candidate scoring."""
        store_dt = (jnp.dtype(self.spec.feature_dtype)
                    if self.spec.feature_dtype else jnp.float32)
        parts: dict = {"fa": [], "fb": [], "lb": [], "la": [], "label": []}
        if self.int8_bank:
            parts.update({k + "_scale": []
                          for k in ("fa", "fb", "lb", "la")})
        for fa, fb, lb, la, label, wmask in self._eval_feature_batches(
                loader, input_keys, label_key):
            n = int(np.asarray(jnp.sum(wmask)))
            for k, v in (("fa", fa), ("fb", fb), ("lb", lb), ("la", la)):
                if self.int8_bank:
                    q, s = _quantize_rows(v[:n])
                    parts[k].append(q)
                    parts[k + "_scale"].append(s)
                else:
                    parts[k].append(v[:n].astype(store_dt))
            parts["label"].append(label[:n])
        bank = {k: jnp.concatenate(v, axis=0) for k, v in parts.items()}
        if not (self.shard_feature_bank and self._data_sharded):
            return self._replicate(bank)
        # feature rows sharded over the data axis: each chip holds n/data
        # rows (1/data HBM footprint), every gather moves one batch over
        # the mesh. Labels stay REPLICATED so bank["label"].shape[0] is
        # the true sample count — the epoch index plans and ragged-batch
        # masks key off it — and only the (tiny) label gather is local.
        from jax.sharding import NamedSharding, PartitionSpec as P

        from mfas_tpu.parallel.mesh import device_put_global
        nd = self.mesh.shape["data"]
        n = int(bank["label"].shape[0])
        pad = (-n) % nd   # pad rows are never gathered: take indices < n
        sharded = NamedSharding(self.mesh, P("data"))
        repl = NamedSharding(self.mesh, P())
        out = {}
        for k, a in bank.items():
            if k == "label":
                out[k] = device_put_global(a, repl)
                continue
            if pad:
                a = jnp.concatenate(
                    [a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])], 0)
            out[k] = device_put_global(a, sharded)
        return out

    def _bank_batches(self, bank, batch_size, shuffle_rs):
        """Yield (fa, fb, lb, la, label, wmask) batches device-gathered from
        the bank under a fresh host-side shuffle (the loader-equivalent
        reshuffle the bank keeps, unlike naive batch replay). Batch plan
        (incl. ragged-final-batch padding) shared with the fused path via
        _epoch_index_plan."""
        n = int(bank["label"].shape[0])
        takes, wmasks = self._epoch_index_plan(n, batch_size, shuffle_rs)
        for take, wmask in zip(takes, wmasks):
            got = self._bank_gather(bank, jnp.asarray(take, jnp.int32))
            fa, fb, lb, la = (_bank_value(got, k)
                              for k in ("fa", "fb", "lb", "la"))
            yield (self._shard_data(fa), self._shard_data(fb),
                   self._shard_data(lb), self._shard_data(la),
                   self._shard_data(got["label"]),
                   self._shard_data(jnp.asarray(wmask)))

    def train_population(self, confs, dataloaders, dataset_sizes, scheduler,
                         num_epochs, input_keys, label_key="label", seed=0,
                         verbose=False, shared_state_dict=None):
        """Returns per-candidate best dev accuracy (reference
        train_sampled_models contract: list of floats).

        shared_state_dict: optional weight-sharing store (population-mode
        approximation of ntu_searchable.py:123-175 — injected before
        training, extracted from the FINAL population state after; the
        intra-batch sequential propagation of the reference cannot exist on
        a parallel population)."""
        spec = self.spec
        conf = self._shard_pop(
            {k: jnp.asarray(v) for k, v in encode_confs(confs, spec).items()})
        params, bn_state = init_population(confs, spec, seed)
        if shared_state_dict is not None:
            params, bn_state = inject_shared_states(
                params, bn_state, confs, spec, shared_state_dict,
                verbose=verbose)
        params = self._shard_pop(params)
        bn_state = self._shard_pop(bn_state)
        opt_state = adam_init(params)
        rng = Rng(seed + 1)
        P = len(confs)

        bank = None
        if self.cache_train_features:
            bank = self._cached_bank("train", dataloaders["train"],
                                     input_keys, label_key)
        bank_rs = np.random.RandomState(seed + 17)

        best = np.zeros((P,))

        # fused path needs the dev split as an HBM bank too — honor the
        # same cap the streaming dev cache enforces (_dev_batches) rather
        # than materializing an arbitrarily large split
        use_fused = (bank is not None and self.fused_epochs
                     and dataset_sizes.get("dev", 0) <= self.MAX_DEV_BANK)
        if use_fused:
            dev_bank = self._cached_bank("dev", dataloaders["dev"],
                                         input_keys, label_key)
            dev_take, dev_wm = self._epoch_index_plan(
                int(dev_bank["label"].shape[0]),
                dataloaders["dev"].batch_size)
            dev_take, dev_wm = jnp.asarray(dev_take), jnp.asarray(dev_wm)
            n_train = int(bank["label"].shape[0])
            bs = dataloaders["train"].batch_size
            for epoch in range(num_epochs):
                take, wm = self._epoch_index_plan(n_train, bs, bank_rs)
                # the host scheduler steps exactly as the per-batch path
                # does; the resulting per-step LR vector rides into the
                # compiled epoch
                etas = np.asarray([scheduler.step()
                                   for _ in range(take.shape[0])], np.float32)
                params, bn_state, opt_state, tr_corr = self._train_epoch(
                    params, bn_state, opt_state, conf, bank,
                    jnp.asarray(take), jnp.asarray(wm), jnp.asarray(etas),
                    rng.next())
                dev_corr = self._eval_epoch(params, bn_state, conf,
                                            dev_bank, dev_take, dev_wm)
                # both dispatches issued before any host fetch
                for phase, corr in (("train", tr_corr), ("dev", dev_corr)):
                    acc = np.asarray(corr) / dataset_sizes[phase]
                    if verbose:
                        print("{} population acc: mean {:.4f} max {:.4f}"
                              .format(phase, acc.mean(), acc.max()))
                    if phase == "dev":
                        best = np.maximum(best, acc)
            if shared_state_dict is not None:
                extract_shared_states(params, bn_state, confs, spec,
                                      shared_state_dict, verbose=verbose)
            return [float(a) for a in best], params, bn_state

        for epoch in range(num_epochs):
            for phase in ("train", "dev"):
                # device-side accumulation; one host fetch per phase so
                # dispatch pipelines ahead of execution
                correct_terms = []
                if phase == "train" and bank is not None:
                    for fa, fb, lb, la, label, wmask in self._bank_batches(
                            bank, dataloaders["train"].batch_size, bank_rs):
                        eta = scheduler.step()
                        params, bn_state, opt_state, loss_c, corr_c = \
                            self._train_step(params, bn_state, opt_state,
                                             conf, fa, fb, lb, la, label,
                                             wmask, jnp.float32(eta), rng.next())
                        correct_terms.append(corr_c)
                elif phase == "train":
                    for inputs, label, wmask in self._placed_batches(
                            dataloaders[phase], input_keys, label_key):
                        fa, fb, lb, la = self._features(
                            self.backbone_tree, inputs, rng.next(), train=True)
                        eta = scheduler.step()
                        params, bn_state, opt_state, loss_c, corr_c = \
                            self._train_step(params, bn_state, opt_state,
                                             conf, fa, fb, lb, la, label,
                                             wmask, jnp.float32(eta), rng.next())
                        correct_terms.append(corr_c)
                else:
                    for fa, fb, lb, la, label, wmask in self._dev_batches(
                            dataloaders["dev"], input_keys, label_key):
                        loss_c, corr_c = self._eval_step(
                            params, bn_state, conf, fa, fb, lb, la, label, wmask)
                        correct_terms.append(corr_c)
                if not correct_terms:
                    raise ValueError(
                        f"'{phase}' loader yielded no batches (dataset_size"
                        f"={dataset_sizes.get(phase)}) — population "
                        "training needs at least one batch per split")
                corrects = np.sum(np.stack([np.asarray(c) for c in
                                            correct_terms]), axis=0)

                acc = corrects / dataset_sizes[phase]
                if verbose:
                    print("{} population acc: mean {:.4f} max {:.4f}".format(
                        phase, acc.mean(), acc.max()))
                if phase == "dev":
                    best = np.maximum(best, acc)

        if shared_state_dict is not None:
            extract_shared_states(params, bn_state, confs, spec,
                                  shared_state_dict, verbose=verbose)
        return [float(a) for a in best], params, bn_state
