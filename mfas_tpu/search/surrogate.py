"""LSTM accuracy surrogate + its dataset (reference models/search/surrogate.py).

Architecture (:15-50): per-row Linear(3->100)+Sigmoid embedding -> LSTM(100)
-> last-step Linear(100->1)+Sigmoid. All Linear weights ~ U(-0.1, 0.1) and
biases = 1.8 (:32-35); the LSTM keeps torch-default U(-1/sqrt(H)) init.

Training (:133-157): full-batch MSE per seq-length group, Adam; the
optimizer state persists across retrainings (the reference constructs the
optimizer once per search, models/searchable.py:54).

TPU notes: groups are padded to power-of-two batch buckets so the jitted
(seq_len, bucket) step is compiled a handful of times per search instead of
once per dataset size.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from mfas_tpu.core import init as I
from mfas_tpu.core.module import Ctx, Module, Sequential
from mfas_tpu.core.layers import Linear, Sigmoid
from mfas_tpu.core.optim import adam_init, adam_update
from mfas_tpu.core.rnn import LSTM

_U01 = I.uniform(-0.1, 0.1)
_B18 = I.constant(1.8)


class _SurrogateNet(Module):
    def __init__(self, num_hidden, number_input_feats, size_embedding):
        super().__init__()
        self.embedding = Sequential(
            Linear(number_input_feats, size_embedding, weight_init=_U01,
                   bias_init=_B18),
            Sigmoid())
        self.lstm = LSTM(size_embedding, num_hidden)
        self.hid2val = Linear(num_hidden, 1, weight_init=_U01, bias_init=_B18)

    def apply(self, tree, ctx, seq, lengths=None):
        """seq: (L, B, feats) float -> (B, 1) in (0,1). With ``lengths``
        (B,) the prediction reads each sequence's own last step — the LSTM
        state at step l-1 only depends on inputs 0..l-1, so zero padding
        beyond a sequence's length cannot change its output; this lets all
        seq-lengths share ONE padded compiled program (compile-count
        discipline, docs/TPU_DESIGN.md §2)."""
        embeds = self.embedding(self.sub(tree, "embedding"), ctx, seq)
        outs, _ = self.lstm(self.sub(tree, "lstm"), ctx, embeds)
        if lengths is None:
            last = outs[-1]
        else:
            idx = (jnp.asarray(lengths, jnp.int32) - 1)[None, :, None]
            last = jnp.take_along_axis(outs, jnp.broadcast_to(
                idx, (1,) + outs.shape[1:]), axis=0)[0]
        val = self.hid2val(self.sub(tree, "hid2val"), ctx, last)
        return jax.nn.sigmoid(val)


def _bucket(n):
    b = 1
    while b < n:
        b *= 2
    return b


class _SurrogatePrograms:
    """Traced programs of a surrogate net shape — holds only the
    (weightless) net structure; params/opt state enter as arguments.
    Cached process-wide so every search()'s fresh surrogate reuses the
    compiled predict/fit programs (same rationale as
    population.population_programs)."""

    def __init__(self, net):
        self.net = net
        self.predict = jax.jit(
            lambda params, seq, lengths: net.apply(params, Ctx(), seq,
                                                   lengths))
        self.fit_scan = jax.jit(self._fit_scan_impl,
                                static_argnames=("num_epochs",))

    def _step_impl(self, params, opt_state, seq, lengths, target, mask, lr):
        def loss_fn(p):
            pred = self.net.apply(p, Ctx(), seq, lengths)
            sq = jnp.square(pred - target)[:, 0] * mask
            return jnp.sum(sq) / jnp.maximum(jnp.sum(mask), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt_state = adam_update(params, grads, opt_state, lr)
        return params, opt_state, loss

    def _fit_scan_impl(self, params, opt_state, seqs, lengths, tgts, masks,
                       lr, num_epochs):
        """All `num_epochs` x groups full-batch steps as ONE lax.scan
        program (epoch-major, group order preserved — the exact update
        sequence of the reference's nested loop, surrogate.py:133-157).
        One dispatch instead of epochs*groups."""
        G = seqs.shape[0]

        def body(carry, g):
            params, opt_state = carry
            params, opt_state, loss = self._step_impl(
                params, opt_state, seqs[g], lengths[g], tgts[g], masks[g],
                lr)
            return (params, opt_state), loss

        xs = jnp.tile(jnp.arange(G), num_epochs)
        (params, opt_state), losses = jax.lax.scan(body, (params, opt_state),
                                                   xs)
        return params, opt_state, losses[-1]


_PROGRAM_CACHE: dict = {}


def _surrogate_programs(num_hidden, number_input_feats, size_ebedding):
    key = (num_hidden, number_input_feats, size_ebedding)
    progs = _PROGRAM_CACHE.get(key)
    if progs is None:
        progs = _PROGRAM_CACHE[key] = _SurrogatePrograms(
            _SurrogateNet(num_hidden, number_input_feats, size_ebedding))
    return progs


class SimpleRecurrentSurrogate:
    """Stateful wrapper: params + persistent Adam state + jitted steps."""

    def __init__(self, num_hidden=100, number_input_feats=3,
                 size_ebedding=100, seed=0, max_seq_len=4):
        progs = _surrogate_programs(num_hidden, number_input_feats,
                                    size_ebedding)
        self.net = progs.net
        self.params = self.net.init(seed)
        self.opt_state = None
        self.max_seq_len = max_seq_len
        self._predict = progs.predict
        self._fit_scan = progs.fit_scan

    def _padded_len(self, L):
        return max(self.max_seq_len, L)

    # ---------------- inference
    def eval_model(self, sequence_of_operations_np, device=None):
        """conf (L, feats) int array -> scalar predicted accuracy
        (reference surrogate.py:52-60). Sequences pad to max_seq_len so all
        lengths share one compiled program."""
        conf = np.asarray(sequence_of_operations_np, np.float32)
        L = len(conf)
        Lp = self._padded_len(L)
        seq = np.zeros((Lp, 1, conf.shape[-1]), np.float32)
        seq[:L, 0] = conf
        return float(self._predict(self.params, jnp.asarray(seq),
                                   jnp.asarray([L], jnp.int32))[0, 0])

    def eval_models(self, confs):
        """Batched eval_model over a conf list: ONE device dispatch per
        power-of-two batch bucket instead of one per conf — the EPNAS loop
        scores up to K*32 unfoldings per level (searchable.py:99), and
        per-conf dispatch dominates that step on a remote-dispatch
        backend. Mixed lengths ride the per-sequence last-step gather;
        padded columns are discarded."""
        confs = [np.asarray(c, np.float32) for c in confs]
        if not confs:
            return []
        N = len(confs)
        B = _bucket(N)
        Lp = max(self._padded_len(len(c)) for c in confs)
        seq = np.zeros((Lp, B, confs[0].shape[-1]), np.float32)
        lengths = np.ones((B,), np.int32)
        for i, c in enumerate(confs):
            seq[:len(c), i] = c
            lengths[i] = len(c)
        out = np.asarray(self._predict(self.params, jnp.asarray(seq),
                                       jnp.asarray(lengths)))
        return [float(v) for v in out[:N, 0]]

    # ---------------- training
    def fit(self, dataset_conf, dataset_acc, num_epochs, lr):
        """dataset_conf: list of (L, N, feats) arrays grouped by seq length;
        dataset_acc: list of (N, 1). Returns the last batch loss
        (reference surrogate.py:133-157). Groups pad to (max_seq_len,
        shared bucket) — padded columns are masked out of the loss, so the
        update sequence is numerically the per-group full-batch loop's."""
        if self.opt_state is None:
            self.opt_state = adam_init(self.params)
        if num_epochs <= 0 or not dataset_conf:
            return 0.0

        # one bucket for ALL groups so they stack into a scan-able array
        B = _bucket(max(conf.shape[1] for conf in dataset_conf))
        Lp = max(self._padded_len(conf.shape[0]) for conf in dataset_conf)
        F_ = dataset_conf[0].shape[-1]
        G = len(dataset_conf)
        seqs = np.zeros((G, Lp, B, F_), np.float32)
        lengths = np.zeros((G, B), np.int32)
        tgts = np.zeros((G, B, 1), np.float32)
        masks = np.zeros((G, B), np.float32)
        for g, (conf, acc) in enumerate(zip(dataset_conf, dataset_acc)):
            L, N = conf.shape[0], conf.shape[1]
            seqs[g, :L, :N] = conf
            lengths[g] = L
            tgts[g, :N] = acc
            masks[g, :N] = 1.0

        self.params, self.opt_state, loss = self._fit_scan(
            self.params, self.opt_state, jnp.asarray(seqs),
            jnp.asarray(lengths), jnp.asarray(tgts), jnp.asarray(masks),
            jnp.float32(lr), num_epochs=int(num_epochs))
        return float(loss)


class SurrogateDataloader:
    """(conf, acc) store keyed by seq_len then conf bytes; duplicate confs
    keep the max accuracy (reference surrogate.py:64-129)."""

    def __init__(self):
        self._dict_data = {}

    def add_datum(self, datum_conf, datum_acc):
        conf = np.ascontiguousarray(np.asarray(datum_conf))
        seq_len = len(conf)
        h = conf.tobytes()
        group = self._dict_data.setdefault(seq_len, {})
        if h in group:
            group[h] = (conf, max(datum_acc, group[h][1]))
        else:
            group[h] = (conf, datum_acc)

    def __len__(self):
        return sum(len(g) for g in self._dict_data.values())

    def get_data(self, to_torch=False):
        """-> (list of (L, N, feats) float32, list of (N, 1) float32)."""
        dataset_conf, dataset_acc = [], []
        for _, group in self._dict_data.items():
            confs = np.asarray([d[0] for d in group.values()], np.float32)
            accs = np.asarray([d[1] for d in group.values()], np.float32)
            dataset_conf.append(np.transpose(confs, (1, 0, 2)))
            dataset_acc.append(accs[:, None])
        return dataset_conf, dataset_acc

    def get_k_best(self, k):
        """Top-k via argpartition (reference surrogate.py:113-129)."""
        confs, accs = [], []
        for _, group in self._dict_data.items():
            for conf, acc in group.values():
                confs.append(conf)
                accs.append(acc)
        accs = np.array(accs)
        if k <= 0 or accs.size == 0:
            # np.argpartition(accs, -0)[-0:] would return EVERYTHING for
            # k=0 (and raise on an empty store) — callers clamp k with
            # min(k, len(store)), which is exactly 0 on a fresh state
            return [], [], np.array([], np.int64)
        k = min(k, accs.size)
        top = np.argpartition(accs, -k)[-k:]
        return [confs[i] for i in top], [accs[i] for i in top], top

    # ---- persistence (additive; SURVEY §5.3 resumable search)
    def state(self):
        return [(int(L), [(c.tolist(), float(a)) for c, a in g.values()])
                for L, g in self._dict_data.items()]

    @classmethod
    def from_state(cls, state):
        self = cls()
        for _, entries in state:
            for conf, acc in entries:
                self.add_datum(np.asarray(conf), acc)
        return self
