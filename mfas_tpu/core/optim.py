"""Adam with torch semantics (coupled L2 weight decay added to the gradient,
bias-corrected moments), operating on nested-dict param trees.

The learning rate is a per-step *traced scalar* so the reference's per-batch
cosine-restart schedule (host-side, mfas_tpu.core.sched) feeds straight into
one compiled update (reference op.Adam + LRCosineAnnealingScheduler.
update_optimizer, models/auxiliary/scheduler.py:42-46)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _tmap(f, *trees, **kwargs):
    return jax.tree_util.tree_map(f, *trees, **kwargs)


def adam_init(params, per_leaf_step=False):
    """params: tree of trainable leaves (None for frozen slots). m and v
    must be INDEPENDENT arrays: under donate_argnums the whole opt state is
    donated, and donating the same buffer twice is a runtime error on
    hardware backends (CPU silently ignores donation, so tests won't
    catch aliasing).

    per_leaf_step: torch Adam keeps ``state['step']`` PER PARAM, advanced
    only when the param has a grad. The shared scalar (default) is
    identical for fully-connected trainable sets; pair per-leaf with
    ``skip_disconnected`` so a leaf that is disconnected for its first K
    steps and connects later gets torch's bias corrections (t-K, not t) —
    the ADVICE-r3 transient-disconnection divergence. adam_update detects
    which scheme a state uses from its structure, so resumed checkpoints
    written under either scheme keep their original semantics."""

    def zeros():
        return _tmap(lambda p: None if p is None else jnp.zeros_like(p),
                     params)

    if per_leaf_step:
        step = _tmap(lambda p: None if p is None
                     else jnp.zeros((), jnp.int32), params)
    else:
        step = jnp.zeros((), jnp.int32)
    return {
        "m": zeros(),
        "v": zeros(),
        "step": step,
    }


def adam_update(params, grads, state, lr, betas=(0.9, 0.999), eps=1e-8,
                weight_decay=0.0, skip_disconnected=False):
    """One torch-Adam step. Returns (new_params, new_state).

    skip_disconnected: torch only updates parameters whose ``.grad`` is not
    None — a parameter disconnected from the loss graph (e.g. the CIFAR
    aux head when use_intermediate=False, or a FactorizedReduction whose
    output is never consumed, cifar_searchable.py:235-239) is never
    stepped, NOT even by weight decay. jax has no None-grads; with this
    flag a leaf whose gradient is identically zero is left untouched
    (moments included), matching torch for whole-net training where dead
    submodules exist. The zero test is per-LEAF (the whole weight
    tensor): dying-ReLU zeroes individual rows of a weight, not the
    entire leaf — an all-zero leaf on a connected module requires every
    unit of the layer dead for the whole batch, at which point torch's
    zero-tensor grad would still decay the moments where we freeze them;
    that residual mismatch is accepted as the cost of detecting
    disconnection without graph introspection. Off by default for the
    frozen-backbone engines whose trainable sets are all connected.

    With a shared scalar step (adam_init default), parity holds only for
    PERMANENTLY disconnected submodules: a leaf disconnected for its first
    K steps that later connects sees bias corrections for step t where
    torch uses t-K (ADVICE r3). States built with
    ``adam_init(per_leaf_step=True)`` carry one step counter per leaf,
    advanced only on connected steps — torch's exact scheme — and this
    function switches on the state's structure, so either kind of resumed
    checkpoint keeps its own semantics."""
    b1, b2 = betas

    def corrections(step_f32):
        return 1.0 - b1 ** step_f32, 1.0 - b2 ** step_f32

    def body(p, g, m, v, bc1, bc2):
        raw_g = g
        if weight_decay:
            g = g + weight_decay * p
        m_n = b1 * m + (1.0 - b1) * g
        v_n = b2 * v + (1.0 - b2) * jnp.square(g)
        mhat = m_n / bc1
        vhat = v_n / bc2
        p_n = p - lr * mhat / (jnp.sqrt(vhat) + eps)
        return raw_g, p_n, m_n, v_n

    if not isinstance(state["step"], dict):
        step = state["step"] + 1
        bc1, bc2 = corrections(step.astype(jnp.float32))

        def upd(p, g, m, v):
            if p is None:
                return None, None, None
            raw_g, p_n, m_n, v_n = body(p, g, m, v, bc1, bc2)
            if skip_disconnected:
                connected = jnp.any(raw_g != 0)
                p_n = jnp.where(connected, p_n, p)
                m_n = jnp.where(connected, m_n, m)
                v_n = jnp.where(connected, v_n, v)
            return p_n, m_n, v_n

        flat = _tmap(upd, params, grads, state["m"], state["v"])
        tup = lambda x: isinstance(x, tuple)  # noqa: E731
        return (_tmap(lambda t3: t3[0], flat, is_leaf=tup),
                {"m": _tmap(lambda t3: t3[1], flat, is_leaf=tup),
                 "v": _tmap(lambda t3: t3[2], flat, is_leaf=tup),
                 "step": step})

    def upd_leaf(p, g, m, v, s):
        if p is None:
            return None, None, None, None
        # per-leaf: the step advances only when this leaf is connected
        # (torch: `param.grad is None` -> the whole state entry is skipped)
        connected = (jnp.any(g != 0) if skip_disconnected
                     else jnp.bool_(True))
        s_n = s + connected.astype(jnp.int32)
        bc1, bc2 = corrections(s_n.astype(jnp.float32))
        raw_g, p_n, m_n, v_n = body(p, g, m, v, bc1, bc2)
        return (jnp.where(connected, p_n, p),
                jnp.where(connected, m_n, m),
                jnp.where(connected, v_n, v), s_n)

    flat = _tmap(upd_leaf, params, grads, state["m"], state["v"],
                 state["step"])
    tup = lambda x: isinstance(x, tuple)  # noqa: E731
    return (_tmap(lambda t4: t4[0], flat, is_leaf=tup),
            {"m": _tmap(lambda t4: t4[1], flat, is_leaf=tup),
             "v": _tmap(lambda t4: t4[2], flat, is_leaf=tup),
             "step": _tmap(lambda t4: t4[3], flat, is_leaf=tup)})
