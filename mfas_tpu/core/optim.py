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


def adam_init(params):
    """params: tree of trainable leaves (None for frozen slots). m and v
    must be INDEPENDENT arrays: under donate_argnums the whole opt state is
    donated, and donating the same buffer twice is a runtime error on
    hardware backends (CPU silently ignores donation, so tests won't
    catch aliasing)."""

    def zeros():
        return _tmap(lambda p: None if p is None else jnp.zeros_like(p),
                     params)

    return {
        "m": zeros(),
        "v": zeros(),
        "step": jnp.zeros((), jnp.int32),
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

    Parity caveat (ADVICE r3): state['step'] is shared across leaves while
    torch keeps a per-param step count. A leaf that is disconnected for
    its first K steps and later becomes connected therefore sees bias
    corrections for step t, where torch would use t-K — so parity holds
    only for PERMANENTLY disconnected submodules (the case this flag
    exists for: fusion confs that never route through a module)."""
    b1, b2 = betas
    step = state["step"] + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - b1 ** t
    bc2 = 1.0 - b2 ** t

    def upd(p, g, m, v):
        if p is None:
            return None, None, None
        raw_g = g
        if weight_decay:
            g = g + weight_decay * p
        m_n = b1 * m + (1.0 - b1) * g
        v_n = b2 * v + (1.0 - b2) * jnp.square(g)
        mhat = m_n / bc1
        vhat = v_n / bc2
        p_n = p - lr * mhat / (jnp.sqrt(vhat) + eps)
        if skip_disconnected:
            connected = jnp.any(raw_g != 0)
            p_n = jnp.where(connected, p_n, p)
            m_n = jnp.where(connected, m_n, m)
            v_n = jnp.where(connected, v_n, v)
        return p_n, m_n, v_n

    flat = _tmap(upd, params, grads, state["m"], state["v"])
    # unzip the 3-tuples back into trees
    new_p = _tmap(lambda t3: t3[0], flat, is_leaf=lambda x: isinstance(x, tuple))
    new_m = _tmap(lambda t3: t3[1], flat, is_leaf=lambda x: isinstance(x, tuple))
    new_v = _tmap(lambda t3: t3[2], flat, is_leaf=lambda x: isinstance(x, tuple))
    return new_p, {"m": new_m, "v": new_v, "step": step}
