import numpy as np
import pytest

import jax.numpy as jnp

from mfas_tpu.core.optim import adam_init, adam_update
from mfas_tpu.core.sched import LRCosineAnnealingScheduler

torch = pytest.importorskip("torch")


def test_adam_matches_torch_with_weight_decay():
    w0 = np.random.RandomState(0).randn(4, 3).astype(np.float32)
    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.Adam([tw], lr=1e-3, weight_decay=1e-4)

    params = {"w": jnp.asarray(w0)}
    state = adam_init(params)

    rs = np.random.RandomState(1)
    for _ in range(5):
        g = rs.randn(4, 3).astype(np.float32)
        opt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        opt.step()
        params, state = adam_update(params, {"w": jnp.asarray(g)}, state,
                                    lr=1e-3, weight_decay=1e-4)
    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_adam_per_leaf_step_matches_torch_transient_disconnect():
    """adam_init(per_leaf_step=True) + skip_disconnected reproduces torch
    for a param whose grad is None for its first K steps and appears later
    (ADVICE r3: the shared scalar step diverges there — torch bias-corrects
    that param at t-K, not t). The always-connected leaf must stay
    bit-identical to the shared-step scheme."""
    rs = np.random.RandomState(0)
    a0 = rs.randn(3, 2).astype(np.float32)
    b0 = rs.randn(4).astype(np.float32)
    ta = torch.nn.Parameter(torch.from_numpy(a0.copy()))
    tb = torch.nn.Parameter(torch.from_numpy(b0.copy()))
    opt = torch.optim.Adam([ta, tb], lr=1e-2)

    params = {"a": jnp.asarray(a0), "b": jnp.asarray(b0)}
    state = adam_init(params, per_leaf_step=True)
    assert isinstance(state["step"], dict)

    gen = np.random.RandomState(1)
    for step in range(6):
        ga = gen.randn(3, 2).astype(np.float32)
        gb = (gen.randn(4).astype(np.float32) if step >= 3
              else np.zeros(4, np.float32))   # b disconnected for 3 steps
        opt.zero_grad()
        ta.grad = torch.from_numpy(ga.copy())
        tb.grad = torch.from_numpy(gb.copy()) if step >= 3 else None
        opt.step()
        params, state = adam_update(
            params, {"a": jnp.asarray(ga), "b": jnp.asarray(gb)}, state,
            lr=1e-2, skip_disconnected=True)

    np.testing.assert_allclose(np.asarray(params["a"]), ta.detach().numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["b"]), tb.detach().numpy(),
                               rtol=1e-5, atol=1e-6)
    assert int(np.asarray(state["step"]["a"])) == 6
    assert int(np.asarray(state["step"]["b"])) == 3


def test_adam_per_leaf_step_equals_shared_when_connected():
    """With every leaf connected every step, the two schemes are the same
    computation — resumed states of either structure stay valid."""
    rs = np.random.RandomState(2)
    w0 = rs.randn(5).astype(np.float32)
    p1 = {"w": jnp.asarray(w0)}
    p2 = {"w": jnp.asarray(w0)}
    s1 = adam_init(p1)
    s2 = adam_init(p2, per_leaf_step=True)
    for _ in range(4):
        g = {"w": jnp.asarray(rs.randn(5).astype(np.float32))}
        p1, s1 = adam_update(p1, g, s1, lr=1e-2, skip_disconnected=True)
        p2, s2 = adam_update(p2, g, s2, lr=1e-2, skip_disconnected=True)
    np.testing.assert_array_equal(np.asarray(p1["w"]), np.asarray(p2["w"]))


def test_adam_skips_frozen_none_leaves():
    params = {"a": jnp.ones((2,)), "b": None}
    grads = {"a": jnp.ones((2,)), "b": None}
    state = adam_init(params)
    params, state = adam_update(params, grads, state, lr=0.1)
    assert params["b"] is None
    assert np.all(np.asarray(params["a"]) < 1.0)


def test_cosine_scheduler_trace_matches_reference_formula():
    """Golden trace of scheduler.py:25-40 incl. the warm restart (Ti *= Tm)."""
    sched = LRCosineAnnealingScheduler(1e-3, 1e-6, Ti=1, Tmultiplier=2,
                                       num_batches_per_epoch=4)
    etas = [sched.step() for _ in range(12)]
    # reference re-implementation with independent state
    eta_min, eta_max, Ti, Tm, nbpe = 1e-6, 1e-3, 1, 2, 4
    it, want = 0.0, []
    for _ in range(12):
        Tcur = it / nbpe
        it += 1.0
        eta = eta_min + 0.5 * (eta_max - eta_min) * (1 + np.cos(np.pi * Tcur / Ti))
        if eta <= eta_min + 1e-10:
            Ti *= Tm
            it = 0
        want.append(eta)
    np.testing.assert_allclose(etas, want, rtol=1e-12)
    assert etas[0] == 1e-3          # starts at eta_max
    assert min(etas) <= 1e-6 + 1e-9  # reaches eta_min before restart
    assert sched.Ti == 2             # one warm restart doubled Ti


def test_scheduler_state_roundtrip():
    s1 = LRCosineAnnealingScheduler(1e-3, 1e-6, 1, 2, 10)
    for _ in range(7):
        s1.step()
    s2 = LRCosineAnnealingScheduler(1, 1, 1, 1, 1)
    s2.load_state_dict(s1.state_dict())
    assert [s1.step() for _ in range(5)] == [s2.step() for _ in range(5)]
