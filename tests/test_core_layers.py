"""Parity tests of the core layers against torch (torch is CPU-only in this
image and used strictly as a test oracle — the framework never imports it)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mfas_tpu.core import Ctx, Rng, Sequential, apply_updates, flatten_tree
from mfas_tpu.core import layers as L
from mfas_tpu.core import functional as F
from mfas_tpu.core.rnn import GRU, LSTM

torch = pytest.importorskip("torch")


def t2n(t):
    return t.detach().numpy()


def test_linear_matches_torch():
    tl = torch.nn.Linear(7, 5)
    jl = L.Linear(7, 5)
    tree = jl.init(0)
    tree["weight"] = jnp.asarray(t2n(tl.weight))
    tree["bias"] = jnp.asarray(t2n(tl.bias))
    x = np.random.RandomState(0).randn(3, 7).astype(np.float32)
    out = jl(tree, Ctx(), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), t2n(tl(torch.from_numpy(x))), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k,s,p", [(5, 1, 2), (3, 1, 1), ((3, 1), 1, (1, 0))])
def test_conv2d_matches_torch(k, s, p):
    tc = torch.nn.Conv2d(3, 4, kernel_size=k, stride=s, padding=p)
    jc = L.Conv2d(3, 4, kernel_size=k, stride=s, padding=p)
    tree = jc.init(0)
    tree["weight"] = jnp.asarray(t2n(tc.weight))
    tree["bias"] = jnp.asarray(t2n(tc.bias))
    x = np.random.RandomState(1).randn(2, 3, 9, 11).astype(np.float32)
    out = jc(tree, Ctx(), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), t2n(tc(torch.from_numpy(x))), rtol=1e-4, atol=1e-4)


def test_conv3d_matches_torch():
    tc = torch.nn.Conv3d(2, 3, kernel_size=3, stride=(1, 2, 2), padding=1, bias=False)
    jc = L.Conv3d(2, 3, kernel_size=3, stride=(1, 2, 2), padding=1, bias=False)
    tree = jc.init(0)
    tree["weight"] = jnp.asarray(t2n(tc.weight))
    x = np.random.RandomState(2).randn(1, 2, 4, 8, 8).astype(np.float32)
    out = jc(tree, Ctx(), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), t2n(tc(torch.from_numpy(x))), rtol=1e-4, atol=1e-4)


def test_batchnorm2d_train_and_eval_match_torch():
    tb = torch.nn.BatchNorm2d(4)
    jb = L.BatchNorm2d(4)
    jb.finalize("bn")
    tree = jb.init(0)
    x = np.random.RandomState(3).randn(6, 4, 5, 5).astype(np.float32) * 2 + 1

    # train step
    tb.train(True)
    tout = tb(torch.from_numpy(x))
    ctx = Ctx(train=True)
    jout = jb(tree, ctx, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(jout), t2n(tout), rtol=1e-4, atol=1e-4)
    # running stats after the step
    tree = apply_updates({"bn": tree}, ctx.updates)["bn"]
    np.testing.assert_allclose(np.asarray(tree["running_mean"]), t2n(tb.running_mean), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tree["running_var"]), t2n(tb.running_var), rtol=1e-5, atol=1e-6)
    assert int(tree["num_batches_tracked"]) == 1

    # eval uses running stats
    tb.train(False)
    x2 = np.random.RandomState(4).randn(2, 4, 5, 5).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(jb(tree, Ctx(train=False), jnp.asarray(x2))),
        t2n(tb(torch.from_numpy(x2))), rtol=1e-4, atol=1e-4)


def test_maxpool_avgpool_match_torch():
    x = np.random.RandomState(5).randn(2, 3, 8, 8).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(F.max_pool2d(jnp.asarray(x), 2)),
        t2n(torch.nn.functional.max_pool2d(torch.from_numpy(x), 2)))
    np.testing.assert_allclose(
        np.asarray(F.avg_pool2d(jnp.asarray(x), 3, stride=2, padding=1)),
        t2n(torch.nn.functional.avg_pool2d(torch.from_numpy(x), 3, stride=2, padding=1)),
        rtol=1e-5, atol=1e-6)
    x3 = np.random.RandomState(6).randn(2, 3, 4, 7, 7).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(F.avg_pool3d(jnp.asarray(x3), (4, 7, 7))),
        t2n(torch.nn.functional.avg_pool3d(torch.from_numpy(x3), (4, 7, 7))),
        rtol=1e-5, atol=1e-6)


def test_max_pool_separable_matches_default_and_torch():
    """MFAS_POOL_SEPARABLE (two 1-D reduce_windows) is exact vs both the
    combined reduce_window and torch, in value AND gradient (the stem
    pool's backward is the train-step-relevant path)."""
    import jax

    x = np.random.RandomState(7).randn(2, 3, 17, 19).astype(np.float32)

    def pooled_sum(xa):
        return jnp.sum(F.max_pool2d(xa, 3, stride=2, padding=1) ** 2)

    want = F.max_pool2d(jnp.asarray(x), 3, stride=2, padding=1)
    gwant = jax.grad(pooled_sum)(jnp.asarray(x))
    F.set_pool_separable(True)
    try:
        got = F.max_pool2d(jnp.asarray(x), 3, stride=2, padding=1)
        ggot = jax.grad(pooled_sum)(jnp.asarray(x))
    finally:
        F.set_pool_separable(False)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    np.testing.assert_allclose(np.asarray(ggot), np.asarray(gwant),
                               rtol=1e-6, atol=1e-7)
    tx = torch.from_numpy(x)
    np.testing.assert_array_equal(
        np.asarray(want),
        t2n(torch.nn.functional.max_pool2d(tx, 3, stride=2, padding=1)))


def test_stem_pool_relu_reorder_is_exact():
    """relu(max_pool(x)) == max_pool(relu(x)) bitwise (relu is monotone) —
    the resnet3d stem relies on this identity to pool before the relu."""
    import jax

    x = np.random.RandomState(8).randn(2, 4, 16, 16).astype(np.float32)
    a = jax.nn.relu(F.max_pool2d(jnp.asarray(x), 3, stride=2, padding=1))
    b = F.max_pool2d(jax.nn.relu(jnp.asarray(x)), 3, stride=2, padding=1)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_avg_pool_count_include_pad_false_matches_torch():
    # used by AuxiliaryHead (aux_models.py:506)
    x = np.random.RandomState(20).randn(1, 2, 9, 9).astype(np.float32)
    want = torch.nn.functional.avg_pool2d(
        torch.from_numpy(x), 5, stride=2, padding=0, count_include_pad=False)
    got = F.avg_pool2d(jnp.asarray(x), 5, stride=2, padding=0,
                       count_include_pad=False)
    np.testing.assert_allclose(np.asarray(got), t2n(want), rtol=1e-5, atol=1e-6)
    # and with actual padding where the flag changes results
    want2 = torch.nn.functional.avg_pool2d(
        torch.from_numpy(x), 3, stride=2, padding=1, count_include_pad=False)
    got2 = F.avg_pool2d(jnp.asarray(x), 3, stride=2, padding=1,
                        count_include_pad=False)
    np.testing.assert_allclose(np.asarray(got2), t2n(want2), rtol=1e-5, atol=1e-6)


def test_interpolate_bilinear_matches_torch():
    x = np.random.RandomState(7).randn(2, 3, 5, 1).astype(np.float32)
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=(9, 1), mode="bilinear", align_corners=False)
    got = F.interpolate_bilinear(jnp.asarray(x), (9, 1))
    np.testing.assert_allclose(np.asarray(got), t2n(want), rtol=1e-4, atol=1e-5)


def test_global_pooling2d_semantics():
    # mean over flattened trailing dims; identity on (N, C)
    x = np.random.RandomState(8).randn(2, 5, 3, 4).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(F.global_avg_pool2d(jnp.asarray(x))), x.reshape(2, 5, -1).mean(-1), rtol=1e-6)
    v = np.random.RandomState(9).randn(2, 5).astype(np.float32)
    np.testing.assert_allclose(np.asarray(F.global_avg_pool2d(jnp.asarray(v))), v, rtol=1e-6)


def test_maxout_matches_torch_reference_formula():
    m = L.Maxout(6, 4, 3)
    tree = m.init(0)
    x = np.random.RandomState(10).randn(5, 6).astype(np.float32)
    lin = np.asarray(x) @ np.asarray(tree["lin"]["weight"]).T + np.asarray(tree["lin"]["bias"])
    want = lin.reshape(5, 4, 3).max(-1)
    np.testing.assert_allclose(np.asarray(m(tree, Ctx(), jnp.asarray(x))), want, rtol=1e-5)


def test_alpha_scalar_gate_is_half_at_zero():
    a = L.AlphaScalarMultiplication(4, 6)
    tree = a.init(0)  # alpha init zeros -> sigmoid = 0.5
    x = jnp.ones((2, 4))
    y = jnp.ones((2, 6))
    gx, gy = a(tree, Ctx(), x, y)
    np.testing.assert_allclose(np.asarray(gx), 0.5 * np.ones((2, 4)))
    np.testing.assert_allclose(np.asarray(gy), 0.5 * np.ones((2, 6)))


def test_lstm_matches_torch():
    tl = torch.nn.LSTM(3, 7)
    jl = LSTM(3, 7)
    tree = jl.init(0)
    for name in ("weight_ih_l0", "weight_hh_l0", "bias_ih_l0", "bias_hh_l0"):
        tree[name] = jnp.asarray(t2n(getattr(tl, name)))
    x = np.random.RandomState(11).randn(4, 2, 3).astype(np.float32)
    want, _ = tl(torch.from_numpy(x))
    got, _ = jl(tree, Ctx(), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), t2n(want), rtol=1e-4, atol=1e-5)


def test_gru_matches_torch_batch_first():
    tg = torch.nn.GRU(5, 6, batch_first=True)
    jg = GRU(5, 6, batch_first=True)
    tree = jg.init(0)
    for name in ("weight_ih_l0", "weight_hh_l0", "bias_ih_l0", "bias_hh_l0"):
        tree[name] = jnp.asarray(t2n(getattr(tg, name)))
    x = np.random.RandomState(12).randn(2, 4, 5).astype(np.float32)
    want, _ = tg(torch.from_numpy(x))
    got, _ = jg(tree, Ctx(), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), t2n(want), rtol=1e-4, atol=1e-5)


def test_sequential_state_dict_keys_match_torch_convention():
    seq = Sequential(L.Linear(4, 3), L.ReLU(), L.BatchNorm1d(3), L.Dropout(0.5))
    flat = flatten_tree(seq.init(0))
    assert set(flat) == {"0.weight", "0.bias", "2.weight", "2.bias",
                         "2.running_mean", "2.running_var", "2.num_batches_tracked"}


def test_dropout_train_eval():
    d = L.Dropout(0.5)
    x = jnp.ones((1000,))
    out = d({}, Ctx(train=True, rng=0), x)
    kept = np.asarray(out) > 0
    assert 350 < kept.sum() < 650
    np.testing.assert_allclose(np.asarray(out)[kept], 2.0)  # inverted scaling
    np.testing.assert_allclose(np.asarray(d({}, Ctx(train=False), x)), 1.0)


def test_dropout2d_zeroes_whole_channels():
    d = L.Dropout2d(0.5)
    x = jnp.ones((4, 16, 3, 3))
    out = np.asarray(d({}, Ctx(train=True, rng=1), x))
    per_channel = out.reshape(4, 16, -1)
    assert all(np.all(c == 0) or np.all(c == 2.0) for b in per_channel for c in b)


def test_cross_entropy_matches_torch():
    logits = np.random.RandomState(13).randn(6, 10).astype(np.float32)
    labels = np.array([0, 3, 9, 2, 2, 7])
    want = torch.nn.functional.cross_entropy(torch.from_numpy(logits), torch.from_numpy(labels))
    got = F.cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
    np.testing.assert_allclose(np.asarray(got), t2n(want), rtol=1e-5)


def test_cross_entropy_padded_mask_equals_unpadded():
    logits = np.random.RandomState(14).randn(5, 4).astype(np.float32)
    labels = np.array([0, 1, 2, 3, 1])
    pad_logits = np.concatenate([logits, np.zeros((3, 4), np.float32)])
    pad_labels = np.concatenate([labels, np.zeros(3, np.int64)])
    w = np.array([1, 1, 1, 1, 1, 0, 0, 0], np.float32)
    np.testing.assert_allclose(
        np.asarray(F.cross_entropy(jnp.asarray(pad_logits), jnp.asarray(pad_labels), jnp.asarray(w))),
        np.asarray(F.cross_entropy(jnp.asarray(logits), jnp.asarray(labels))), rtol=1e-6)


def test_conv_channels_last_matches_nchw():
    """The opt-in NHWC/NDHWC lowering is numerically identical to the
    default NCHW path (torch-layout API unchanged)."""
    import numpy as np
    import jax.numpy as jnp
    from mfas_tpu.core import functional as F

    rs = np.random.RandomState(0)
    x2 = jnp.asarray(rs.randn(2, 3, 13, 11), jnp.float32)
    w2 = jnp.asarray(rs.randn(5, 3, 3, 3), jnp.float32)
    b2 = jnp.asarray(rs.randn(5), jnp.float32)
    x3 = jnp.asarray(rs.randn(2, 3, 4, 9, 9), jnp.float32)
    w3 = jnp.asarray(rs.randn(5, 3, 3, 3, 3), jnp.float32)

    ref2 = F.conv2d(x2, w2, b2, stride=2, padding=1)
    ref3 = F.conv3d(x3, w3, stride=(1, 2, 2), padding=1)
    F.set_conv_channels_last(True)
    try:
        got2 = F.conv2d(x2, w2, b2, stride=2, padding=1)
        got3 = F.conv3d(x3, w3, stride=(1, 2, 2), padding=1)
    finally:
        F.set_conv_channels_last(False)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got3), np.asarray(ref3),
                               rtol=1e-5, atol=1e-5)


def test_conv3d_as_2d_matches_native():
    """The framewise-2D decomposition of 3D convs is numerically identical
    to lax's native 3-spatial-dim lowering for the inflated-ResNet cases
    (kd in {1,3}, stride_d=1, pad_d=kd//2)."""
    import numpy as np
    import jax.numpy as jnp
    from mfas_tpu.core import functional as F

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 4, 5, 9, 9), jnp.float32)
    cases = [
        (jnp.asarray(rs.randn(6, 4, 3, 3, 3), jnp.float32), (1, 2, 2), 1),
        (jnp.asarray(rs.randn(6, 4, 3, 3, 3), jnp.float32), 1, 1),
        (jnp.asarray(rs.randn(6, 4, 1, 1, 1), jnp.float32), (1, 2, 2), 0),
        (jnp.asarray(rs.randn(6, 4, 1, 1, 1), jnp.float32), 1, 0),
    ]
    b = jnp.asarray(rs.randn(6), jnp.float32)
    for w, stride, pad in cases:
        ref = F.conv3d(x, w, b, stride=stride, padding=pad)
        F.set_conv3d_as_2d(True)
        try:
            got = F.conv3d(x, w, b, stride=stride, padding=pad)
        finally:
            F.set_conv3d_as_2d(False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"kd={w.shape[2]} s={stride} p={pad}")

    # unsupported case (temporal stride 2) must fall through to native
    w = jnp.asarray(rs.randn(6, 4, 3, 3, 3), jnp.float32)
    ref = F.conv3d(x, w, None, stride=(2, 2, 2), padding=1)
    F.set_conv3d_as_2d(True)
    try:
        got = F.conv3d(x, w, None, stride=(2, 2, 2), padding=1)
    finally:
        F.set_conv3d_as_2d(False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_conv3d_1x1_matmul_path_matches_native():
    """1x1x1 convs route through dot_general (default ON); identical to the
    native conv path incl. strided subsampling."""
    import numpy as np
    import jax.numpy as jnp
    from mfas_tpu.core import functional as F

    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 8, 4, 6, 6), jnp.float32)
    w = jnp.asarray(rs.randn(5, 8, 1, 1, 1), jnp.float32)
    b = jnp.asarray(rs.randn(5), jnp.float32)
    for stride in (1, (1, 2, 2), (2, 2, 2)):
        F.set_conv1x1_as_matmul(False)
        try:
            ref = F.conv3d(x, w, b, stride=stride)
        finally:
            F.set_conv1x1_as_matmul(True)
        got = F.conv3d(x, w, b, stride=stride)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"stride={stride}")


def test_pool_as_slices_matches_reduce_window():
    import numpy as np
    import jax.numpy as jnp
    from mfas_tpu.core import functional as F

    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(2, 3, 13, 11), jnp.float32)
    for k, s, p in ((3, 2, 1), (2, 2, 0), ((3, 2), (1, 2), (1, 0))):
        ref = F.max_pool2d(x, k, s, p)
        F.set_pool_as_slices(True)
        try:
            got = F.max_pool2d(x, k, s, p)
        finally:
            F.set_pool_as_slices(False)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref),
                                      err_msg=f"k={k} s={s} p={p}")


def test_batchnorm_bf16_large_mean_stays_finite():
    """Centered two-pass variance: the one-pass E[x^2]-E[x]^2 form goes
    NEGATIVE for mean >> std activations in bf16 (rsqrt -> NaN). Typical
    post-ReLU statistics must stay finite and accurate under the --bf16
    compute path."""
    bn = L.BatchNorm1d(4)
    bn.finalize()
    tree = {k: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v
            for k, v in bn.init(0).items()}
    rs = np.random.RandomState(0)
    x = jnp.asarray(5.0 + 0.05 * rs.randn(64, 4), jnp.bfloat16)
    ctx = Ctx(train=True, rng=Rng(jax.random.PRNGKey(0)))
    out = bn(tree, ctx, x)
    assert np.isfinite(np.asarray(out, np.float32)).all()
    # normalized output of a (5, 0.05) batch is ~N(0,1): check scale
    std = np.asarray(out, np.float32).std()
    assert 0.5 < std < 2.0, std


def test_module_setattr_reassignment_unregisters_child():
    """torch idiom: build a child then overwrite the attribute with None —
    no phantom parameters may remain."""
    from mfas_tpu.core.module import Module

    class Net(Module):
        def __init__(self, with_down):
            super().__init__()
            self.lin = L.Linear(3, 3)
            self.down = L.Linear(3, 3)
            if not with_down:
                self.down = None

    t_with = Net(True).init(0)
    t_without = Net(False).init(0)
    assert any(k.startswith("down.") for k in flatten_tree(t_with))
    assert not any(k.startswith("down.") for k in flatten_tree(t_without))


def test_tree_set_missing_leaf_raises():
    from mfas_tpu.core.module import tree_set

    tree = {"a": {"w": jnp.zeros(2)}}
    tree = tree_set(tree, "a.w", jnp.ones(2))          # existing: fine
    with pytest.raises(KeyError):
        tree_set(tree, "a.nope", jnp.ones(2))          # new leaf: refuse
    with pytest.raises(KeyError):
        tree_set(tree, "running_mean", jnp.ones(2))    # unfinalized-path bug


def test_compiled_init_matches_eager():
    """Module.init(compile=True) (the non-CPU-backend default: one jitted
    program instead of ~one dispatch per leaf) draws the identical tree."""
    import types

    import numpy as np

    from mfas_tpu.core import flatten_tree
    from mfas_tpu.fusion.avmnist import Searchable_Audio_Image_Net

    args = types.SimpleNamespace(channels=4, num_outputs=10,
                                 inner_representation_size=8, drpt=0.5,
                                 multitask=False, alphas=True,
                                 batchnorm=False)
    model = Searchable_Audio_Image_Net(args, np.array([[4, 2, 1], [1, 0, 0]]))
    eager = flatten_tree(model.init(5, compile=False))
    compiled = flatten_tree(model.init(5, compile=True))
    assert eager.keys() == compiled.keys()
    for k in eager:
        np.testing.assert_array_equal(np.asarray(eager[k]),
                                      np.asarray(compiled[k]), err_msg=k)
