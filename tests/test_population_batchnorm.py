"""Population-trainer BatchNorm parity (spec.batchnorm=True — the
`--batchnorm` NTU search path). The padded vmapped candidate forward must
reproduce the reference fusion chain Linear -> act -> BatchNorm1d exactly:
train-mode batch statistics, the momentum-0.1 unbiased running-stat update,
and eval-mode normalization (reference ntu_searchable.py:271-279 builds
nn.BatchNorm1d(out_size) at Sequential slot 2)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from mfas_tpu.search.population import (PopulationSpec, _candidate_forward,
                                        encode_confs, init_population)

SIZES_A = (6, 10, 8, 4)
SIZES_B = (12, 5, 9, 7)
H = 8
B = 5


def build_torch_chain(conf, params, bn_c):
    """Reference fusion math with the population slot weights sliced back
    to true shapes."""
    ca, cb = max(SIZES_A), max(SIZES_B)
    layers = []
    for r in range(len(conf)):
        na, nb = SIZES_A[conf[r][0]], SIZES_B[conf[r][1]]
        in_size = na + nb + (H if r > 0 else 0)
        lin = torch.nn.Linear(in_size, H)
        W = np.asarray(params["W"])[0, r].copy()
        pieces = [W[:, :na], W[:, ca:ca + nb]]
        if r > 0:
            pieces.append(W[:, ca + cb:ca + cb + H])
        with torch.no_grad():
            lin.weight.copy_(torch.from_numpy(np.concatenate(pieces, 1)))
            lin.bias.copy_(torch.from_numpy(np.asarray(params["b"])[0, r]))
        bn = torch.nn.BatchNorm1d(H)
        with torch.no_grad():
            bn.weight.copy_(torch.from_numpy(np.asarray(params["bn_scale"])[0, r]))
            bn.bias.copy_(torch.from_numpy(np.asarray(params["bn_bias"])[0, r]))
            bn.running_mean.copy_(torch.from_numpy(np.asarray(bn_c["mean"])[0, r]))
            bn.running_var.copy_(torch.from_numpy(np.asarray(bn_c["var"])[0, r]))
        layers.append((lin, bn))
    return layers


def torch_forward(conf, layers, cls_w, cls_b, fa, fb, train):
    out = None
    for r, (lin, bn) in enumerate(layers):
        bn.train(train)
        a = torch.from_numpy(fa[:, conf[r][0], :SIZES_A[conf[r][0]]])
        b = torch.from_numpy(fb[:, conf[r][1], :SIZES_B[conf[r][1]]])
        x = torch.cat([a, b] + ([out] if r > 0 else []), dim=1)
        h = lin(x)
        h = torch.relu(h) if conf[r][2] == 0 else torch.sigmoid(h)
        out = bn(h)
    logits = out @ torch.from_numpy(cls_w).T + torch.from_numpy(cls_b)
    return logits.detach().numpy()


@pytest.mark.parametrize("train", [True, False])
def test_population_bn_matches_torch(train):
    spec = PopulationSpec(sizes_a=SIZES_A, sizes_b=SIZES_B, hidden=H,
                          num_outputs=3, max_rows=4, batchnorm=True,
                          drpt=0.0, use_alphas=False, multitask=False)
    conf = [[2, 0, 0], [1, 3, 1]]
    params, bn_state = init_population([np.array(conf)], spec, seed=0)
    # non-trivial running stats so eval mode is a real check
    rs = np.random.RandomState(1)
    bn_state = {"mean": jnp.asarray(rs.randn(1, 4, H).astype(np.float32) * 0.1),
                "var": jnp.asarray(1.0 + 0.3 * rs.rand(1, 4, H).astype(np.float32))}

    fa = rs.randn(B, 4, max(SIZES_A)).astype(np.float32)
    fb = rs.randn(B, 4, max(SIZES_B)).astype(np.float32)
    # zero the padding columns (the real extractor pads with zeros)
    for i, s in enumerate(SIZES_A):
        fa[:, i, s:] = 0.0
    for i, s in enumerate(SIZES_B):
        fb[:, i, s:] = 0.0

    enc = encode_confs([np.array(conf)], spec)
    got, new_bn = _candidate_forward(
        spec, {k: v[0] for k, v in params.items()},
        {k: v[0] for k, v in bn_state.items()},
        {k: jnp.asarray(v)[0] for k, v in enc.items()},
        jnp.asarray(fa), jnp.asarray(fb), train, jnp.zeros(2, jnp.uint32))

    layers = build_torch_chain(conf, params, bn_state)
    want = torch_forward(conf, layers, np.asarray(params["cls_w"])[0],
                         np.asarray(params["cls_b"])[0], fa, fb, train)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)

    if train:
        # torch mutated its running buffers in the forward; rows 0..1 of the
        # population state must match (rows 2..3 are masked rows — unused)
        for r, (_, bn) in enumerate(layers):
            np.testing.assert_allclose(
                np.asarray(new_bn["mean"][r]), bn.running_mean.numpy(),
                rtol=1e-4, atol=1e-6, err_msg=f"running_mean row {r}")
            np.testing.assert_allclose(
                np.asarray(new_bn["var"][r]), bn.running_var.numpy(),
                rtol=1e-4, atol=1e-6, err_msg=f"running_var row {r}")


def test_population_bn_masked_ragged_batch_matches_torch_true_batch():
    """A ragged final batch is padded by repeating a sample with wmask=0;
    BN statistics must cover only the real rows — exactly what torch
    computes over the true smaller batch (the reference never pads)."""
    spec = PopulationSpec(sizes_a=SIZES_A, sizes_b=SIZES_B, hidden=H,
                          num_outputs=3, max_rows=4, batchnorm=True,
                          drpt=0.0, use_alphas=False, multitask=False)
    conf = [[2, 0, 0], [1, 3, 1]]
    params, bn_state = init_population([np.array(conf)], spec, seed=0)
    rs = np.random.RandomState(2)
    bn_state = {"mean": jnp.asarray(rs.randn(1, 4, H).astype(np.float32) * 0.1),
                "var": jnp.asarray(1.0 + 0.3 * rs.rand(1, 4, H).astype(np.float32))}

    valid = 3                                   # true batch
    fa_t = rs.randn(valid, 4, max(SIZES_A)).astype(np.float32)
    fb_t = rs.randn(valid, 4, max(SIZES_B)).astype(np.float32)
    for i, s in enumerate(SIZES_A):
        fa_t[:, i, s:] = 0.0
    for i, s in enumerate(SIZES_B):
        fb_t[:, i, s:] = 0.0
    # padded batch: repeat row 0, mask it out
    fa = np.concatenate([fa_t, np.repeat(fa_t[:1], B - valid, 0)], 0)
    fb = np.concatenate([fb_t, np.repeat(fb_t[:1], B - valid, 0)], 0)
    wmask = np.zeros((B,), np.float32)
    wmask[:valid] = 1.0

    enc = encode_confs([np.array(conf)], spec)
    got, new_bn = _candidate_forward(
        spec, {k: v[0] for k, v in params.items()},
        {k: v[0] for k, v in bn_state.items()},
        {k: jnp.asarray(v)[0] for k, v in enc.items()},
        jnp.asarray(fa), jnp.asarray(fb), True, jnp.zeros(2, jnp.uint32),
        wmask=jnp.asarray(wmask))

    layers = build_torch_chain(conf, params, bn_state)
    want = torch_forward(conf, layers, np.asarray(params["cls_w"])[0],
                         np.asarray(params["cls_b"])[0], fa_t, fb_t, True)
    # valid rows' logits equal the true-batch torch forward
    np.testing.assert_allclose(np.asarray(got)[:valid], want,
                               rtol=1e-4, atol=1e-5)
    # running stats equal torch's true-batch update
    for r, (_, bn) in enumerate(layers):
        np.testing.assert_allclose(
            np.asarray(new_bn["mean"][r]), bn.running_mean.numpy(),
            rtol=1e-4, atol=1e-6, err_msg=f"running_mean row {r}")
        np.testing.assert_allclose(
            np.asarray(new_bn["var"][r]), bn.running_var.numpy(),
            rtol=1e-4, atol=1e-6, err_msg=f"running_var row {r}")
