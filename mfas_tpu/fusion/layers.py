"""conf -> progressive fusion head builder.

An architecture is an integer matrix ``conf`` of shape (L<=max_fusions, 3):
row i = [modA_tap_idx, modB_tap_idx, activation_idx] with activations
0=ReLU, 1=Sigmoid, 2=LeakyReLU (reference models/search/ntu_searchable.py:
178-301 and avmnist_searchable.py:184-297).

At each row the two chosen globally-pooled taps (optionally alpha-gated)
are concatenated with the previous fusion output and pushed through
Linear -> activation (-> BatchNorm1d) (-> Dropout) into a shared hidden
size; a final Linear classifies.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mfas_tpu.core import init as I
from mfas_tpu.core import layers as L
from mfas_tpu.core.module import Module, ModuleList, Sequential

ACTIVATIONS = {0: L.ReLU, 1: L.Sigmoid, 2: L.LeakyReLU}
ACT_NAMES = {0: "relu", 1: "sigmoid", 2: "lrelu"}


def build_fusion_layers(conf, sizes_a, sizes_b, hidden, drpt, batchnorm):
    """ModuleList of per-row Sequential(Linear, act[, BN1d][, Dropout]).

    Layer composition rules follow ntu_searchable.py:274-282 (NTU: BN
    allowed) — callers for AVMNIST pass batchnorm=False because its fusion
    layers never use BN (avmnist_searchable.py:276-285)."""
    rows = []
    for i, row in enumerate(np.asarray(conf)):
        in_size = sizes_a[int(row[0])] + sizes_b[int(row[1])]
        if i > 0:
            in_size += hidden
        mods = [L.Linear(in_size, hidden), ACTIVATIONS[int(row[2])]()]
        if batchnorm:
            mods.append(L.BatchNorm1d(hidden))
        if drpt > 1e-10:
            mods.append(L.Dropout(drpt))
        rows.append(Sequential(*mods))
    return ModuleList(rows)


def build_alphas(conf, sizes_a, sizes_b):
    """Per-row AlphaScalarMultiplication gates, alpha ~ N(0, 0.1)
    (ntu_searchable.py:202-204, 288-296)."""
    return ModuleList([
        L.AlphaScalarMultiplication(sizes_a[int(r[0])], sizes_b[int(r[1])],
                                    alpha_init=I.normal(0.0, 0.1))
        for r in np.asarray(conf)
    ])


def progressive_fuse(net, tree, ctx, feats_a, feats_b):
    """Shared forward logic of the searchable fusion heads.

    ``net`` owns ``alphas``/``fusion_layers``/``central_classifier`` as
    direct children (keeping the reference's state_dict key layout);
    ``feats_a``/``feats_b`` are per-row lists of (B, C_row) pooled taps."""
    out = None
    for i in range(len(net.conf)):
        fa, fb = feats_a[i], feats_b[i]
        if net.args.alphas:
            fa, fb = net.alphas[i](Module.sub(Module.sub(tree, "alphas"), i),
                                   ctx, fa, fb)
        pieces = [fa, fb] if out is None else [fa, fb, out]
        fused = jnp.concatenate(pieces, axis=1)
        out = net.fusion_layers[i](
            Module.sub(Module.sub(tree, "fusion_layers"), i), ctx, fused)
    return net.central_classifier(Module.sub(tree, "central_classifier"), ctx, out)


def enumerate_layer_confs(n_taps_a, n_taps_b, n_acts):
    """All one-row unfoldings [a_idx, b_idx, act] in lexicographic order
    (reference get_possible_layer_configurations; NTU (4,4,2) -> 32 rows,
    AVMNIST (5,3,2) -> 30 rows)."""
    return [[a, b, n] for a in range(n_taps_a) for b in range(n_taps_b)
            for n in range(n_acts)]


def shared_weight_key(layer_index, in_size, out_size, act_idx):
    """Weight-sharing key '{i}.L_{in}_{out}.A_{relu|sigmoid|lrelu}'
    (ntu_searchable.py:123-175)."""
    return f"{layer_index}.L_{in_size}_{out_size}.A_{ACT_NAMES[int(act_idx)]}"
