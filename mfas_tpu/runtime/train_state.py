"""Resumable training state (additive over the reference, SURVEY.md §5.4:
the reference checkpoints weights only — no optimizer/step/epoch state —
so a long run cannot resume).

The whole state rides in one torch-format checkpoint (runtime.checkpoint),
namespaced by key prefixes:
  model/...   current param+buffer tree (flat state_dict keys)
  best/...    best-dev tree so far
  opt/m/...   adam first moments (trainable leaves only)
  opt/v/...   adam second moments
  meta        json: epoch, best_acc, scheduler state, adam step
"""

from __future__ import annotations

import json

import numpy as np

import jax.numpy as jnp

from mfas_tpu.core.module import flatten_tree, unflatten_tree
from mfas_tpu.runtime import checkpoint as ckpt


def _flat(tree, prefix):
    return {f"{prefix}/{k}": np.asarray(v)
            for k, v in flatten_tree(tree).items() if v is not None}


def _unflat(flat, prefix, template):
    tflat = flatten_tree(template)
    out = {}
    for k, tv in tflat.items():
        if tv is None:
            out[k] = None
        else:
            out[k] = jnp.asarray(flat[f"{prefix}/{k}"])
    return unflatten_tree(out)


def save_train_state(path, *, tree, best_tree, opt_state, scheduler, epoch,
                     best_acc):
    # multi-host: params/opt state are replicated, so only process 0
    # writes — concurrent writers would interleave on a shared filesystem
    from mfas_tpu.parallel.mesh import is_primary_process
    if not is_primary_process():
        return
    flat = {}
    flat.update(_flat(tree, "model"))
    flat.update(_flat(best_tree, "best"))
    flat.update(_flat(opt_state["m"], "opt/m"))
    flat.update(_flat(opt_state["v"], "opt/v"))
    if isinstance(opt_state["step"], dict):
        # adam_init(per_leaf_step=True): step is a tree mirroring the
        # trainable params (torch's per-param state['step']); flatten it
        # like m/v so per-leaf bias corrections survive the round-trip
        flat.update(_flat(opt_state["step"], "opt/step"))
    else:
        flat["opt/step"] = np.asarray(opt_state["step"])
    meta = {"epoch": int(epoch), "best_acc": float(best_acc),
            "scheduler": scheduler.state_dict()}
    flat["meta"] = np.frombuffer(json.dumps(meta).encode(), np.uint8).copy()
    ckpt.save(flat, path)


def load_train_state(path, *, tree_template, trainable_template, scheduler):
    obj = ckpt.load(path)
    flat = {str(k): np.asarray(v) for k, v in obj.items()}
    meta = json.loads(bytes(flat["meta"].tobytes()).decode())
    scheduler.load_state_dict(meta["scheduler"])
    tree = _unflat(flat, "model", tree_template)
    best_tree = _unflat(flat, "best", tree_template)
    opt_state = {
        "m": _unflat(flat, "opt/m", trainable_template),
        "v": _unflat(flat, "opt/v", trainable_template),
        # scalar step states carry one "opt/step" entry; per-leaf states
        # (adam_init per_leaf_step=True) were flattened like m/v —
        # adam_update dispatches on the restored structure, so each
        # checkpoint keeps its original stepping semantics
        "step": (jnp.asarray(flat["opt/step"]) if "opt/step" in flat
                 else _unflat(flat, "opt/step", trainable_template)),
    }
    return {"tree": tree, "best_tree": best_tree, "opt_state": opt_state,
            "epoch": meta["epoch"], "best_acc": meta["best_acc"]}
