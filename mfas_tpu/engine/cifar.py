"""CIFAR train engine (reference models/search/train_searchable/cifar.py):
single-image input, (logits, aux_logits) output, optional 0.4-weighted
auxiliary loss, dev ERROR tracking (best acc = 1 - best error)."""

from __future__ import annotations

import jax.numpy as jnp

from mfas_tpu.core import functional as F
from mfas_tpu.engine.classifier import ClassifierEngine


class CifarEngine(ClassifierEngine):
    def __init__(self, model, use_intermediate=False, aux_weight=0.4,
                 weight_decay=1e-4, mesh=None):
        # initial_best_acc=-1.0: the reference cifar loop tracks best
        # ERROR from 1e100, so the first dev epoch ALWAYS snapshots, even
        # at accuracy 0 (cifar.py:18,80-83); with num_epochs=0 the -1.0
        # escapes as the "accuracy", matching the reference's 1-1e100.
        # adam_skip_disconnected: dead submodules (aux head when the aux
        # loss is off, never-consumed FactorizedReductions) have grad=None
        # in torch and are never stepped (core/optim.py).
        super().__init__(model, multitask=False, weight_decay=weight_decay,
                         input_keys=("image",), label_key="label", mesh=mesh,
                         initial_best_acc=-1.0, adam_skip_disconnected=True)
        self.use_intermediate = use_intermediate
        self.aux_weight = aux_weight

    def _forward(self, tree, ctx, batch):
        out, iout = self.model.apply(tree, ctx, batch["image"])
        label = batch["label"]
        w = batch["_mask"]
        loss = F.cross_entropy(out, label, w)
        if self.use_intermediate:
            loss = loss + self.aux_weight * F.cross_entropy(iout, label, w)
        preds = jnp.argmax(out, axis=1)
        corrects = jnp.sum((preds == label) * w)
        return loss, corrects
