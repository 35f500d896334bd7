"""MM-IMDB multi-label training engine (reference
models/search/train_searchable/mmimdb.py:15-137).

Semantics preserved: per-batch cosine scheduler before the step; dev-phase
predictions at sigmoid > th_fscore (0.3); samples-averaged F1 selects the
best state; NaN-loss escape returns the best-so-far F1; the one-extra-epoch
NaN-F1 failsafe for single-epoch candidate training; NaN best-F1 collapses
to 0.0 at the end.
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

from mfas_tpu.core import functional as F
from mfas_tpu.core.module import Ctx, Rng, apply_updates, merge
from mfas_tpu.core.optim import adam_init, adam_update
from mfas_tpu.data.mm_imdb import samples_f1
from mfas_tpu.engine.classifier import split_tree
from mfas_tpu.parallel import mesh as pm


class MMIMDBEngine:
    def __init__(self, model, pos_weight=2.0, weight_decay=1e-4,
                 th_fscore=0.3, stable_bce=False, mesh=None):
        # stable_bce=True swaps in the exact logsumexp BCE (no overflow
        # NaNs); default False reproduces the reference loss bit-for-bit,
        # NaN failsafe and all
        self.stable_bce = stable_bce
        self.model = model
        self.pos_weight = pos_weight
        self.weight_decay = weight_decay
        self.th_fscore = th_fscore
        # mesh: batches sharded over the 'data' axis, params replicated —
        # XLA inserts the gradient all-reduce (the DataParallel equivalent,
        # same contract as ClassifierEngine)
        self.mesh = mesh
        self._steps = {}  # (train, text_len) -> jitted fn

    def _place(self, batch):
        from mfas_tpu.engine.classifier import place_batch
        return place_batch(batch, self.mesh)

    def _prefetched(self, loader, size=2):
        """Yield (n_valid, host_label, host_mask, device_batch) with
        collation + H2D placement one batch ahead on a background thread
        (same pipeline as ClassifierEngine._prefetched). Labels/masks ride
        along as HOST arrays: the F1 needs per-sample rows, and under a
        multi-process mesh the placed copies span non-addressable
        devices."""
        from mfas_tpu.data.loader import prefetch_to_device

        def place(batch):
            return (float(np.sum(batch["_mask"])), batch["label"],
                    batch["_mask"], self._place(batch))

        return prefetch_to_device(loader, size=size, place=place)

    def _replicated(self, *trees):
        if self.mesh is None:
            return trees
        return tuple(pm.replicate_tree(t, self.mesh) for t in trees)

    def _forward(self, tree, ctx, batch):
        out = self.model.apply(tree, ctx, batch["text"], batch["image"])
        if isinstance(out, (tuple, list)):
            out = out[-1]
        return out

    def _train_step_impl(self, trainable, frozen, opt_state, batch, lr, rng):
        def loss_fn(tr):
            tree = merge(tr, frozen)
            ctx = Ctx(train=True, rng=Rng(rng))
            logits = self._forward(tree, ctx, batch)
            per = F.weighted_bce_elements(logits, batch["label"],
                                          self.pos_weight,
                                          stable=self.stable_bce)
            loss = jnp.sum(jnp.mean(per, axis=1) * batch["_mask"]) \
                / jnp.maximum(jnp.sum(batch["_mask"]), 1.0)
            return loss, ctx.updates

        (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable)
        # whole-net training with dead heads (SimpleVTNet discards the
        # unimodal t_out/im_out logits): torch leaves grad-None params
        # unstepped — replicate via skip_disconnected (core/optim.py)
        trainable, opt_state = adam_update(trainable, grads, opt_state, lr,
                                           weight_decay=self.weight_decay,
                                           skip_disconnected=True)
        frozen = apply_updates(frozen, updates)
        return trainable, frozen, opt_state, loss

    def _eval_step_impl(self, trainable, frozen, batch):
        tree = merge(trainable, frozen)
        logits = self._forward(tree, Ctx(train=False), batch)
        return jax.nn.sigmoid(logits) > self.th_fscore

    def _get_step(self, kind, text_len):
        key = (kind, text_len)
        if key not in self._steps:
            if len(self._steps) == 24:
                import warnings
                warnings.warn(
                    "MMIMDBEngine compiled 24 distinct (phase, text_len) "
                    "programs; pass bucket_text=True to MMIMDBLoader (the "
                    "default) to bound text lengths to pow-2 buckets",
                    RuntimeWarning, stacklevel=2)
            if kind == "train":
                self._steps[key] = jax.jit(self._train_step_impl)
            elif self.mesh is not None:
                # predictions are fetched per-sample on the host for the
                # F1 below; under a multi-process mesh the raw output is
                # sharded across non-addressable devices, which
                # np.asarray cannot fetch — land it replicated (one
                # all-gather of a (B, labels) bool array)
                self._steps[key] = jax.jit(
                    self._eval_step_impl,
                    out_shardings=pm.replicated(self.mesh))
            else:
                self._steps[key] = jax.jit(self._eval_step_impl)
        return self._steps[key]

    def train_track_f1(self, tree, trainable_prefixes, dataloaders,
                       dataset_sizes, scheduler, num_epochs, seed=0,
                       verbose=False, init_f1=0.0):
        trainable, frozen = split_tree(self.model, tree, trainable_prefixes)
        trainable, frozen = self._replicated(trainable, frozen)
        # this engine's step uses skip_disconnected (dead unimodal heads);
        # per-leaf steps give torch's per-param count (core/optim.py)
        opt_state = adam_init(trainable, per_leaf_step=True)
        rng = Rng(seed)

        best_f1 = init_f1
        best = merge(trainable, frozen)

        failsafe, cont_overloop = True, 0
        while failsafe:
            for epoch in range(num_epochs):
                for phase in ("train", "dev"):
                    preds_all, labels_all = [], []
                    loss_terms = []
                    for n_valid, label, mask, jb in self._prefetched(
                            dataloaders[phase]):
                        text_len = int(jb["text"].shape[1])
                        if phase == "train":
                            eta = scheduler.step()
                            step = self._get_step("train", text_len)
                            trainable, frozen, opt_state, loss = step(
                                trainable, frozen, opt_state, jb,
                                jnp.float32(eta), rng.next())
                            loss_terms.append((loss, n_valid))
                        else:
                            step = self._get_step("eval", text_len)
                            pred = np.asarray(step(trainable, frozen, jb))
                            keep = mask > 0
                            preds_all.append(pred[keep])
                            labels_all.append(label[keep])

                    if phase == "train":
                        running_loss = sum(float(l) * n for l, n in loss_terms)
                        epoch_loss = running_loss / dataset_sizes["train"]
                        if math.isnan(epoch_loss):
                            # NaN escape (reference :110-114)
                            print("Nan loss during training, escaping")
                            return best_f1 if not math.isnan(best_f1) else 0.0, best
                    else:
                        y_pred = np.concatenate(preds_all)
                        y_true = np.concatenate(labels_all) > 0.5
                        curr_f1 = samples_f1(y_true, y_pred)
                        if verbose:
                            print("epoch #{} {} F1: {:.4f} ".format(
                                epoch, phase, curr_f1))
                        if curr_f1 > best_f1:
                            best_f1 = curr_f1
                            best = merge(trainable, frozen)

            # reachable only when the CALLER passes init_f1=NaN (the
            # `curr_f1 > best_f1` update can never assign NaN, and
            # samples_f1 is division-guarded) — faithfully matching the
            # reference, whose loop has the identical property
            # (train_searchable/mmimdb.py:20,124-127)
            if math.isnan(best_f1) and num_epochs == 1 and cont_overloop < 1:
                print("Recording a NaN F1, training for one more epoch.")
            else:
                failsafe = False
            cont_overloop += 1

        if math.isnan(best_f1):
            best_f1 = 0.0
        return best_f1, best

    def test_track_f1(self, tree, dataloader):
        """Samples-F1 over a loader with eval-mode predictions at
        sigmoid > th_fscore — the test-set counterpart of train_track_f1's
        dev phase (same mesh placement)."""
        trainable, frozen = split_tree(self.model, tree, None)
        trainable, frozen = self._replicated(trainable, frozen)
        preds_all, labels_all = [], []
        for _, label, mask, jb in self._prefetched(dataloader):
            step = self._get_step("eval", int(jb["text"].shape[1]))
            pred = np.asarray(step(trainable, frozen, jb))
            keep = mask > 0
            preds_all.append(pred[keep])
            labels_all.append(np.asarray(label)[keep])
        return samples_f1(np.concatenate(labels_all) > 0.5,
                          np.concatenate(preds_all))
