"""Compiled train/eval engine for the classification verticals.

Replaces the reference's per-batch torch loops
(models/search/train_searchable/{ntu,avmnist}.py) with a single jitted
train step: forward + (multitask) CE + backward + torch-semantics Adam +
BatchNorm running-stat fold-in, all in one XLA program. The per-batch
cosine-restart learning rate is computed on host (bit-exact schedule,
mfas_tpu.core.sched) and enters the step as a traced scalar.

Loop semantics preserved from the reference (train_ntu_track_acc,
train_searchable/ntu.py:14-89):
  * epochs x {train, dev} phases; train phase steps the scheduler per batch
    *before* the optimizer step;
  * multitask loss = sum of CE over the three heads; predictions from
    argmax of the summed logits (:60-61);
  * best-dev state is kept and restored at the end (:82-88).

Under a mesh, batches are sharded over the ``data`` axis and parameters
replicated — XLA inserts the ICI all-reduce (replacing DataParallel).
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from mfas_tpu.core import functional as F
from mfas_tpu.core.module import (Ctx, Rng, apply_updates, merge,
                                  partition, prefix_predicate)
from mfas_tpu.core.optim import adam_init, adam_update
from mfas_tpu.parallel import mesh as pm


def split_tree(model, tree, trainable_prefixes=None):
    """Partition a model tree into (trainable, frozen) by param kind and
    optional dotted prefixes (e.g. ``central_params()``)."""
    is_param = model.param_predicate()
    if trainable_prefixes is None:
        pred = is_param
    else:
        in_prefix = prefix_predicate(trainable_prefixes)

        def pred(path):
            return is_param(path) and in_prefix(path)

    return partition(tree, pred)


def place_batch(batch, mesh, h2d_chunks=None):
    """Host batch -> device/mesh placement (shared by every engine).
    Under a mesh, host arrays go straight to their shards
    (device_put_global); a jnp.asarray hop first would stage the full
    batch on one device before resharding. ``h2d_chunks`` splits large
    single-device transfers (data/loader.chunked_device_put experiment);
    env ``MFAS_H2D_CHUNKS`` overrides it HERE, in the shared primitive,
    so the knob reaches every engine (MMIMDBEngine/CifarEngine included),
    not just the one whose constructor happens to read it.

    Values that are ALREADY device arrays (the HBM-resident store riding
    along in data/resident.py batches, placed once with its own
    replicated/sharded layout) pass through untouched — re-placing them
    with the batch sharding would copy the whole store every step. Under
    a mesh only COMMITTED arrays skip (an uncommitted single-device array
    still needs its mesh placement); the store is committed by
    construction there (device_put_global with a NamedSharding)."""
    env_chunks = os.environ.get("MFAS_H2D_CHUNKS")
    if env_chunks:
        h2d_chunks = int(env_chunks)

    def placed(x):
        if not isinstance(x, jax.Array):
            return False
        return mesh is None or getattr(x, "committed", False)

    if mesh is not None:
        return pm.shard_batch(batch, mesh, skip=placed)
    if h2d_chunks:
        from mfas_tpu.data.loader import chunked_device_put
        return {k: v if placed(v) else chunked_device_put(v, h2d_chunks)
                for k, v in batch.items()}
    return {k: v if placed(v) else jnp.asarray(v)
            for k, v in batch.items()}


class ClassifierEngine:
    def __init__(self, model, multitask=False, weight_decay=1e-4,
                 input_keys=("image", "audio"), label_key="label",
                 mesh=None, donate=False, remat=False, compute_dtype=None,
                 batch_prep=None, initial_best_acc=0.0,
                 adam_skip_disconnected=False, h2d_chunks=None):
        # donate: donate trainable/opt buffers into the train step (halves
        # their HBM footprint); best-dev snapshots are then deep-copied so
        # they never alias a donated buffer (_snapshot)
        self.model = model
        self.multitask = multitask
        self.weight_decay = weight_decay
        self.input_keys = tuple(input_keys)
        self.label_key = label_key
        self.mesh = mesh
        # remat: rematerialize the forward during backward — trades FLOPs
        # for HBM so bigger clips/batches fit (jax.checkpoint)
        self.remat = remat
        # compute_dtype: mixed precision — params/Adam stay float32, the
        # forward/backward runs in e.g. bfloat16 (MXU-native), losses and
        # running-stat updates are folded back at float32
        self.compute_dtype = compute_dtype
        # batch_prep: traced in-graph batch transform (e.g. the fused
        # uint8 -> normalized-float input kernel for packed NTU batches)
        self.batch_prep = batch_prep
        # reference NTU/AVMNIST loops start best_acc at 0 (a 0.0 dev epoch
        # never snapshots); the CIFAR loop tracks best ERROR from 1e100 so
        # its FIRST dev epoch always snapshots — CifarEngine passes -1.0
        self.initial_best_acc = initial_best_acc
        # whole-net training with dead submodules: torch leaves grad-None
        # params unstepped — replicate via skip_disconnected (core/optim.py)
        self.adam_skip_disconnected = adam_skip_disconnected
        # h2d_chunks: split each batch's H2D transfer into N puts (see
        # data/loader.chunked_device_put); env MFAS_H2D_CHUNKS overrides
        # inside place_batch itself so it reaches every engine
        self.h2d_chunks = h2d_chunks
        self._donate = bool(donate)

        self._train_step = jax.jit(
            self._train_step_impl,
            donate_argnums=(0, 2) if donate else ())
        self._eval_step = jax.jit(self._eval_step_impl)

    # ---------------- compiled bodies
    def _cast_compute(self, tree):
        """Cast float leaves to the compute dtype, EXCEPT BatchNorm's
        running-stat buffers: casting them would re-quantize the carried
        EMA to bf16 every step (core.module.cast_compute)."""
        from mfas_tpu.core.module import cast_compute
        return cast_compute(tree, self.compute_dtype)

    def _forward(self, tree, ctx, batch):
        if self.batch_prep is not None:
            batch = self.batch_prep(batch)
        tree = self._cast_compute(tree)
        inputs = self._cast_compute(tuple(batch[k] for k in self.input_keys))
        out = self.model.apply(tree, ctx, inputs)
        if self.compute_dtype is not None:
            out = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.float32), out)
        label = batch[self.label_key]
        w = batch["_mask"]
        if self.multitask:
            loss = sum(F.cross_entropy(o, label, w) for o in out)
            preds = jnp.argmax(sum(out), axis=1)
        else:
            if isinstance(out, (tuple, list)):
                out = out[0]
            loss = F.cross_entropy(out, label, w)
            preds = jnp.argmax(out, axis=1)
        corrects = jnp.sum((preds == label) * w)
        return loss, corrects

    def _train_step_impl(self, trainable, frozen, opt_state, batch, lr, rng):
        def fwd(tr, frozen, batch, rng):
            tree = merge(tr, frozen)
            ctx = Ctx(train=True, rng=Rng(rng))
            loss, corrects = self._forward(tree, ctx, batch)
            return loss, (ctx.updates, corrects)

        if self.remat:
            fwd = jax.checkpoint(fwd)

        def loss_fn(tr):
            return fwd(tr, frozen, batch, rng)

        (loss, (updates, corrects)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(trainable)
        trainable, opt_state = adam_update(
            trainable, grads, opt_state, lr, weight_decay=self.weight_decay,
            skip_disconnected=self.adam_skip_disconnected)
        # BatchNorm emits running-stat updates at f32 regardless of the
        # compute dtype (core/layers.py), so they fold back unchanged
        frozen = apply_updates(frozen, updates)
        return trainable, frozen, opt_state, loss, corrects

    def _eval_step_impl(self, trainable, frozen, batch):
        tree = merge(trainable, frozen)
        loss, corrects = self._forward(tree, Ctx(train=False), batch)
        return loss, corrects

    # ---------------- host loops
    def _snapshot(self, tree):
        """A best-dev snapshot that survives buffer donation: with
        donate=True the next train step invalidates the current trainable
        buffers, so the snapshot must own its arrays."""
        if not self._donate:
            return tree
        return jax.tree_util.tree_map(jnp.copy, tree)

    def _place(self, batch):
        return place_batch(batch, self.mesh, h2d_chunks=self.h2d_chunks)

    def _prefetched(self, loader, size=2):
        """Yield (n_valid, device_batch) with collation + H2D running one
        batch ahead on a background thread (SURVEY §2.1 pinned-memory
        pipeline equivalent)."""
        from mfas_tpu.data.loader import prefetch_to_device

        def place(batch):
            return float(np.sum(batch["_mask"])), self._place(batch)

        return prefetch_to_device(loader, size=size, place=place)

    def train_track_acc(self, tree, trainable_prefixes, dataloaders,
                        dataset_sizes, scheduler, num_epochs, seed=0,
                        verbose=False, print_loss=True, state_path=None,
                        resume=False, jsonl_log=None):
        """Returns (best_dev_acc, best_tree). With ``state_path``, the full
        training state (params, Adam moments, scheduler, best-dev snapshot)
        is checkpointed per epoch and ``resume=True`` continues a long run
        (additive over the reference, SURVEY §5.4; the dropout RNG stream
        restarts at the resumed epoch)."""
        trainable, frozen = split_tree(self.model, tree, trainable_prefixes)
        if self.mesh is not None:
            trainable = pm.replicate_tree(trainable, self.mesh)
            frozen = pm.replicate_tree(frozen, self.mesh)
        # per-leaf steps pair with skip_disconnected: torch's per-param
        # step count, exact for transiently-disconnected modules too
        opt_state = adam_init(trainable,
                              per_leaf_step=self.adam_skip_disconnected)
        rng = Rng(seed)

        best_acc = self.initial_best_acc
        best_tree = self._snapshot(merge(trainable, frozen))
        start_epoch = 0

        found_state = bool(state_path and os.path.exists(state_path))
        if resume:
            # multi-host: a host-local state file visible on only some
            # hosts would desynchronize epoch counts -> collective deadlock
            from mfas_tpu.parallel.mesh import require_resume_agreement
            require_resume_agreement((int(found_state),))
        if resume and found_state:
            from mfas_tpu.runtime.train_state import load_train_state
            st = load_train_state(state_path,
                                  tree_template=merge(trainable, frozen),
                                  trainable_template=trainable,
                                  scheduler=scheduler)
            trainable, frozen = split_tree(self.model, st["tree"],
                                           trainable_prefixes)
            best_tree = st["best_tree"]
            best_acc = st["best_acc"]
            opt_state = st["opt_state"]
            if self.mesh is not None:
                # loaded leaves are single-device host arrays; the fresh-
                # start path replicates over the mesh, so must resume
                # (multi-process jit rejects non-global operands)
                trainable = pm.replicate_tree(trainable, self.mesh)
                frozen = pm.replicate_tree(frozen, self.mesh)
                opt_state = pm.replicate_tree(opt_state, self.mesh)
                best_tree = pm.replicate_tree(best_tree, self.mesh)
            # both found the file AND loaded the same epoch (stale copies
            # on some hosts would diverge just as silently)
            from mfas_tpu.parallel.mesh import require_resume_agreement
            require_resume_agreement((int(st["epoch"]),))
            start_epoch = st["epoch"] + 1
            rng = Rng(seed + start_epoch)
            if verbose or print_loss:
                print(f"Resuming training at epoch {start_epoch} "
                      f"(best dev acc {best_acc:.4f})")

        for epoch in range(start_epoch, num_epochs):
            for phase in ("train", "dev"):
                # per-batch scalars stay on device until the phase ends so
                # host dispatch pipelines ahead of execution (a per-batch
                # float(loss) would force a sync every step)
                loss_terms, correct_terms = [], []
                for n_valid, batch in self._prefetched(dataloaders[phase]):
                    if phase == "train":
                        eta = scheduler.step()
                        trainable, frozen, opt_state, loss, corrects = \
                            self._train_step(trainable, frozen, opt_state,
                                             batch, jnp.float32(eta), rng.next())
                    else:
                        loss, corrects = self._eval_step(trainable, frozen, batch)
                    loss_terms.append((loss, n_valid))
                    correct_terms.append(corrects)

                running_loss = sum(float(l) * n for l, n in loss_terms)
                running_corrects = sum(float(c) for c in correct_terms)
                epoch_loss = running_loss / dataset_sizes[phase]
                epoch_acc = running_corrects / dataset_sizes[phase]
                if print_loss:
                    print("{} Loss: {:.4f} Acc: {:.4f}".format(
                        phase, epoch_loss, epoch_acc))
                if jsonl_log and pm.is_primary_process():
                    import json
                    with open(jsonl_log, "a") as f:
                        f.write(json.dumps({
                            "kind": "epoch", "phase": phase, "epoch": epoch,
                            "loss": epoch_loss, "acc": epoch_acc,
                            "lr": getattr(scheduler, "eta", None)}) + "\n")
                if phase == "dev" and epoch_acc > best_acc:
                    best_acc = epoch_acc
                    best_tree = self._snapshot(merge(trainable, frozen))

            if state_path:
                from mfas_tpu.runtime.train_state import save_train_state
                save_train_state(state_path, tree=merge(trainable, frozen),
                                 best_tree=best_tree, opt_state=opt_state,
                                 scheduler=scheduler, epoch=epoch,
                                 best_acc=best_acc)

        return best_acc, best_tree

    def test_track_acc(self, tree, dataloader, dataset_size):
        trainable, frozen = split_tree(self.model, tree, None)
        if self.mesh is not None:
            trainable = pm.replicate_tree(trainable, self.mesh)
            frozen = pm.replicate_tree(frozen, self.mesh)
        correct_terms = []
        for _, batch in self._prefetched(dataloader):
            _, c = self._eval_step(trainable, frozen, batch)
            correct_terms.append(c)
        return sum(float(c) for c in correct_terms) / dataset_size
