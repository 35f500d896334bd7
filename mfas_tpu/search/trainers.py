"""Candidate-evaluation adapters: the ``train_sampled_fun`` implementations
handed to the searcher (reference models/search/{ntu,avmnist}_searchable.py
train_sampled_models, :23-108).

Two modes:
  * ``PopulationSearchTrainer`` (default, the TPU path): all K candidates
    train together in one vmapped step over cached frozen-backbone features
    (mfas_tpu.search.population). Backbone FLOPs amortize K-fold; this is
    where the >=10x search-wall-clock target comes from (BASELINE.md).
  * ``SequentialSearchTrainer``: faithful per-candidate loop (fresh model,
    backbone checkpoint injected, central-only Adam + cosine restarts,
    optional weight sharing) — the correctness baseline and the
    weight-sharing path.
"""

from __future__ import annotations

import numpy as np

from mfas_tpu.core.module import tree_set
from mfas_tpu.core.sched import LRCosineAnnealingScheduler
from mfas_tpu.engine.classifier import ClassifierEngine
from mfas_tpu.fusion.layers import shared_weight_key
from mfas_tpu.search.population import PopulationSpec, PopulationTrainer

# Decorrelates the per-candidate training-step RNG stream from the
# parameter-init stream: ``model.init(s)`` and ``Rng(s)`` inside
# train_track_acc both split from PRNGKey(s), so with an equal seed the
# k-th dropout/droppath key would REPLAY the k-th init key (JAX key
# reuse; population.py offsets its two streams the same way). Large so
# neither the +1-per-candidate counter nor train_track_acc's resume
# offset (+epoch) can ever walk an init seed onto a training seed.
TRAIN_SEED_OFFSET = 1_000_003


# --------------------------------------------------------------------------
# weight sharing (reference ntu_searchable.py:123-175)
# --------------------------------------------------------------------------
def get_central_states(model, tree, state_dict, verbose=True):
    """Store each fusion layer's subtree under its shape/activation key."""
    for idx in range(len(model.fusion_layers)):
        lin = model.fusion_layers[idx][0]
        name = shared_weight_key(idx, lin.in_features, lin.out_features,
                                 model.conf[idx][2])
        if verbose:
            if name in state_dict:
                print("Updating shared weight with ID: {}".format(name))
            else:
                print("Creating shared weight with ID: {}".format(name))
        state_dict[name] = tree["fusion_layers"][str(idx)]
    return state_dict


def set_central_states(model, tree, state_dict, verbose=True):
    """Load stored fusion-layer subtrees where keys match; returns tree."""
    for idx in range(len(model.fusion_layers)):
        lin = model.fusion_layers[idx][0]
        name = shared_weight_key(idx, lin.in_features, lin.out_features,
                                 model.conf[idx][2])
        if name in state_dict:
            tree = tree_set(tree, f"fusion_layers.{idx}", state_dict[name])
            if verbose:
                print("Loaded shared weight with ID: {}".format(name))
    return tree


# --------------------------------------------------------------------------
# sequential (reference-semantics) candidate trainer
# --------------------------------------------------------------------------
class SequentialSearchTrainer:
    """One candidate at a time, like the reference loop
    (ntu_searchable.py:38-102 / avmnist_searchable.py:38-108)."""

    def __init__(self, backbone_trees: dict, input_keys, seed=0, mesh=None,
                 batch_prep=None):
        """backbone_trees: attr name -> pretrained tree, e.g.
        {'skenet': ..., 'rgbnet': ...} — replaces the reference's per-
        candidate torch.load of --ske_cp/--rgb_cp.
        batch_prep: traced in-graph batch transform (device_normalize)."""
        self.backbone_trees = backbone_trees
        self.input_keys = tuple(input_keys)
        self._seed = seed
        self.mesh = mesh
        self.batch_prep = batch_prep

    def __call__(self, sampled_configurations, searchable_type, dataloaders,
                 args, device=None, state_dict=None, return_model=()):
        """return_model: indices of candidates whose (model, best_tree)
        should be returned alongside the accuracies (reference
        ntu_searchable.py:35-40, 96-103)."""
        state_dict = {} if state_dict is None else state_dict
        sizes = {k: dl.dataset_size for k, dl in dataloaders.items()}
        nbpe = sizes["train"] / args.batchsize

        accs = []
        models = []
        for idx, configuration in enumerate(sampled_configurations):
            # a non-empty return_model lists the ONLY indices to train
            # (reference ntu_searchable.py:40 gates the whole body with
            # `if not return_model or idx in return_model`); skipped
            # candidates consume nothing — no seed, no training
            if return_model and idx not in return_model:
                continue
            model = searchable_type(args, configuration)
            self._seed += 1
            tree = model.init(self._seed)
            for attr, btree in self.backbone_trees.items():
                tree = tree_set(tree, attr, btree)
            if args.weightsharing:
                tree = set_central_states(model, tree, state_dict,
                                          verbose=args.verbose)

            if args.verbose:
                print("Now training: ")
                print(configuration)

            engine = ClassifierEngine(model, multitask=args.multitask,
                                      input_keys=self.input_keys,
                                      mesh=self.mesh,
                                      batch_prep=self.batch_prep)
            scheduler = LRCosineAnnealingScheduler(
                args.eta_max, args.eta_min, args.Ti, args.Tm, nbpe)
            best_acc, best_tree = engine.train_track_acc(
                tree, model.central_params(), dataloaders, sizes, scheduler,
                num_epochs=args.epochs,
                seed=self._seed + TRAIN_SEED_OFFSET,
                print_loss=args.verbose)

            if args.weightsharing:
                state_dict = get_central_states(model, best_tree, state_dict,
                                                verbose=args.verbose)
            accs.append(float(best_acc))
            if idx in return_model:
                models.append((model, best_tree))
        if return_model:
            return accs, models
        return accs


# --------------------------------------------------------------------------
# CIFAR candidate trainer (whole-net training; reference
# models/search/cifar_searchable.py:21-62)
# --------------------------------------------------------------------------
def get_cifar_states(model, tree, state_dict):
    """Per-cell/per-block op weights keyed 'op{1,2}.{type}.block{b}.cell{c}'
    (cifar_searchable.py:83-114). The reference's get_states also reads
    model.aux_classifier, an attribute that doesn't exist on its own model
    (the attribute is aux_head) — we store the aux head under the same
    'aux_classifier' key the reference intended.

    REPLACE semantics, faithfully: the reference's get_states rebinds its
    state_dict parameter to a fresh dict too (cifar_searchable.py:83-85),
    so after each candidate the store holds ONLY that candidate's keys —
    sharing persists just between candidates whose op choices overlap
    consecutively. The parameter is kept (dead, like the reference's)
    for signature parity."""
    state_dict = {}
    for c in range(len(model.cell_array)):
        cell = model.cell_array[c]
        ctree = tree["cell_array"][str(c)]["blocks"]
        for b in range(len(cell.blocks)):
            block = cell.blocks[b]
            state_dict[f"op1.{block.op1_type}.block{b}.cell{c}"] = \
                ctree[str(b)]["op1"]
            state_dict[f"op2.{block.op2_type}.block{b}.cell{c}"] = \
                ctree[str(b)]["op2"]
    state_dict["input_conv"] = tree["input_conv"]
    state_dict["classifier"] = tree["classifier"]
    state_dict["aux_classifier"] = tree["aux_head"]
    return state_dict


def set_cifar_states(model, tree, state_dict):
    for c in range(len(model.cell_array)):
        cell = model.cell_array[c]
        for b in range(len(cell.blocks)):
            block = cell.blocks[b]
            k1 = f"op1.{block.op1_type}.block{b}.cell{c}"
            k2 = f"op2.{block.op2_type}.block{b}.cell{c}"
            if k1 in state_dict:
                tree = tree_set(tree, f"cell_array.{c}.blocks.{b}.op1",
                                state_dict[k1])
            if k2 in state_dict:
                tree = tree_set(tree, f"cell_array.{c}.blocks.{b}.op2",
                                state_dict[k2])
    for key, path in (("classifier", "classifier"),
                      ("aux_classifier", "aux_head"),
                      ("input_conv", "input_conv")):
        if key in state_dict:
            tree = tree_set(tree, path, state_dict[key])
    return tree


class CifarSearchTrainer:
    """Whole-network per-candidate training (no frozen backbone, so the
    population-over-cached-features transform doesn't apply; candidates
    with heterogeneous op graphs compile as separate programs)."""

    def __init__(self, seed=0, mesh=None):
        self._seed = seed
        self.mesh = mesh

    def __call__(self, sampled_configurations, searchable_type, dataloaders,
                 args, device=None, state_dict=None):
        from mfas_tpu.engine.cifar import CifarEngine

        state_dict = {} if state_dict is None else state_dict
        sizes = {k: dl.dataset_size for k, dl in dataloaders.items()}
        nbpe = sizes["train"] / args.batchsize

        accs = []
        for configuration in sampled_configurations:
            model = searchable_type(args, configuration)
            self._seed += 1
            tree = model.init(self._seed)
            if args.weightsharing:
                tree = set_cifar_states(model, tree, state_dict)
            if args.verbose:
                print("Now training: ")
                print(configuration)

            engine = CifarEngine(model, mesh=self.mesh)
            scheduler = LRCosineAnnealingScheduler(
                args.eta_max, args.eta_min, args.Ti, args.Tm, nbpe)
            best_acc, best_tree = engine.train_track_acc(
                tree, None, dataloaders, sizes, scheduler,
                num_epochs=args.epochs,
                seed=self._seed + TRAIN_SEED_OFFSET,
                print_loss=args.verbose)
            if args.weightsharing:
                new_states = get_cifar_states(model, best_tree, state_dict)
                state_dict.clear()
                state_dict.update(new_states)
            accs.append(float(best_acc))
        return accs


# --------------------------------------------------------------------------
# population (vmap) candidate trainer
# --------------------------------------------------------------------------
class PopulationSearchTrainer:
    """All candidates at once over cached frozen-backbone features."""

    def __init__(self, spec: PopulationSpec, extractor_module,
                 backbone_tree, input_keys, seed=0, mesh=None,
                 sequential_fallback=None, input_prep=None,
                 cache_features=False, fused_epochs=True,
                 shard_feature_bank=False, bank_batch=None,
                 int8_bank=False, program_key=None):
        self.spec = spec
        self.extractor_module = extractor_module
        self.input_keys = tuple(input_keys)
        self._seed = seed
        self.trainer = PopulationTrainer(
            spec, extractor_module.apply, backbone_tree, mesh=mesh,
            input_prep=input_prep, cache_train_features=cache_features,
            fused_epochs=fused_epochs, shard_feature_bank=shard_feature_bank,
            bank_batch=bank_batch, int8_bank=int8_bank,
            program_key=program_key)
        self.sequential_fallback = sequential_fallback

    def __call__(self, sampled_configurations, searchable_type, dataloaders,
                 args, device=None, state_dict=None):
        shared = None
        if getattr(args, "weightsharing", False):
            if getattr(args, "population_weightsharing", False):
                # fast approximate mode: inject before / extract after the
                # whole population (the reference's intra-batch sequential
                # propagation has no parallel equivalent)
                shared = state_dict if state_dict is not None else {}
            else:
                # faithful path: sequential candidate-to-candidate sharing
                if self.sequential_fallback is None:
                    raise ValueError(
                        "weightsharing requires a sequential fallback trainer")
                # ONE candidate-seed counter: crash-resume restores
                # _seed on THIS wrapper (searcher.py save/load), so the
                # fallback must consume and advance the same counter
                self.sequential_fallback._seed = self._seed
                try:
                    return self.sequential_fallback(
                        sampled_configurations, searchable_type, dataloaders,
                        args, device, state_dict=state_dict)
                finally:
                    self._seed = self.sequential_fallback._seed

        sizes = {k: dl.dataset_size for k, dl in dataloaders.items()}
        scheduler = LRCosineAnnealingScheduler(
            args.eta_max, args.eta_min, args.Ti, args.Tm,
            sizes["train"] / args.batchsize)
        if args.verbose:
            print("Now training population of {} candidates:".format(
                len(sampled_configurations)))
            for c in sampled_configurations:
                print(np.asarray(c).tolist())
        self._seed += 1
        accs, _, _ = self.trainer.train_population(
            sampled_configurations, dataloaders, sizes, scheduler,
            num_epochs=args.epochs, input_keys=self.input_keys,
            seed=self._seed, verbose=args.verbose, shared_state_dict=shared)
        return accs
