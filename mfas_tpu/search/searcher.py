"""SMBO/EPNAS search orchestration (reference models/searchable.py:41-174).

Control flow preserved exactly — including the reference's temperature
iteration index ``si * search_iterations + progression_index``
(models/searchable.py:132; SURVEY §2 notes search_iterations is used where
max_progression_levels was presumably intended — kept for ranking parity).

Additive over the reference: the search state (surrogate dataset, numpy RNG
state, temperature, progress counters) can be persisted after every step so
a crashed search resumes (SURVEY §5.3 — the reference loses everything).
"""

from __future__ import annotations

import json
import os
import pickle
import random

import numpy as np

import mfas_tpu.search.tools as tools
from mfas_tpu.search.surrogate import SimpleRecurrentSurrogate, SurrogateDataloader


def _primary_process():
    from mfas_tpu.parallel.mesh import is_primary_process
    return is_primary_process()


class ModelSearcher:
    def __init__(self, args, jsonl_log=None):
        self.args = args
        self._jsonl = jsonl_log

    def search(self):
        raise NotImplementedError

    # ----- telemetry (additive, SURVEY §5.5)
    def _log_event(self, **event):
        if self._jsonl and _primary_process():
            with open(self._jsonl, "a") as f:
                f.write(json.dumps(event, default=_np_default) + "\n")

    # ----- checkpointing (additive, SURVEY §5.3)
    def _save_state(self, path, s_data, temperature, si, progression_index,
                    sampled_k_confs, surrogate, shared_weights=None,
                    trainer=None, dataloaders=None):
        # multi-host: search state is identical on every process (same
        # seeded trajectory) — one writer, no interleaved corruption
        if not path or not _primary_process():
            return
        state = {
            "surrogate_data": s_data.state(),
            "np_random_state": np.random.get_state(),
            # randsearch's depth draws come from the stdlib random module
            # (reference tools.py:107 parity) — replay needs BOTH streams
            "py_random_state": random.getstate(),
            "temperature": temperature,
            "si": si,
            "progression_index": progression_index,
            "sampled_k_confs": [np.asarray(c) for c in sampled_k_confs],
            "surrogate_params": _tree_to_numpy(
                getattr(surrogate, "params", None)),
            # a resumed run must replay the uncrashed trajectory exactly:
            # the weight-sharing store, the surrogate's Adam moments, the
            # candidate-init seed counter, AND the dataloaders' shuffle/
            # transform-seed RNG position (each completed epoch advanced
            # it) are all part of that state. shared_weights leaves go
            # through numpy: pickling live jax.Arrays both blocks on a
            # D2H fetch per leaf per save and breaks outright for any
            # non-fully-replicated sharding.
            "shared_weights": _tree_to_numpy(shared_weights),
            "surrogate_opt_state": _tree_to_numpy(
                getattr(surrogate, "opt_state", None)),
            "trainer_seed": getattr(trainer, "_seed", None),
            "loader_rng_states": (
                {name: ld.rng_state() for name, ld in dataloaders.items()
                 if hasattr(ld, "rng_state")} if dataloaders else None),
        }
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(state, f)
        os.replace(tmp, path)

    @staticmethod
    def load_state(path):
        with open(path, "rb") as f:
            return pickle.load(f)

    @staticmethod
    def _restore_loader_rng(st, dataloaders):
        if not dataloaders:
            return
        for name, s in (st.get("loader_rng_states") or {}).items():
            ld = dataloaders.get(name)
            if ld is not None and hasattr(ld, "set_rng_state"):
                ld.set_rng_state(s)

    @staticmethod
    def _check_multihost_resume_agreement(resume_after):
        from mfas_tpu.parallel.mesh import require_resume_agreement
        require_resume_agreement(resume_after)

    def _epnas(self, model_type, surrogate_dict, dataloaders,
               dataset_searchmethods, device=None):
        surrogate: SimpleRecurrentSurrogate = surrogate_dict["model"]
        s_data = SurrogateDataloader()

        train_sampled_models = dataset_searchmethods["train_sampled_fun"]
        get_possible_layer_configurations = dataset_searchmethods["get_layer_confs"]

        temperature = self.args.initial_temperature
        sampled_k_confs = []
        shared_weights = {}
        state_path = getattr(self.args, "search_state", None)

        # crash resume (additive): restore the sampler RNG, surrogate
        # dataset/params, temperature and progress, then skip completed steps
        resume_after = (-1, -1)
        if (getattr(self.args, "resume_search", False) and state_path
                and os.path.exists(state_path)):
            st = self.load_state(state_path)
            s_data = SurrogateDataloader.from_state(st["surrogate_data"])
            np.random.set_state(st["np_random_state"])
            if st.get("py_random_state") is not None:
                random.setstate(st["py_random_state"])
            temperature = st["temperature"]
            sampled_k_confs = [np.asarray(c) for c in st["sampled_k_confs"]]
            if st.get("surrogate_params") is not None:
                surrogate.params = _tree_from_numpy(st["surrogate_params"])
            if st.get("surrogate_opt_state") is not None:
                surrogate.opt_state = _tree_from_numpy(
                    st["surrogate_opt_state"])
            if st.get("shared_weights") is not None:
                shared_weights = st["shared_weights"]
            if (st.get("trainer_seed") is not None
                    and hasattr(train_sampled_models, "_seed")):
                train_sampled_models._seed = st["trainer_seed"]
            self._restore_loader_rng(st, dataloaders)
            resume_after = (st["si"], st["progression_index"])
            if self.args.verbose:
                print("Resuming search after iteration {} step {}".format(
                    *resume_after))
        if getattr(self.args, "resume_search", False):
            self._check_multihost_resume_agreement(resume_after)

        for si in range(self.args.search_iterations):
            if self.args.verbose:
                print(50 * "=")
                print("Search iteration {}/{} ".format(si, self.args.search_iterations))

            for progression_index in range(self.args.max_progression_levels):
                if (si, progression_index) <= resume_after:
                    continue  # already completed before the crash
                if self.args.verbose:
                    print(25 * "-")
                    print("Progressive step {}/{} ".format(
                        progression_index, self.args.max_progression_levels))

                # 1. unfold this fusion level
                list_possible_layer_confs = get_possible_layer_configurations(
                    progression_index)

                # 2. merge previous top-K with the unfolded rows
                all_configurations = tools.merge_unfolded_with_sampled(
                    sampled_k_confs, list_possible_layer_confs, progression_index)

                # 3. score: train for real on the very first step, else
                #    predict with the surrogate
                first_step = (si + progression_index == 0)
                if first_step:
                    all_accuracies = train_sampled_models(
                        all_configurations, model_type, dataloaders, self.args,
                        device, state_dict=shared_weights)
                    tools.update_surrogate_dataloader(
                        s_data, all_configurations, all_accuracies)
                    err = tools.train_surrogate(surrogate, s_data, self.args)
                    if self.args.verbose:
                        print("Trained architectures: ")
                        print(list(zip(all_configurations, all_accuracies)))
                else:
                    all_accuracies = tools.predict_accuracies_with_surrogate(
                        all_configurations, surrogate)
                    if self.args.verbose:
                        print("Predicted accuracies: ")
                        print(list(zip(all_configurations, all_accuracies)))

                # 4. temperature-sample K; train them for real when scored by
                #    the surrogate, then refresh the surrogate
                sampled_k_confs = tools.sample_k_configurations(
                    all_configurations, all_accuracies,
                    self.args.num_samples, temperature)
                if first_step:
                    if self.args.verbose:
                        estimated = tools.predict_accuracies_with_surrogate(
                            all_configurations, surrogate)
                        diff = np.abs(np.array(estimated) - np.array(all_accuracies))
                        print("Error on accuracies = {}".format(diff))
                else:
                    sampled_k_accs = train_sampled_models(
                        sampled_k_confs, model_type, dataloaders, self.args,
                        device, state_dict=shared_weights)
                    tools.update_surrogate_dataloader(
                        s_data, sampled_k_confs, sampled_k_accs)
                    err = tools.train_surrogate(surrogate, s_data, self.args)
                    if self.args.verbose:
                        print("Trained architectures: ")
                        print(list(zip(sampled_k_confs, sampled_k_accs)))
                        print("with surrogate error: {}".format(err))

                # 5. temperature decay — reference's exact iteration index
                #    (models/searchable.py:132)
                iteration = si * self.args.search_iterations + progression_index
                temperature = tools.compute_temperature(iteration, self.args)
                if self.args.verbose:
                    print("Temperature is being set to {}".format(temperature))

                self._log_event(
                    kind="epnas_step", si=si, progression=progression_index,
                    temperature=float(temperature),
                    n_scored=len(all_configurations),
                    surrogate_size=len(s_data))
                self._save_state(state_path, s_data, temperature, si,
                                 progression_index, sampled_k_confs, surrogate,
                                 shared_weights=shared_weights,
                                 trainer=train_sampled_models,
                                 dataloaders=dataloaders)

        return s_data

    def _randsearch(self, model_type, dataloaders, dataset_searchmethods,
                    device=None):
        """Uniform random baseline (reference models/searchable.py:139-174)."""
        s_data = SurrogateDataloader()
        train_sampled_models = dataset_searchmethods["train_sampled_fun"]
        get_possible_layer_configurations = dataset_searchmethods["get_layer_confs"]
        shared_weights = {}
        state_path = getattr(self.args, "search_state", None)

        # crash resume: same contract as _epnas (the --search_state /
        # --resume_search flags work in both modes)
        resume_after = -1
        if (getattr(self.args, "resume_search", False) and state_path
                and os.path.exists(state_path)):
            st = self.load_state(state_path)
            s_data = SurrogateDataloader.from_state(st["surrogate_data"])
            np.random.set_state(st["np_random_state"])
            if st.get("py_random_state") is not None:
                random.setstate(st["py_random_state"])
            resume_after = st["si"]
            if st.get("shared_weights") is not None:
                shared_weights = st["shared_weights"]
            if (st.get("trainer_seed") is not None
                    and hasattr(train_sampled_models, "_seed")):
                train_sampled_models._seed = st["trainer_seed"]
            self._restore_loader_rng(st, dataloaders)
            if self.args.verbose:
                print(f"Resuming random search after iteration "
                      f"{resume_after}")
        if getattr(self.args, "resume_search", False):
            self._check_multihost_resume_agreement((resume_after,))

        total = self.args.search_iterations * self.args.max_progression_levels
        for si in range(total):
            if si <= resume_after:
                continue
            if self.args.verbose:
                print(50 * "=")
                print("Random Search iteration {}/{} ".format(si, total))

            sampled_k_confs = tools.sample_k_configurations_directly(
                self.args.num_samples, self.args.max_progression_levels,
                get_possible_layer_configurations,
                legacy_bug=getattr(self.args, "legacy_randsearch_bug", False))
            sampled_k_accs = train_sampled_models(
                sampled_k_confs, model_type, dataloaders, self.args, device,
                state_dict=shared_weights)
            tools.update_surrogate_dataloader(s_data, sampled_k_confs,
                                              sampled_k_accs)
            if self.args.verbose:
                print("Trained architectures: ")
                print(list(zip(sampled_k_confs, sampled_k_accs)))
            self._log_event(kind="randsearch_step", si=si,
                            surrogate_size=len(s_data))
            self._save_state(state_path, s_data, 0.0, si, -1, sampled_k_confs,
                             surrogate=None, shared_weights=shared_weights,
                             trainer=train_sampled_models,
                             dataloaders=dataloaders)
        return s_data


def _np_default(o):
    if isinstance(o, np.ndarray):
        return o.tolist()
    if isinstance(o, (np.integer, np.floating)):
        return o.item()
    raise TypeError(type(o))


def _tree_to_numpy(tree):
    if tree is None:
        return None
    import jax
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _tree_from_numpy(tree):
    import jax
    import jax.numpy as jnp
    return jax.tree_util.tree_map(jnp.asarray, tree)
