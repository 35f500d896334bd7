"""Crash-resumable search (SURVEY.md §5.3): a search interrupted after any
step resumes from its persisted state and produces the same final dataset
as an uninterrupted run (RNG, temperature, surrogate dataset, sampled top-K
all restored)."""

import os
import shutil
import types

import numpy as np

from mfas_tpu.search.searcher import ModelSearcher
from tests.test_epnas_ranking_parity import (_NullSurrogate, get_layer_confs,
                                             scripted_acc)


def make_args(state_path, resume=False):
    return types.SimpleNamespace(
        search_iterations=1, max_progression_levels=3, num_samples=3,
        initial_temperature=10.0, final_temperature=0.2, temperature_decay=4.0,
        epochs_surrogate=2, lr_surrogate=1e-3, verbose=False,
        search_state=state_path, resume_search=resume)


def train_fn(confs, model_type, dataloaders, a, device, state_dict=None):
    return [scripted_acc(c) for c in confs]


class Searcher(ModelSearcher):
    def __init__(self, args):
        super().__init__(args)
        self.saved_steps = []

    def _save_state(self, path, *a, **k):
        super()._save_state(path, *a, **k)
        if path:
            copy = f"{path}.step{len(self.saved_steps)}"
            shutil.copy(path, copy)
            self.saved_steps.append(copy)

    def search(self):
        return self._epnas(
            None, {"model": _NullSurrogate()}, None,
            {"train_sampled_fun": train_fn,
             "get_layer_confs": get_layer_confs})


def _as_pairs(s_data):
    confs, accs = s_data.get_data()
    out = set()
    for group, acc in zip(confs, accs):
        for i in range(group.shape[1]):
            out.add((group[:, i, :].tobytes(), float(acc[i, 0])))
    return out


def test_resume_reproduces_uninterrupted_run(tmp_path):
    full_path = str(tmp_path / "full.pkl")
    np.random.seed(42)
    full = Searcher(make_args(full_path))
    full_data = full.search()
    assert len(full.saved_steps) == 3

    # simulate a crash right after step 0: the state saved then becomes the
    # resume point for a fresh process
    resume_path = str(tmp_path / "resume.pkl")
    shutil.copy(full.saved_steps[0], resume_path)

    np.random.seed(7)  # a different, "fresh process" RNG — must not matter
    resumed = Searcher(make_args(resume_path, resume=True))
    resumed_data = resumed.search()

    assert _as_pairs(resumed_data) == _as_pairs(full_data)


def test_resume_replays_loader_shuffle_stream(tmp_path):
    """The dataloaders' shuffle RNG advances once per training call; a
    resumed run rebuilds the loaders at their construction seed, so the
    saved state must carry the RNG position — otherwise every step after
    the resume point sees epoch-0 batch orders and the trajectory
    silently diverges from the uncrashed run."""
    from mfas_tpu.data.loader import ArrayLoader

    def make_loaders():
        data = {"x": np.arange(32, dtype=np.float32)[:, None],
                "label": np.arange(32, dtype=np.int64)}
        return {"train": ArrayLoader(data, 8, shuffle=True, seed=7)}

    def order_sensitive_train_fn(confs, model_type, dataloaders, a, device,
                                 state_dict=None):
        # one epoch per call, like a real trainer: the accuracy of every
        # conf depends on the batch order the loader's RNG produced NOW
        first = [int(b["label"][0]) for b in dataloaders["train"]]
        bias = sum((i + 1) * v for i, v in enumerate(first)) % 97 / 97.0
        return [0.5 * scripted_acc(c) + 0.5 * bias for c in confs]

    class LoaderSearcher(Searcher):
        def __init__(self, args, loaders):
            super().__init__(args)
            self._loaders = loaders

        def search(self):
            return self._epnas(
                None, {"model": _NullSurrogate()}, self._loaders,
                {"train_sampled_fun": order_sensitive_train_fn,
                 "get_layer_confs": get_layer_confs})

    full_path = str(tmp_path / "full.pkl")
    np.random.seed(42)
    full = LoaderSearcher(make_args(full_path), make_loaders())
    full_data = full.search()

    resume_path = str(tmp_path / "resume.pkl")
    shutil.copy(full.saved_steps[0], resume_path)
    np.random.seed(7)
    # fresh process: loaders rebuilt at their construction seed — the
    # restored RNG position must land them where the crash left off
    resumed = LoaderSearcher(make_args(resume_path, resume=True),
                             make_loaders())
    resumed_data = resumed.search()
    assert _as_pairs(resumed_data) == _as_pairs(full_data)


def test_resume_flag_off_restarts(tmp_path):
    path = str(tmp_path / "s.pkl")
    np.random.seed(0)
    s1 = Searcher(make_args(path))
    s1.search()
    # without resume_search the state file is ignored and overwritten
    np.random.seed(0)
    s2 = Searcher(make_args(path, resume=False))
    d2 = s2.search()
    assert len(_as_pairs(d2)) > 0


def test_resume_restores_shared_weights_and_trainer_seed(tmp_path):
    """The weight-sharing store and the candidate-init seed counter are part
    of the resumable state — without them a resumed --weightsharing search
    retrains candidates from scratch with different inits."""
    state_path = str(tmp_path / "s.pkl")

    class SeededTrainer:
        def __init__(self):
            self._seed = 0
            self.stores = []

        def __call__(self, confs, model_type, dataloaders, a, device,
                     state_dict=None):
            accs = []
            for c in confs:
                self._seed += 1
                state_dict[f"k{self._seed}"] = np.asarray(c).copy()
                accs.append(scripted_acc(c))
            self.stores.append(dict(state_dict))
            return accs

    def run(resume, trainer):
        np.random.seed(0)
        args = make_args(state_path, resume=resume)
        s = Searcher(args)
        s.train_fn = trainer
        methods = {"train_sampled_fun": trainer,
                   "get_layer_confs": get_layer_confs}
        return s._epnas(None, {"model": _NullSurrogate(), "criterion": None},
                        {}, methods)

    t_full = SeededTrainer()
    full = _as_pairs(run(False, t_full))

    # crash after step 1 of 3: resume from the step-1 snapshot
    shutil.copy(state_path + ".step1", state_path)
    t_res = SeededTrainer()          # fresh trainer: seed counter restarts
    resumed = _as_pairs(run(True, t_res))
    assert resumed == full
    # the seed counter continued from the restored value, so the resumed
    # trainer's NEW store keys pick up where the full run's left off
    assert t_res._seed == t_full._seed
    final_full = t_full.stores[-1]
    final_res = t_res.stores[-1]
    assert set(final_res) == set(final_full)


def test_randsearch_resumes_identically(tmp_path):
    """--randsearch + --search_state/--resume_search: same contract as
    _epnas (previously silent no-ops in randsearch mode)."""
    state = str(tmp_path / "rs.pkl")

    class RS(Searcher):
        def run(self):
            methods = {"train_sampled_fun": train_fn,
                       "get_layer_confs": get_layer_confs}
            return self._randsearch(None, None, methods)

    import random as py_random

    np.random.seed(0); py_random.seed(0)
    full = RS(make_args(state)).run()
    full_data = full.state()

    # interrupted after step 1, then resumed from that snapshot
    np.random.seed(0); py_random.seed(0)
    s2 = RS(make_args(state))
    s2.run()
    shutil.copy(s2.saved_steps[1], state)
    resumed = RS(make_args(state, resume=True)).run()
    assert resumed.state() == full_data


def test_population_bank_rebuild_replays_exactly(tmp_path):
    """Crash-resume with --cache_features: a FRESH trainer that rebuilds
    the feature bank must reproduce a warm trainer's later call exactly —
    extraction must not consume the per-call dropout stream (the old
    per-batch draws shifted every post-rebuild dropout key)."""
    from mfas_tpu.core.sched import LRCosineAnnealingScheduler
    from mfas_tpu.data.loader import ArrayLoader
    from mfas_tpu.search.population import PopulationTrainer
    from tests.test_avmnist_vertical import make_args as av_args, \
        synthetic_avmnist
    from tests.test_population_trainer import build

    args = av_args(drpt=0.5)          # dropout ON: keys must line up
    spec, extractor, btree = build(args)
    data = synthetic_avmnist(16)

    def loaders():
        return {"train": ArrayLoader(data, 8), "dev": ArrayLoader(data, 8)}

    confs = [np.array([[1, 0, 0]]), np.array([[3, 1, 1]])]

    def run(trainer, seed):
        sched = LRCosineAnnealingScheduler(1e-3, 1e-6, 1, 2, 2)
        accs, _, _ = trainer.train_population(
            confs, loaders(), {"train": 16, "dev": 16}, sched,
            num_epochs=1, input_keys=("image", "audio"), seed=seed)
        return accs

    warm = PopulationTrainer(spec, extractor.apply, btree,
                             cache_train_features=True)
    run(warm, seed=1)                  # call 1 builds the bank
    want = run(warm, seed=2)           # call 2: bank cached, no rebuild

    fresh = PopulationTrainer(spec, extractor.apply, btree,
                              cache_train_features=True)
    got = run(fresh, seed=2)           # resumed process: bank rebuilt
    assert got == want
