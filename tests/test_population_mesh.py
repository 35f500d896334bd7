"""Population trainer under a (pop, data) mesh on the virtual 8-device CPU
mesh: same results as the unsharded run (SURVEY.md §4.5)."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from mfas_tpu.core.sched import FixedScheduler
from mfas_tpu.data.loader import ArrayLoader
from mfas_tpu.search.population import PopulationTrainer
from tests.test_avmnist_vertical import make_args, synthetic_avmnist
from tests.test_population_trainer import build


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_population_training_matches_on_mesh():
    args = make_args(drpt=0.0)
    spec, extractor, btree = build(args)
    data = synthetic_avmnist(32)
    confs = [np.array([[4, 2, 0]]), np.array([[0, 0, 1]]),
             np.array([[2, 1, 0], [4, 2, 0]]), np.array([[1, 1, 1]])]

    def run(mesh):
        loaders = {"train": ArrayLoader(data, 8, shuffle=True, seed=1),
                   "dev": ArrayLoader(data, 8)}
        sizes = {k: v.dataset_size for k, v in loaders.items()}
        trainer = PopulationTrainer(spec, extractor.apply, btree, mesh=mesh)
        accs, params, _ = trainer.train_population(
            confs, loaders, sizes, FixedScheduler(1e-3), num_epochs=2,
            input_keys=("image", "audio"), seed=0)
        return accs, jax.tree_util.tree_map(np.asarray, params)

    accs_single, params_single = run(None)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("pop", "data"))
    accs_mesh, params_mesh = run(mesh)

    assert accs_mesh == accs_single
    for k in params_single:
        np.testing.assert_allclose(params_mesh[k], params_single[k],
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_fused_bank_training_matches_on_mesh():
    """The fused-epoch scan (feature bank) under a (pop, data) mesh: the
    in-jit with_sharding_constraint path inside lax.scan must give the
    unsharded result."""
    args = make_args(drpt=0.0)
    spec, extractor, btree = build(args)
    data = synthetic_avmnist(32)
    confs = [np.array([[4, 2, 0]]), np.array([[0, 0, 1]]),
             np.array([[2, 1, 0], [4, 2, 0]]), np.array([[1, 1, 1]])]

    def run(mesh):
        loaders = {"train": ArrayLoader(data, 8, shuffle=True, seed=1),
                   "dev": ArrayLoader(data, 8)}
        sizes = {k: v.dataset_size for k, v in loaders.items()}
        trainer = PopulationTrainer(spec, extractor.apply, btree, mesh=mesh,
                                    cache_train_features=True,
                                    fused_epochs=True)
        accs, params, _ = trainer.train_population(
            confs, loaders, sizes, FixedScheduler(1e-3), num_epochs=2,
            input_keys=("image", "audio"), seed=0)
        return accs, jax.tree_util.tree_map(np.asarray, params)

    accs_single, params_single = run(None)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("pop", "data"))
    accs_mesh, params_mesh = run(mesh)

    np.testing.assert_allclose(accs_mesh, accs_single, atol=1e-6)
    for k in params_single:
        np.testing.assert_allclose(params_mesh[k], params_single[k],
                                   rtol=1e-4, atol=1e-5)
