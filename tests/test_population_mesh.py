"""Population trainer under a (pop, data) mesh on the virtual 8-device CPU
mesh: same results as the unsharded run (SURVEY.md §4.5)."""

import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from mfas_tpu.core.sched import FixedScheduler
from mfas_tpu.data.loader import ArrayLoader
from mfas_tpu.search.population import PopulationSpec, PopulationTrainer
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


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("int8", [False, True], ids=["bf16", "int8"])
def test_sharded_feature_bank_matches_replicated(int8):
    """--shard_feature_bank: bank feature rows sharded over the data axis
    (each chip holds n/data rows — banks bigger than one chip's HBM) give
    the identical training trajectory as the replicated bank; labels stay
    replicated so the true sample count survives the padding. With
    --int8_feature_bank the per-row scale arrays shard alongside the
    values (quantization happens before placement, so sharded == replicated
    stays exact)."""
    from mfas_tpu.core.sched import FixedScheduler

    args = make_args(drpt=0.0)
    spec, extractor, btree = build(args)
    data = synthetic_avmnist(21)        # 21 rows: pads to 24 over data=4
    confs = [np.array([[4, 2, 0]]), np.array([[0, 0, 1]]),
             np.array([[2, 1, 0], [4, 2, 0]]), np.array([[1, 1, 1]])]
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("pop", "data"))

    def run(shard):
        loaders = {"train": ArrayLoader(data, 8, shuffle=True, seed=1),
                   "dev": ArrayLoader(data, 8)}
        sizes = {k: v.dataset_size for k, v in loaders.items()}
        trainer = PopulationTrainer(spec, extractor.apply, btree, mesh=mesh,
                                    cache_train_features=True,
                                    fused_epochs=True, int8_bank=int8,
                                    shard_feature_bank=shard)
        accs, params, _ = trainer.train_population(
            confs, loaders, sizes, FixedScheduler(1e-3), num_epochs=2,
            input_keys=("image", "audio"), seed=0)
        return accs, jax.tree_util.tree_map(np.asarray, params), trainer

    accs_r, params_r, _ = run(False)
    accs_s, params_s, tr = run(True)

    np.testing.assert_allclose(accs_s, accs_r, atol=1e-6)
    for k in params_r:
        np.testing.assert_allclose(params_s[k], params_r[k],
                                   rtol=1e-4, atol=1e-5)

    bank = tr._train_bank
    assert int(bank["label"].shape[0]) == 21    # true n: index plans key off it
    assert int(bank["fa"].shape[0]) == 24       # padded to divide data=4
    # every chip holds exactly 1/data of the feature rows (replicated over pop)
    assert {s.data.shape[0] for s in bank["fa"].addressable_shards} == {6}
    # labels replicated: full copy everywhere
    assert {s.data.shape[0] for s in bank["label"].addressable_shards} == {21}
    if int8:
        assert bank["fa"].dtype == jnp.int8
        # scale rows shard exactly like their values
        assert {s.data.shape[0]
                for s in bank["fa_scale"].addressable_shards} == {6}


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_real_ntu_extractor_population_training_matches_on_mesh():
    """The REAL NTU extractor — inflated ResNet3D (exact architecture,
    shrunken to 1 block/stage @ base_width 16 via the resnet3d_* knobs) +
    the full HCN skeleton net — batch-sharded over ``data`` and feeding
    the population step over ``pop``: numerically equal to the unsharded
    run. This is the flagship backbone under a mesh (VERDICT r2 item 5;
    reference's only multi-device path, main_found_ntu.py:113-114), not an
    AVMNIST stand-in."""
    from mfas_tpu.fusion import ntu as f_ntu

    args = types.SimpleNamespace(
        num_outputs=6, num_classes=6, vid_len=(2, 32), drpt=0.0,
        inner_representation_size=16, multitask=False, alphas=False,
        batchnorm=False, resnet3d_layers=(1, 1, 1, 1),
        resnet3d_base_width=16)
    extractor = f_ntu.NTUFeatureExtractor(args)
    btree = extractor.init(0)
    sizes_ske, sizes_ims = f_ntu.tap_sizes(args)
    spec = PopulationSpec(
        sizes_a=tuple(sizes_ske), sizes_b=tuple(sizes_ims),
        hidden=args.inner_representation_size, num_outputs=args.num_outputs,
        max_rows=4, batchnorm=False, drpt=0.0, use_alphas=False,
        multitask=False)

    rs = np.random.RandomState(0)
    n = 16
    data = {
        "rgb": rs.randn(n, args.vid_len[0], 32, 32, 3).astype(np.float32),
        "ske": rs.randn(n, 3, args.vid_len[1], 25, 2).astype(np.float32),
        "label": rs.randint(0, args.num_outputs, n).astype(np.int32),
    }
    confs = [np.array([[3, 1, 1]]), np.array([[1, 3, 0], [2, 2, 1]]),
             np.array([[0, 0, 0]]), np.array([[3, 3, 0]])]

    def run(mesh):
        loaders = {"train": ArrayLoader(data, 8, shuffle=True, seed=1),
                   "dev": ArrayLoader(data, 8)}
        sizes = {k: v.dataset_size for k, v in loaders.items()}
        trainer = PopulationTrainer(spec, extractor.apply, btree, mesh=mesh)
        accs, params, _ = trainer.train_population(
            confs, loaders, sizes, FixedScheduler(1e-3), num_epochs=1,
            input_keys=("rgb", "ske"), seed=0)
        return accs, jax.tree_util.tree_map(np.asarray, params)

    accs_single, params_single = run(None)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("pop", "data"))
    accs_mesh, params_mesh = run(mesh)

    # dev accuracies are correct-counts: must agree exactly; params carry
    # conv/BN reduction-order noise through the extractor
    assert accs_mesh == accs_single
    for k in params_single:
        np.testing.assert_allclose(params_mesh[k], params_single[k],
                                   rtol=1e-3, atol=1e-4)
