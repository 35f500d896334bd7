#!/usr/bin/env python3
"""Benchmark harness (driver contract: prints ONE JSON line).

Headline metric (BASELINE.md): MFAS search wall-clock speedup vs the
reference's sequential candidate loop, at the NTU vertical's shapes.

Measured on-device with synthetic NTU-shaped data:
  * sequential unit cost  = frozen-backbone forward + ONE candidate's
    fusion-head train step (the reference trains candidates one at a time,
    re-running the backbones per candidate —
    models/search/ntu_searchable.py:38-102);
  * population unit cost  = the same backbone forward ONCE + one vmapped
    train step for the whole K-candidate population.
  speedup = K * t_sequential / t_population  (per search-epoch batch).

Also reported: found-architecture full train-step throughput (clips/sec)
and inference throughput.
"""

import json
import time
import types

import numpy as np


def _ntu_args(**kw):
    d = dict(num_outputs=60, vid_len=(8, 32), drpt=0.5,
             inner_representation_size=16, multitask=False, alphas=False,
             batchnorm=False, num_classes=60)
    d.update(kw)
    return types.SimpleNamespace(**d)


def _time(fn, warmup=2, iters=5, inner=10):
    """Median seconds per call; each measurement chains ``inner`` calls and
    blocks once at the end, amortizing host-dispatch latency (this chip sits
    behind a network tunnel, so single-call timings are noise-dominated)."""
    import jax
    for _ in range(warmup):
        fn()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = None
        for _ in range(inner):
            out = fn()
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / inner)
    return float(np.median(times))


def main():
    import jax
    import jax.numpy as jnp

    from mfas_tpu.core.optim import adam_init
    from mfas_tpu.fusion.ntu import (NTUFeatureExtractor,
                                     Searchable_Skeleton_Image_Net, tap_sizes)
    from mfas_tpu.core.module import Ctx, Rng, merge, partition
    from mfas_tpu.engine.classifier import ClassifierEngine
    from mfas_tpu.search.population import (PopulationSpec, PopulationTrainer,
                                            encode_confs, init_population)

    B = 16             # near the reference's batchsize=20, mesh-friendly
    IMG = 256          # the reference's NTU clip resolution (vid_dim 256)
    K = 15             # reference --num_samples
    args = _ntu_args()

    rs = np.random.RandomState(0)
    rgb = jnp.asarray(rs.randn(B, args.vid_len[0], IMG, IMG, 3), jnp.float32)
    ske = jnp.asarray(rs.randn(B, 3, args.vid_len[1], 25, 2), jnp.float32)
    label = jnp.asarray(rs.randint(0, 60, B), jnp.int32)
    wmask = jnp.ones((B,), jnp.float32)

    extractor = NTUFeatureExtractor(args)
    backbone_tree = extractor.init(0)

    sizes_ske, sizes_ims = tap_sizes(args)
    spec = PopulationSpec(
        sizes_a=tuple(sizes_ske), sizes_b=tuple(sizes_ims),
        hidden=args.inner_representation_size, num_outputs=60, max_rows=4,
        batchnorm=False, drpt=args.drpt, use_alphas=False, multitask=False)
    trainer = PopulationTrainer(spec, extractor.apply, backbone_tree)

    rows = [[a, b, n] for a in range(4) for b in range(4) for n in range(2)]
    confs_K = [np.array([rows[i % 32], rows[(7 * i) % 32]]) for i in range(K)]
    conf1 = [confs_K[0]]

    def setup(confs):
        params, bn = init_population(confs, spec, seed=0)
        opt = adam_init(params)
        enc = {k: jnp.asarray(v) for k, v in encode_confs(confs, spec).items()}
        return params, bn, opt, enc

    rng = Rng(0)
    key = rng.next()

    # ---- backbone feature extraction (shared)
    def feats_step():
        return trainer._features(backbone_tree, (rgb, ske), key, train=True)

    t_backbone = _time(feats_step)
    fa, fb, lb, la = trainer._features(backbone_tree, (rgb, ske), key,
                                       train=True)

    # ---- head step, population of 1 (sequential unit) vs K
    results = {}
    for name, confs in (("seq1", conf1), ("popK", confs_K)):
        params, bn, opt, enc = setup(confs)

        def head_step(params=params, bn=bn, opt=opt, enc=enc):
            return trainer._train_step(params, bn, opt, enc, fa, fb, lb, la,
                                       label, wmask, jnp.float32(1e-3), key)

        results[name] = _time(head_step)

    t_seq_candidate = t_backbone + results["seq1"]
    t_pop = t_backbone + results["popK"]
    speedup = K * t_seq_candidate / t_pop

    # ---- found-arch full train step throughput (clips/sec/chip)
    fargs = _ntu_args(inner_representation_size=256, drpt=0.4, multitask=True)
    model = Searchable_Skeleton_Image_Net(
        fargs, np.array([[3, 1, 1], [1, 3, 0], [1, 1, 1], [3, 3, 0]]))
    tree = model.init(0)
    engine = ClassifierEngine(model, multitask=True, input_keys=("rgb", "ske"))
    trainable, frozen = partition(tree, model.param_predicate())
    opt = adam_init(trainable)
    batch = {"rgb": rgb, "ske": ske, "label": label, "_mask": wmask}

    def full_step():
        return engine._train_step(trainable, frozen, opt, batch,
                                  jnp.float32(1e-3), key)

    t_full = _time(full_step, warmup=2, iters=5)

    def infer_step():
        return engine._eval_step(trainable, frozen, batch)

    t_infer = _time(infer_step, warmup=2, iters=5)

    print(json.dumps({
        "metric": "mfas_search_speedup_vs_sequential_candidates",
        "value": round(speedup, 3),
        "unit": "x",
        "vs_baseline": round(speedup, 3),
        "detail": {
            "device": str(jax.devices()[0]),
            "batch": B, "img": IMG, "K": K,
            "t_backbone_s": round(t_backbone, 4),
            "t_head_seq1_s": round(results["seq1"], 4),
            "t_head_popK_s": round(results["popK"], 4),
            "found_train_clips_per_s": round(B / t_full, 2),
            "found_infer_clips_per_s": round(B / t_infer, 2),
        },
    }))


if __name__ == "__main__":
    main()
