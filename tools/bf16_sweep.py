#!/usr/bin/env python3
"""One-off bf16 performance sweep for the found-arch NTU train step
(VERDICT r1 item 5: 142 clips/s ~ 17% MFU, find the headroom).

Variants (one remote compile each):
  f32/B16 baseline, bf16/B16, bf16/B16 channels-last, bf16/B32,
  bf16/B32 channels-last.

Run alone on the TPU box (single tunnel holder):
  python tools/bf16_sweep.py
Each measured region is a lax.scan of dependent train steps fenced by a
host scalar fetch (block_until_ready lies on this backend).
"""

import json
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def _enable_cache():
    from mfas_tpu.runtime.compile_cache import \
        enable_persistent_compilation_cache
    enable_persistent_compilation_cache()


INNER = 4


def _timeit(fn, warmup=1, iters=3):
    for _ in range(warmup):
        float(np.asarray(fn()))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(np.asarray(fn()))
        times.append((time.perf_counter() - t0) / INNER)
    return float(np.median(times))


def build_step(B, IMG, compute_dtype, channels_last, conv3d_as_2d=False,
               pool_separable=False):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from mfas_tpu.core import functional as F
    from mfas_tpu.core.module import Rng, partition
    from mfas_tpu.core.optim import adam_init
    from mfas_tpu.engine.classifier import ClassifierEngine
    from mfas_tpu.fusion.ntu import Searchable_Skeleton_Image_Net

    F.set_conv_channels_last(channels_last)
    F.set_conv3d_as_2d(conv3d_as_2d)
    F.set_pool_separable(pool_separable)
    try:
        args = types.SimpleNamespace(
            num_outputs=60, vid_len=(8, 32), drpt=0.4,
            inner_representation_size=256, multitask=True, alphas=False,
            batchnorm=False, num_classes=60)
        model = Searchable_Skeleton_Image_Net(
            args, np.array([[3, 1, 1], [1, 3, 0], [1, 1, 1], [3, 3, 0]]))
        tree = model.init(0)
        engine = ClassifierEngine(model, multitask=True,
                                  input_keys=("rgb", "ske"),
                                  compute_dtype=compute_dtype)
        trainable, frozen = partition(tree, model.param_predicate())
        opt = adam_init(trainable)
        rs = np.random.RandomState(0)
        batch = {
            "rgb": jnp.asarray(rs.randn(B, 8, IMG, IMG, 3), jnp.float32),
            "ske": jnp.asarray(rs.randn(B, 3, 32, 25, 2), jnp.float32),
            "label": jnp.asarray(rs.randint(0, 60, B), jnp.int32),
            "_mask": jnp.ones((B,), jnp.float32)}
        key = Rng(0).next()

        # batch is a jit ARGUMENT, not a closure capture: captured arrays
        # embed as HLO constants, and at B64 the 400 MB clip constant
        # overflows the remote-compile request body (HTTP 413)
        @jax.jit
        def loop(trainable, frozen, opt, batch):
            def body(carry, _):
                trainable, frozen, opt = carry
                trainable, frozen, opt, loss, corr = engine._train_step_impl(
                    trainable, frozen, opt, batch, jnp.float32(1e-3), key)
                return (trainable, frozen, opt), loss

            carry, losses = lax.scan(body, (trainable, frozen, opt), None,
                                     length=INNER)
            return jnp.sum(losses)

        # trace + compile NOW, while the layout flags are held — a caller
        # invoking the closure later (flags already reset) must not
        # silently trace the default kernels
        loop_c = loop.lower(trainable, frozen, opt, batch).compile()
        return lambda: loop_c(trainable, frozen, opt, batch)
    finally:
        F.set_conv_channels_last(False)
        F.set_conv3d_as_2d(False)
        F.set_pool_separable(False)


def main():
    _enable_cache()
    variants = [
        ("f32_B16", 16, None, False, False, False),
        ("bf16_B16", 16, "bfloat16", False, False, False),
        ("bf16_B16_chlast", 16, "bfloat16", True, False, False),
        ("bf16_B32", 32, "bfloat16", False, False, False),
        ("bf16_B32_chlast", 32, "bfloat16", True, False, False),
        ("bf16_B16_3das2d", 16, "bfloat16", False, True, False),
        ("f32_B16_3das2d", 16, None, False, True, False),
        ("bf16_B16_3das2d_chlast", 16, "bfloat16", True, True, False),
        # stem-pool experiments (VERDICT r2 item 7): separable 1-D pool
        ("bf16_B16_seppool", 16, "bfloat16", False, False, True),
        ("bf16_B32_seppool", 32, "bfloat16", False, False, True),
        ("f32_B16_seppool", 16, None, False, False, True),
        ("bf16_B64", 64, "bfloat16", False, False, False),
    ]
    only = set(sys.argv[1:])
    results = {}
    for name, B, dt, cl, as2d, psep in variants:
        if only and name not in only:
            continue
        # build_step traces AND compiles under the requested layout flags,
        # so the returned closure is safe to call with flags reset
        fn = build_step(B, 256, dt, cl, as2d, psep)
        t = _timeit(fn)
        results[name] = {"step_s": round(t, 4),
                         "clips_per_s": round(B / t, 1)}
        print(name, results[name], flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
