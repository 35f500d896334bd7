#!/usr/bin/env python3
"""Device-profile a compiled step and print where the time goes.

Captures a jax.profiler trace (works through the axon tunnel), parses the
emitted ``*.trace.json.gz``, and cross-references each device event with
the optimized HLO's ``op_name``/``source_line`` metadata so XLA fusions
are attributed to the framework op that produced them (a bare trace shows
only opaque ``fusion.N`` names).

  python tools/profile_step.py --what found_train --bf16
  python tools/profile_step.py --what visual_fwd --batch 16 --img 256

Used for the TPU_DESIGN.md §5.1 kernel study.
"""

import argparse
import collections
import glob
import gzip
import json
import re
import os
import sys
import tempfile
import time
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INNER = 4  # scan length used by build()

def _enable_cache():
    from mfas_tpu.runtime.compile_cache import \
        enable_persistent_compilation_cache
    enable_persistent_compilation_cache()



def _args(**kw):
    d = dict(num_outputs=60, vid_len=(8, 32), drpt=0.4,
             inner_representation_size=256, multitask=True, alphas=False,
             batchnorm=False, num_classes=60)
    d.update(kw)
    return types.SimpleNamespace(**d)


def build(what, B, IMG, bf16):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from mfas_tpu.core.module import Ctx, Rng, partition
    from mfas_tpu.core.optim import adam_init
    from mfas_tpu.engine.classifier import ClassifierEngine
    from mfas_tpu.fusion.ntu import Searchable_Skeleton_Image_Net
    from mfas_tpu.models.ntu import Visual

    rs = np.random.RandomState(0)
    dt = jnp.bfloat16 if bf16 else jnp.float32

    if what == "visual_fwd":
        args = _args(drpt=0.0, multitask=False)
        vis = Visual(args)
        tree = vis.init(0)
        if bf16:
            tree = jax.tree_util.tree_map(
                lambda x: x.astype(dt)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)
        rgb = jnp.asarray(rs.randn(B, args.vid_len[0], IMG, IMG, 3), dt)

        @jax.jit
        def loop(tree, x, eps):
            def body(acc, _):
                out = vis.apply(tree, Ctx(train=False),
                                x + acc.astype(x.dtype) * eps)
                return jnp.sum(out[-1].astype(jnp.float32)), None

            acc, _ = lax.scan(body, jnp.float32(0), None, length=INNER)
            return acc

        return loop, (tree, rgb, dt(0)), "loop"

    assert what == "found_train"
    args = _args()
    model = Searchable_Skeleton_Image_Net(
        args, np.array([[3, 1, 1], [1, 3, 0], [1, 1, 1], [3, 3, 0]]))
    tree = model.init(0)
    engine = ClassifierEngine(model, multitask=True,
                              input_keys=("rgb", "ske"),
                              compute_dtype="bfloat16" if bf16 else None)
    trainable, frozen = partition(tree, model.param_predicate())
    opt = adam_init(trainable)
    batch = {"rgb": jnp.asarray(rs.randn(B, args.vid_len[0], IMG, IMG, 3),
                                jnp.float32),
             "ske": jnp.asarray(rs.randn(B, 3, 32, 25, 2), jnp.float32),
             "label": jnp.asarray(rs.randint(0, 60, B), jnp.int32),
             "_mask": jnp.ones((B,), jnp.float32)}
    key = Rng(0).next()

    @jax.jit
    def loop(trainable, frozen, opt):
        def body(carry, _):
            trainable, frozen, opt = carry
            trainable, frozen, opt, loss, corr = engine._train_step_impl(
                trainable, frozen, opt, batch, jnp.float32(1e-3), key)
            return (trainable, frozen, opt), loss

        carry, losses = lax.scan(body, (trainable, frozen, opt), None,
                                 length=INNER)
        return jnp.sum(losses)

    return loop, (trainable, frozen, opt), "loop"


def profile(loop, args):
    import jax

    lowered = loop.lower(*args)
    compiled = lowered.compile()
    try:
        hlo = compiled.as_text()
    except Exception:
        hlo = ""

    out = compiled(*args)
    float(np.asarray(out))                     # warm + fence
    tmp = tempfile.mkdtemp(prefix="mfas_prof_")
    t0 = time.perf_counter()
    with jax.profiler.trace(tmp):
        float(np.asarray(compiled(*args)))
    wall = time.perf_counter() - t0

    kind = {}
    for m in re.finditer(
            r'%([\w.\-]+) = [^\n]*?op_name="[^"]*?/([\w_\-\(\)]+)"'
            r'[^\n]*?source_file="([^"]+)" source_line=(\d+)', hlo):
        kind[m.group(1)] = (m.group(2),
                            m.group(3).split("/")[-1] + ":" + m.group(4))

    paths = sorted(glob.glob(tmp + "/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        print("no trace produced (profiler unsupported on this backend?)")
        return
    tr = json.load(gzip.open(paths[-1]))
    pids = {e["pid"]: e["args"].get("name", "")
            for e in tr["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    agg = collections.Counter()
    top = collections.Counter()
    total = 0
    for e in tr["traceEvents"]:
        if (e.get("ph") == "X" and "dur" in e
                and pids.get(e["pid"], "").startswith("/device")
                and e["name"] != "while" and not e["name"].startswith("jit_")):
            k, s = kind.get(e["name"],
                            ("UNATTRIBUTED:" + e["name"].split(".")[0], "?"))
            agg[(k, s)] += e["dur"]
            top[e["name"]] += e["dur"]
            total += e["dur"]

    iters = INNER          # the lax.scan length baked into build()
    print(f"wall {wall*1e3/iters:.2f} ms/iter, device busy "
          f"{total/1e3/iters:.2f} ms/iter (dispatch/tunnel overhead = diff)")
    print("\nby framework op (ms/iter):")
    for (k, s), v in agg.most_common(15):
        print(f"{v/1e3/iters:8.3f}  {v/total*100:5.1f}%  {k:28s} {s}")
    print("\ntop HLO instructions (ms/iter):")
    for n, v in top.most_common(10):
        print(f"{v/1e3/iters:8.3f}  {n}")


def main():
    _enable_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--what", choices=("found_train", "visual_fwd"),
                   default="found_train")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--img", type=int, default=256)
    p.add_argument("--bf16", action="store_true", default=False)
    a = p.parse_args()
    loop, args, name = build(a.what, a.batch, a.img, a.bf16)
    profile(loop, args)


if __name__ == "__main__":
    main()
