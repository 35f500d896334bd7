"""Serving export: a found model's eval forward as one serialized,
self-contained StableHLO artifact (`jax.export`).

The artifact bakes the trained weights in as constants, so the consumer
needs neither this package nor the checkpoint — just jax on the serving
host (any backend: the portable StableHLO is compiled there):

    exp = load_exported("model.stablehlo")
    logits = exp.call(rgb, ske)

The reference has no deployment story beyond pickled torch checkpoints;
this is the TPU-native equivalent of a TorchScript/ONNX export.
"""

from __future__ import annotations


def export_eval_fn(apply_fn, example_inputs,
                   platforms=("cpu", "tpu", "cuda")):
    """Serialize ``apply_fn(*example_inputs)`` (weights already closed
    over) to bytes. ``example_inputs`` fixes shapes/dtypes; pass
    jax.ShapeDtypeStruct leaves to avoid materializing real data.

    platforms: jax.export refuses to run an artifact on a platform it was
    not lowered for — the default lowers for all three so the artifact is
    genuinely portable (the exporting host needs none of them present)."""
    import jax
    from jax import export as jexport

    args = tuple(
        x if isinstance(x, jax.ShapeDtypeStruct)
        else jax.ShapeDtypeStruct(x.shape, x.dtype)
        for x in example_inputs)
    exp = jexport.export(jax.jit(apply_fn),
                         platforms=tuple(platforms))(*args)
    return exp.serialize()


def save_exported(path, apply_fn, example_inputs,
                  platforms=("cpu", "tpu", "cuda")):
    data = export_eval_fn(apply_fn, example_inputs, platforms=platforms)
    with open(path, "wb") as f:
        f.write(data)
    return len(data)


def load_exported(path):
    """-> jax.export.Exported; run with ``.call(*inputs)``."""
    from jax import export as jexport

    with open(path, "rb") as f:
        return jexport.deserialize(f.read())
