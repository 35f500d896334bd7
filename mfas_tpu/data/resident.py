"""HBM-resident packed-NTU dataset: upload once, batch by device gather.

The streaming path ships every clip over the host->device link every epoch
— on a bandwidth-starved link (e.g. a remote-tunneled chip, measured
0.074 GB/s) that transfer, not compute, bounds end-to-end training. This
module is the TPU-native alternative for stores that fit in HBM: the
packed uint8 clips and float32 skeletons are device_put ONCE; per batch
only sample indices, temporal-pick indices, and lerp weights cross the
link (a few KB), and the gather + temporal resample + normalize run inside
the jitted train step.

The key factorization: the whole NTU transform pipeline (AugCrop /
CenterCrop temporal windows, NormalizeLen's RGB linspace pick and
skeleton bilinear time resample — reference datasets/ntu.py:91-169) is
PURELY TEMPORAL. It never touches pixel values, so it is exactly a
per-sample gather plan:

  rgb[out]  = store_rgb[sample, rgb_t[out]]
  ske[out]  = store_ske[sample, :, lo[out]]*(1-w) + [...hi[out]]*w

``plan_temporal`` computes that plan on the host by driving the REAL
transform objects over index surrogates (identical RNG draws in identical
order to the sample path — AugCrop's ratio/p/bias sequence), with the
final NormalizeLen's formulas shared via data.ntu.linspace_frame_idx /
interp_time_plan. Skeleton origin subtraction (datasets/ntu.py:260-275)
commutes with the bilinear resample by linearity, so it moves on-device
after the gather (float association differs — equal to ~1e-6, not
bit-exact).

Scaling: under a mesh the store replicates by default; ``shard=True``
splits it along the sample axis across the ``data`` axis so each chip
holds 1/D of the dataset — the batch gather lowers to the masked
local-gather + all-reduce pattern (verified in HLO for the feature bank,
parallel/mesh.py) and rides ICI. A v5e-8 holds ~8x the per-chip dataset.

HBM budget: full-res cross-subject NTU (~40k clips x 24 x 256x256x3 u8)
is ~188 GB — resident mode is for stores that fit (fewer packed frames,
smaller vid_dim, a dev split, or sharded across a slice); the streaming
MapLoader path remains the default.
"""

from __future__ import annotations

import os

import numpy as np

from mfas_tpu.data import ntu as ntu_data
from mfas_tpu.data.loader import ResumableRng


def _unwrap(transform):
    if transform is None:
        return []
    if isinstance(transform, ntu_data.Compose):
        return list(transform.transforms)
    return [transform]


def plan_temporal(transform, n_frames, ske_valid, rng=None):
    """Per-sample temporal gather plan for a transform chain.

    Drives the real transform objects over index surrogates: RGB surrogate
    (F,1,1,1) holds frame numbers, skeleton surrogate (2,L,1,1) likewise —
    slicing transforms (AugCrop/CenterCrop) act on them exactly as on
    data, consuming identical RNG draws in identical order. The chain must
    end with NormalizeLen (the CLI pipelines do), whose picks come from
    the same shared formulas the host path uses.

    Returns dict(rgb_t (t_rgb,) i32, ske_lo/ske_hi (t_ske,) i32,
    ske_w (t_ske,) f32). Entries are None for absent modalities."""
    chain = _unwrap(transform)
    if not chain or not isinstance(chain[-1], ntu_data.NormalizeLen):
        raise ValueError(
            "resident planning requires a transform chain ending in "
            f"NormalizeLen (got {[type(t).__name__ for t in chain]})")
    norm_len = chain[-1]

    sample = {
        "rgb": (np.arange(n_frames).reshape(-1, 1, 1, 1)
                if n_frames else np.zeros([1], np.float32)),
        "ske": (np.broadcast_to(
            np.arange(ske_valid, dtype=np.float64).reshape(1, -1, 1, 1),
            (2, ske_valid, 1, 1)).copy()
            if ske_valid else np.zeros([1], np.float32)),
        "label": 0,
    }
    for t in chain[:-1]:
        if rng is not None and getattr(t, "accepts_rng", False):
            sample = t(sample, rng=rng)
        else:
            sample = t(sample)

    plan = {"rgb_t": None, "ske_lo": None, "ske_hi": None, "ske_w": None}
    if n_frames:
        window = sample["rgb"][:, 0, 0, 0]
        pick = ntu_data.linspace_frame_idx(len(window), norm_len.vid_len[0])
        plan["rgb_t"] = window[pick].astype(np.int32)
    if ske_valid:
        window = sample["ske"][0, :, 0, 0].astype(np.int64)
        lo, hi, w = ntu_data.interp_time_plan(len(window),
                                              norm_len.vid_len[1])
        plan["ske_lo"] = window[lo].astype(np.int32)
        plan["ske_hi"] = window[hi].astype(np.int32)
        plan["ske_w"] = w
    return plan


class ResidentNTUStore:
    """Packed split resident on device.

    mesh=None: single-device placement. With a mesh: replicated by
    default; shard=True splits the sample axis over the mesh's ``data``
    axis (the store length is zero-padded to a multiple of the axis size;
    padding is never indexed)."""

    def __init__(self, packed_dir, args=None, mesh=None, shard=False):
        import json

        import jax.numpy as jnp

        with open(os.path.join(packed_dir, "meta.json")) as f:
            self.meta = json.load(f)
        self.modality = (getattr(args, "modality", "both")
                         if args is not None else "both")
        rgb = np.load(os.path.join(packed_dir, "rgb.npy"), mmap_mode="r")
        ske = np.load(os.path.join(packed_dir, "ske.npy"), mmap_mode="r")
        self.ske_len = np.load(os.path.join(packed_dir, "ske_len.npy"))
        self.labels = np.load(os.path.join(packed_dir, "labels.npy"))
        self.n = len(self.labels)
        self.n_frames = int(self.meta["frames"])
        # recorded so make_resident_prep(store=...) can enforce its
        # "fuse_gather needs an unsharded store" precondition
        self.sharded = bool(shard and mesh is not None)

        def place(x):
            x = np.asarray(x)
            if mesh is None:
                return jnp.asarray(x)
            import jax
            from jax.sharding import NamedSharding, PartitionSpec as P

            from mfas_tpu.parallel.mesh import device_put_global
            if shard:
                d = mesh.shape["data"]
                pad = (-len(x)) % d
                if pad:
                    x = np.concatenate(
                        [x, np.zeros((pad,) + x.shape[1:], x.dtype)])
                spec = P("data", *([None] * (x.ndim - 1)))
            else:
                spec = P(*([None] * x.ndim))
            return device_put_global(x, NamedSharding(mesh, spec))

        self.rgb_dev = (place(rgb)
                        if self.modality in ("rgb", "both") else None)
        self.ske_dev = (place(ske)
                        if self.modality in ("skeleton", "both") else None)

    def __len__(self):
        return self.n


class ResidentLoader(ResumableRng):
    """Loader twin of MapLoader over a ResidentNTUStore: same shuffle RNG,
    same per-sample transform seed draws (np.random.RandomState(seed)
    shuffles, then one randint(0, 2**31-1) seed per sample in dataset
    order), so the resident stream visits samples and augmentations in
    the exact order the streaming path would. Batches are index plans; the
    heavy gather happens in-graph (make_resident_prep)."""

    def __init__(self, store, batch_size, transform, shuffle=False, seed=0):
        self.store = store
        self.batch_size = int(batch_size)
        self.transform = transform
        self.shuffle = shuffle
        self._rng = np.random.RandomState(seed)
        self._needs_rng = any(getattr(t, "accepts_rng", False)
                              for t in _unwrap(transform))

    @property
    def dataset_size(self):
        return self.store.n

    def __len__(self):
        return -(-self.store.n // self.batch_size)

    def __iter__(self):
        st = self.store
        idx = np.arange(st.n)
        if self.shuffle:
            self._rng.shuffle(idx)
        # drawn unconditionally to mirror MapLoader's RNG consumption
        # (it draws per-sample seeds for any getitem_seeded dataset), so
        # the shuffle stream stays identical across epochs in both paths
        drawn = self._rng.randint(0, 2 ** 31 - 1, size=len(idx))
        seeds = drawn if self._needs_rng else [None] * len(idx)
        bs = self.batch_size
        want_rgb = st.rgb_dev is not None
        want_ske = st.ske_dev is not None
        for start in range(0, len(idx), bs):
            take = idx[start:start + bs]
            n = len(take)
            mask = np.zeros((bs,), np.float32)
            mask[:n] = 1.0
            if n < bs:
                take = np.concatenate([take, np.repeat(take[:1], bs - n)])
            plans = [plan_temporal(
                self.transform,
                st.n_frames if want_rgb else 0,
                int(st.ske_len[i]) if want_ske else 0,
                rng=(np.random.RandomState(int(seeds[start + j]))
                     if seeds[start + j] is not None else None))
                for j, i in enumerate(take[:n])]
            if n < bs:
                plans += [plans[0]] * (bs - n)
            batch = {
                "_idx": take.astype(np.int32),
                "label": st.labels[take].astype(np.int32),
                "_mask": mask,
            }
            if want_rgb:
                batch["rgb_t"] = np.stack([p["rgb_t"] for p in plans])
                batch["_rgb_store"] = st.rgb_dev
            if want_ske:
                batch["ske_lo"] = np.stack([p["ske_lo"] for p in plans])
                batch["ske_hi"] = np.stack([p["ske_hi"] for p in plans])
                batch["ske_w"] = np.stack([p["ske_w"] for p in plans])
                batch["_ske_store"] = st.ske_dev
            yield batch


def make_resident_prep(no_norm=False, use_pallas=None, compute_dtype=None,
                       fuse_gather=None, store=None):
    """Engine batch_prep: in-graph store gather + temporal resample +
    normalize. Composes with the engine's jitted step, so the whole input
    path is one XLA program reading the batch out of HBM.

    compute_dtype: emit normalized clips in this dtype (pass the engine's
    compute_dtype). Under bf16 steps the unfused pipeline wrote a float32
    clip to HBM only for the engine's cast to immediately read it back and
    halve it — emitting bf16 straight from the normalize skips that f32
    round-trip (4x the uint8 bytes written + read). Rounding is identical:
    the affine math stays f32, the cast happens once on the store.

    use_pallas / fuse_gather: BOTH default False — measured negative
    results on TPU v5e at the production shape (16x8x256x256x3 from a
    192-clip store; /tmp probe 2026-08-19, recorded in docs/TPU_DESIGN.md
    §5.4): XLA's gather + convert + fma runs at the dispatch floor
    (~1.0-1.5 ms) while the Pallas normalize costs 6-9 ms (u8 widening is
    lane-inefficient on the VPU) and the scalar-prefetch fused
    gather+normalize kernel 32-34 ms (per-frame blocks defeat DMA
    pipelining). Both kernels stay available for A/B runs and for shapes
    where XLA's gather lowering regresses; fuse_gather also requires an
    UNSHARDED store (the kernel is single-device — under
    --shard_resident_store the XLA gather lowers to the masked
    local-gather + all-reduce collective) and falls back automatically to
    the XLA gather when the store's frame shape doesn't fit the kernel
    tiling, when the store array is detectably sharded, or when
    ``store=`` (pass the ResidentNTUStore — inside a jitted step the
    array is a tracer with no visible sharding) says shard=True."""
    import jax  # noqa: F401  (kept: callers toggle backends in-process)
    import jax.numpy as jnp

    from mfas_tpu.data.ntu import IMAGENET_MEAN, IMAGENET_STD
    from mfas_tpu.ops.input_kernels import (gather_normalize_supported,
                                            u8_gather_normalize,
                                            u8_normalize)

    if use_pallas is None:
        use_pallas = False
    if fuse_gather is None:
        fuse_gather = False
    if fuse_gather and store is not None and getattr(store, "sharded",
                                                     False):
        import warnings
        warnings.warn("fuse_gather=True needs an unsharded store (the "
                      "Pallas kernel is single-device) — falling back to "
                      "the XLA gather for this sharded store")
        fuse_gather = False
    out_dt = jnp.dtype(compute_dtype) if compute_dtype else jnp.float32

    def _replicated(x):
        # eager arrays expose .sharding; inside a jitted step x is a
        # tracer and the probe passes (the store= gate above covers that)
        try:
            return x.sharding.is_fully_replicated
        except Exception:  # noqa: BLE001
            return True

    def prep(batch):
        batch = dict(batch)
        idx = batch.pop("_idx")
        rgb_store = batch.pop("_rgb_store", None)
        ske_store = batch.pop("_ske_store", None)
        if rgb_store is not None:
            rgb_t = batch.pop("rgb_t")
            if (fuse_gather and gather_normalize_supported(rgb_store.shape)
                    and _replicated(rgb_store)):
                batch["rgb"] = u8_gather_normalize(
                    rgb_store, idx, rgb_t, IMAGENET_MEAN, IMAGENET_STD,
                    out_dtype=out_dt)
            else:
                clips = rgb_store[idx[:, None], rgb_t]
                batch["rgb"] = u8_normalize(clips, IMAGENET_MEAN,
                                            IMAGENET_STD,
                                            use_pallas=use_pallas,
                                            out_dtype=out_dt)
        else:
            batch["rgb"] = jnp.zeros((idx.shape[0], 1), jnp.float32)
        if ske_store is not None:
            lo = batch.pop("ske_lo")[:, None, :, None, None]
            hi = batch.pop("ske_hi")[:, None, :, None, None]
            w = batch.pop("ske_w")[:, None, :, None, None]
            s = ske_store[idx]                      # (B, 3, S, 25, 2)
            s = (jnp.take_along_axis(s, lo, axis=2) * (1.0 - w)
                 + jnp.take_along_axis(s, hi, axis=2) * w)
            if not no_norm:
                # centered on joint 2 of person 1; linear, so moving it
                # after the resample is exact up to float association
                s = s - s[:, :, :, 1, 0][:, :, :, None, None]
            batch["ske"] = s
        else:
            batch["ske"] = jnp.zeros((idx.shape[0], 1), jnp.float32)
        return batch

    return prep
