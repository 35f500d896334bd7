"""Packed NTU store: one-time offline decode -> memory-mapped training reads.

The reference decodes a FULL AVI per sample per epoch to keep 24 frames
(datasets/ntu.py:12-32 via __getitem__:247-250) — the dominant input cost
(SURVEY.md §7.3 hard part 5). ``pack_ntu`` does that decode exactly once,
storing:

  * ``rgb.u8``   uint8 memmap (N, frames, H, W, 3) — raw cv2 BGR frames;
  * ``ske.f32``  float32 memmap (N, 3, max_skel_frames, 25, 2) + per-sample
    true lengths (text parsed by the native C++ parser);
  * ``labels.npy``, ``meta.json``.

``PackedNTU`` serves samples API-compatible with data.ntu.NTU (same
transform pipeline applies) but with /255 + ImageNet normalization fused
into the native threaded gather (mfas_tpu.data.native), and zero video
decoding in the hot path.
"""

from __future__ import annotations

import json
import os

import numpy as np

from mfas_tpu.data import native
from mfas_tpu.data import ntu as ntu_data

DEFAULT_FRAMES = 24          # load_video's default (datasets/ntu.py:12)
MAX_SKEL_FRAMES = 300


def pack_ntu(root_dir, out_dir, stage, args=None, frames=DEFAULT_FRAMES,
             max_skel_frames=MAX_SKEL_FRAMES, vid_dim=256, vid_fr=30,
             verbose=True):
    """Decode every sample of a split once into the packed layout."""
    os.makedirs(out_dir, exist_ok=True)
    ds = ntu_data.NTU(root_dir, transform=None, stage=stage,
                      vid_dim=vid_dim, vid_fr=vid_fr, args=args,
                      shuffle_seed=0)
    n = len(ds)
    if n == 0:
        raise ValueError(f"no samples for stage {stage!r} under {root_dir}")

    # probe first video for dimensions
    first = ntu_data.load_video(ds.rgb_list[0], vid_len=frames)
    H, W = first.shape[1], first.shape[2]

    rgb = np.lib.format.open_memmap(
        os.path.join(out_dir, "rgb.npy"), mode="w+", dtype=np.uint8,
        shape=(n, frames, H, W, 3))
    ske = np.lib.format.open_memmap(
        os.path.join(out_dir, "ske.npy"), mode="w+", dtype=np.float32,
        shape=(n, 3, max_skel_frames, 25, 2))
    ske_len = np.zeros((n,), np.int32)
    labels = np.zeros((n,), np.int32)

    for i in range(n):
        # the probe already decoded sample 0 — don't decode it twice
        video = first if i == 0 else ntu_data.load_video(ds.rgb_list[i],
                                                         vid_len=frames)
        rgb[i] = np.clip(video, 0, 255).astype(np.uint8)
        parsed, true_len = native.parse_skeleton(ds.ske_list[i],
                                                 max_skel_frames)
        ske[i] = parsed
        ske_len[i] = min(true_len, max_skel_frames)
        labels[i] = ds.labels[i] - 1
        if verbose and i % 200 == 0:
            print(f"packed {i}/{n}")

    rgb.flush()
    ske.flush()
    np.save(os.path.join(out_dir, "ske_len.npy"), ske_len)
    np.save(os.path.join(out_dir, "labels.npy"), labels)
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump({"n": n, "frames": frames, "h": H, "w": W,
                   "max_skel_frames": max_skel_frames, "stage": stage}, f)
    if verbose:
        print(f"packed {n} samples to {out_dir}")
    return n


class PackedNTU:
    """Indexable dataset over a packed store; drop-in for data.ntu.NTU.

    device_normalize=True ships RGB as raw uint8 (4x less host->device
    traffic) and leaves the /255 + ImageNet normalize to the on-device
    fused kernel (mfas_tpu.ops.input_kernels.u8_normalize, wired through
    the engine's batch_prep hook) — the BASELINE north-star input path.
    Temporal transforms (AugCrop/NormalizeLen RGB picks) are pure slicing
    and commute with the normalize, so they still run on the host."""

    def __init__(self, packed_dir, transform=None, args=None,
                 num_threads=2, device_normalize=False):
        with open(os.path.join(packed_dir, "meta.json")) as f:
            self.meta = json.load(f)
        self.rgb = np.load(os.path.join(packed_dir, "rgb.npy"), mmap_mode="r")
        self.ske = np.load(os.path.join(packed_dir, "ske.npy"), mmap_mode="r")
        self.ske_len = np.load(os.path.join(packed_dir, "ske_len.npy"))
        self.labels = np.load(os.path.join(packed_dir, "labels.npy"))
        self.transform = transform
        self.args = args
        self.num_threads = num_threads
        self.device_normalize = device_normalize
        # cv2 frames are BGR; the reference normalizes with RGB-ordered
        # ImageNet stats on BGR data (datasets/ntu.py:266-267) — preserved.
        self._mean = ntu_data.IMAGENET_MEAN
        self._std = ntu_data.IMAGENET_STD

    def __len__(self):
        return len(self.labels)

    def __getitem__(self, idx):
        return self._get(idx)

    def getitem_seeded(self, idx, seed):
        """Per-sample-seeded fetch (MapLoader protocol; see ntu.NTU)."""
        return self._get(idx, rng=np.random.RandomState(seed))

    def _get(self, idx, rng=None):
        modality = getattr(self.args, "modality", "both") if self.args else "both"
        no_norm = getattr(self.args, "no_norm", False) if self.args else False

        video = np.zeros([1], np.float32)
        skeleton = np.zeros([1], np.float32)
        if modality in ("rgb", "both"):
            if self.device_normalize:
                video = np.asarray(self.rgb[idx])  # raw uint8
            else:
                video = native.gather_normalize_u8(
                    self.rgb[idx][None], np.asarray([0]), self._mean,
                    self._std, num_threads=self.num_threads)[0]
        if modality in ("skeleton", "both"):
            skeleton = np.asarray(self.ske[idx, :, :self.ske_len[idx]],
                                  np.float32)
            if not no_norm:
                origin = skeleton[:, :, 1, 0]
                skeleton = skeleton - origin[:, :, None, None]

        sample = {"rgb": video, "ske": skeleton,
                  "label": int(self.labels[idx])}
        if self.transform:
            # same dispatch as ntu.NTU._get: a BARE transform with the
            # accepts_rng protocol (e.g. AugCrop outside a Compose) must
            # also get the per-sample rng, or seeded parallel loading
            # silently degrades to the shared thread-raced RNG
            if rng is not None and (getattr(self.transform, "accepts_rng",
                                            False)
                                    or isinstance(self.transform,
                                                  ntu_data.Compose)):
                sample = self.transform(sample, rng=rng)
            else:
                sample = self.transform(sample)
        sample["label"] = np.int32(sample["label"])
        rgb_dtype = np.uint8 if self.device_normalize else np.float32
        sample["rgb"] = np.asarray(sample["rgb"], rgb_dtype)
        sample["ske"] = np.asarray(sample["ske"], np.float32)
        return sample


def make_device_normalize_prep(use_pallas=None):
    """Engine batch_prep hook: in-graph uint8 -> normalized float32 for the
    'rgb' modality.

    use_pallas defaults to False on every backend: measured on TPU v5e at
    the production shape (16x8x256x256x3), XLA's convert+fma lowering runs
    the normalize at the dispatch floor (~1.4 ms) while the Pallas kernel
    costs a real 6-9 ms (u8 widening is lane-inefficient on the VPU) — a
    6-9x loss, same verdict as the Pallas conv1x1 experiment
    (docs/TPU_DESIGN.md §5.4). The kernel stays available for A/B runs."""
    import jax  # noqa: F401  (kept: callers toggle backends in-process)
    from mfas_tpu.data.ntu import IMAGENET_MEAN, IMAGENET_STD
    from mfas_tpu.ops.input_kernels import u8_normalize

    if use_pallas is None:
        use_pallas = False

    def prep(batch):
        import jax.numpy as _jnp
        batch = dict(batch)
        rgb = batch["rgb"]
        # dtype gate (trace-safe): only raw uint8 clips get the affine —
        # an already-normalized float batch (raw-AVI host path, or a prep
        # applied twice) must pass through, not be re-normalized
        if rgb.shape[-1] == 3 and rgb.dtype == _jnp.uint8:
            batch["rgb"] = u8_normalize(rgb, IMAGENET_MEAN, IMAGENET_STD,
                                        use_pallas=use_pallas)
        else:
            # skeleton-only dummy placeholder or already-float clip: cast
            batch["rgb"] = rgb.astype(_jnp.float32)
        return batch

    return prep


def make_device_normalize_inputs_prep(use_pallas=None):
    """PopulationTrainer input_prep hook: normalizes every uint8 element of
    the inputs tuple in-graph (the search-path twin of
    make_device_normalize_prep; same measured XLA-wins-6-9x default)."""
    import jax  # noqa: F401
    import jax.numpy as jnp

    from mfas_tpu.data.ntu import IMAGENET_MEAN, IMAGENET_STD
    from mfas_tpu.ops.input_kernels import u8_normalize

    if use_pallas is None:
        use_pallas = False

    def prep(inputs):
        return tuple(
            u8_normalize(x, IMAGENET_MEAN, IMAGENET_STD,
                         use_pallas=use_pallas)
            if (x.dtype == jnp.uint8 and x.shape[-1] == 3)
            else (x.astype(jnp.float32) if x.dtype == jnp.uint8 else x)
            for x in inputs)

    return prep


def make_synthetic_packed_ntu(out_dir, n=32, frames=8, h=64, w=64,
                              skel_frames=32, num_classes=60, seed=0):
    """Random packed store in the pack_ntu layout (tests/bench fixture)."""
    os.makedirs(out_dir, exist_ok=True)
    rs = np.random.RandomState(seed)
    rgb = rs.randint(0, 256, (n, frames, h, w, 3)).astype(np.uint8)
    ske = (rs.randn(n, 3, skel_frames, 25, 2) * 0.3).astype(np.float32)
    np.save(os.path.join(out_dir, "rgb.npy"), rgb)
    np.save(os.path.join(out_dir, "ske.npy"), ske)
    np.save(os.path.join(out_dir, "ske_len.npy"),
            np.full((n,), skel_frames, np.int32))
    np.save(os.path.join(out_dir, "labels.npy"),
            rs.randint(0, num_classes, n).astype(np.int32))
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump({"n": n, "frames": frames, "h": h, "w": w,
                   "max_skel_frames": skel_frames, "stage": "synthetic"}, f)
    return n
