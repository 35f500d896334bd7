"""AV-MNIST dataset (reference datasets/avmnist.py).

Layout on disk (:92-101): ``{root}/audio/{train,test}_data.npy`` spectrograms
(N,112,112), ``{root}/images/{train,test}_data.npy`` digits (N,784) and
``{root}/{train,test}_labels.npy``.

TPU-first: the whole split is materialized as normalized fixed-shape arrays
once (image-channel MNIST normalization (0.1307, 0.3081), :21-50 applied at
load), then batches stream from host RAM — no per-sample transform objects
in the hot path.
"""

from __future__ import annotations

import os

import numpy as np


MNIST_MEAN, MNIST_STD = 0.1307, 0.3081


class ToTensor:
    """Reference transform (datasets/avmnist.py:10-18); arrays are already
    numeric here so this just fixes dtypes."""

    def __call__(self, sample):
        return {"image": np.asarray(sample["image"], np.float32),
                "audio": np.asarray(sample["audio"], np.float32),
                "label": int(sample["label"])}


class Normalize:
    """Image-channel normalization (datasets/avmnist.py:21-53)."""

    def __init__(self, mean_vector=(MNIST_MEAN,), std_devs=(MNIST_STD,)):
        self.mean = np.asarray(mean_vector, np.float32)
        self.std = np.asarray(std_devs, np.float32)

    def __call__(self, sample):
        image = np.asarray(sample["image"], np.float32)
        image = (image - self.mean.reshape(-1, 1, 1)) / self.std.reshape(-1, 1, 1)
        return {**sample, "image": image}


def load_avmnist_arrays(root_dir, stage="train", normalize=True):
    """-> dict(image (N,1,28,28) f32, audio (N,1,112,112) f32, label (N,) i32)."""
    sub = "train" if stage == "train" else "test"
    audio = np.load(os.path.join(root_dir, "audio", f"{sub}_data.npy"))
    image = np.load(os.path.join(root_dir, "images", f"{sub}_data.npy"))
    labels = np.load(os.path.join(root_dir, f"{sub}_labels.npy"))

    audio = np.asarray(audio, np.float32)[:, None, :, :]
    image = np.asarray(image, np.float32).reshape(image.shape[0], 1, 28, 28)
    if normalize:
        image = (image - MNIST_MEAN) / MNIST_STD
    return {"image": image, "audio": audio,
            "label": np.asarray(labels, np.int32)}


def mute_modality(batch, p_muting, rng):
    """RandomModalityMuting, *fixed*: with prob p one random modality is
    zeroed. (The reference's version is dead code — its ``__call_`` typo
    means it never runs, datasets/avmnist.py:56-75; entry points don't use
    it either.)"""
    out = dict(batch)
    if rng.rand() <= p_muting:
        if rng.rand() <= 0.5:
            out["image"] = np.zeros_like(batch["image"])
        else:
            out["audio"] = np.zeros_like(batch["audio"])
    return out


class AVMnist:
    """Indexable view for API familiarity with the reference class; bulk
    training should use load_avmnist_arrays + ArrayLoader."""

    def __init__(self, root_dir="./avMNIST", transform=None, stage="train"):
        self.arrays = load_avmnist_arrays(root_dir, stage,
                                          normalize=transform is None)
        self.transform = transform

    def __len__(self):
        return self.arrays["image"].shape[0]

    def __getitem__(self, idx):
        sample = {k: v[idx] for k, v in self.arrays.items()}
        if self.transform:
            sample = self.transform(sample)
        return sample


def make_synthetic_avmnist(root_dir, n_train=256, n_test=64, seed=0):
    """Write a tiny synthetic dataset in the on-disk layout (test fixture)."""
    rs = np.random.RandomState(seed)
    os.makedirs(os.path.join(root_dir, "audio"), exist_ok=True)
    os.makedirs(os.path.join(root_dir, "images"), exist_ok=True)
    for sub, n in (("train", n_train), ("test", n_test)):
        labels = rs.randint(0, 10, n)
        audio = rs.rand(n, 112, 112).astype(np.float32) * 0.1
        image = (rs.rand(n, 784).astype(np.float32)
                 + labels[:, None] * 0.08)
        np.save(os.path.join(root_dir, "audio", f"{sub}_data.npy"), audio)
        np.save(os.path.join(root_dir, "images", f"{sub}_data.npy"), image)
        np.save(os.path.join(root_dir, f"{sub}_labels.npy"), labels)
