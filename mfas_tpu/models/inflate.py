"""2D -> 3D weight inflation for the video backbone.

Behavioral spec from reference models/auxiliary/imagenet_pretraining.py:
  * a 2D conv weight (O,I,kh,kw) destined for a 5D slot (O,I,kt,kh,kw) is
    repeated along time and then *center-inflated*: every temporal slice
    except the middle one is zeroed (:6-23) — so an untrained inflated net
    initially computes exactly the 2D network per frame;
  * ``fc.weight``/``fc.bias`` are dropped (:41-44); any 2D key without a
    3D destination is reported (:46).

The reference downloads torchvision weights at model construction; here
inflation is an explicit offline transform over numpy state_dicts (read with
mfas_tpu.runtime.checkpoint, no torch required).
"""

from __future__ import annotations

import numpy as np


def inflate_weight(w2d: np.ndarray, kt: int, inflation: str = "center") -> np.ndarray:
    """(O,I,kh,kw) -> (O,I,kt,kh,kw)."""
    w = np.repeat(w2d[:, :, None, :, :], kt, axis=2)
    if inflation == "center":
        mid = int(kt / 2.0)
        out = np.zeros_like(w)
        out[:, :, mid] = w[:, :, mid]
        return out
    if inflation == "mean":
        return w / kt
    raise ValueError(f"unknown inflation mode {inflation!r}")


def inflate_resnet_state(flat_2d: dict, flat_3d_template: dict,
                         inflation: str = "center", verbose: bool = False) -> dict:
    """Map a torchvision ResNet-50 flat state_dict onto the ResNet3D tree
    template (flat path -> array), inflating 4D->5D conv weights."""
    out = dict(flat_3d_template)
    for k, v in flat_2d.items():
        if k in ("fc.weight", "fc.bias"):
            continue
        if k not in flat_3d_template:
            if verbose:
                print(f"{k} cannot be init from ImageNet weights")
            continue
        dst = flat_3d_template[k]
        v = np.asarray(v)
        if dst is not None and getattr(dst, "ndim", v.ndim) == 5 and v.ndim == 4:
            v = inflate_weight(v, int(dst.shape[2]), inflation)
        out[k] = v.astype(np.float32) if v.dtype == np.float64 else v
    return out
