"""Shared sys.modules stubs for importing the read-only reference tree
(/root/reference) inside tests.

The reference needs two things this environment doesn't provide:
  * ``models.aux.scheduler`` — a broken import path in the reference
    itself (SURVEY.md §2 bug list); only isinstance-checked, so a stub
    class suffices (tests that drive the reference train loops rebind it
    to the real ``models.auxiliary.scheduler`` class).
  * ``torchvision`` — not installed (zero-egress env). The reference's
    GP_VGG wants ``tmodels.vgg19(pretrained='imagenet')`` (mm_imdb.py:24),
    so the stub ships a hand-built VGG19 features stack (configuration E)
    whose nn.Sequential indices match torchvision's exactly; random
    weights are fine because parity tests export and share them. The stub
    modules carry real ModuleSpecs so importlib.util.find_spec probes
    (e.g. huggingface datasets' availability check) don't explode.

Every fixture that imports reference modules should call these instead of
installing its own guard — two private ``if "torchvision" not in
sys.modules`` blocks in different test files race on test order.
"""

import importlib.machinery
import sys
import types

REF = "/root/reference"


def _vgg19(*a, **k):
    import torch.nn as nn

    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    layers, c = [], 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(c, v, 3, padding=1))
            layers.append(nn.ReLU(inplace=True))
            c = v
    return types.SimpleNamespace(features=nn.Sequential(*layers))


def install_aux_scheduler_stub():
    if "models.aux" in sys.modules:
        return
    aux_pkg = types.ModuleType("models.aux")
    sched = types.ModuleType("models.aux.scheduler")

    class _Stub:  # only isinstance-checked, never instantiated
        pass

    sched.LRCosineAnnealingScheduler = _Stub
    aux_pkg.scheduler = sched
    sys.modules["models.aux"] = aux_pkg
    sys.modules["models.aux.scheduler"] = sched


def install_torchvision_stub():
    if "torchvision" in sys.modules:
        # repair a pre-existing (possibly partial) stub instead of failing
        tv = sys.modules["torchvision"]
        if getattr(tv, "models", None) is None:
            m = types.ModuleType("torchvision.models")
            m.__spec__ = importlib.machinery.ModuleSpec(
                "torchvision.models", None)
            tv.models = m
            sys.modules["torchvision.models"] = m
        if not hasattr(tv.models, "vgg19"):
            tv.models.vgg19 = _vgg19
        return
    tv = types.ModuleType("torchvision")
    tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
    for sub in ("transforms", "datasets", "models"):
        m = types.ModuleType(f"torchvision.{sub}")
        m.__spec__ = importlib.machinery.ModuleSpec(f"torchvision.{sub}",
                                                    None)
        setattr(tv, sub, m)
        sys.modules[f"torchvision.{sub}"] = m
    tv.models.vgg19 = _vgg19
    sys.modules["torchvision"] = tv
