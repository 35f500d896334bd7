"""Whole-model torch-oracle parity, part 2: CIFAR micro-cell net and the
MM-IMDB model family.

Same method as tests/test_reference_oracle.py — build the reference model
(/root/reference/models/...), export its state_dict, load it into the
rebuild through the checkpoint bridge, assert equal outputs in eval mode.
Pins the components the first oracle file does not cover:

- Searchable_MicroCNN, search mode (aux.Cell sum-aggregate) and fixed mode
  (aux.FixedCell concat + 1x1 reduce, FactorizedReduction plane doubling)
  — reference models/search/cifar_searchable.py:161-285.
- MaxOut_MLP (reference models/central/mm_imdb.py:176-196).
- SimpleVT_CentralNet incl. its scalar-alpha wsum quirk (dif==0 uses a1
  twice — reference mm_imdb.py:494) — mm_imdb.py:395-506.
- VGGT_CentralNetV2 vector-sigmoid-gated fusion over a real VGG19 trunk
  — mm_imdb.py:509-652 (torchvision download monkeypatched out; random
  VGG weights are exported and shared, which is what parity needs).
"""

import sys
import types

import numpy as np

from tests.test_reference_oracle import _sd_numpy  # noqa: E402
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from mfas_tpu.core.module import Ctx  # noqa: E402
from mfas_tpu.runtime import checkpoint as ckpt  # noqa: E402

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref():
    if REF not in sys.path:
        sys.path.append(REF)
    # shared stubs for the reference's broken models.aux.scheduler import
    # and the uninstalled torchvision (incl. the hand-built VGG19 —
    # see tests/ref_stubs.py; a private "not in sys.modules" guard here
    # would race with other reference-importing fixtures on test order)
    from tests.ref_stubs import (install_aux_scheduler_stub,
                                 install_torchvision_stub)
    install_torchvision_stub()
    install_aux_scheduler_stub()

    import models.auxiliary.inflated_resnet as ref_inflated
    # zero egress: skip the torchvision model-zoo download, keep random init
    ref_inflated.load_pretrained_2D_weights = lambda *a, **k: None

    import models.central.mm_imdb as ref_imdb
    import models.central.ntu as ref_central_ntu
    import models.search.cifar_searchable as ref_cifar
    return types.SimpleNamespace(imdb=ref_imdb, cifar=ref_cifar,
                                 central_ntu=ref_central_ntu)


def _assert_close(ours, theirs, rtol=1e-4, atol=1e-5, msg=""):
    np.testing.assert_allclose(np.asarray(ours), theirs.detach().numpy(),
                               rtol=rtol, atol=atol, err_msg=msg)


# ---------------------------------------------------------------------------
# CIFAR Searchable_MicroCNN
# ---------------------------------------------------------------------------
def _cifar_args(**kw):
    d = dict(img_size=16, planes=8, net_str=[1, 2, 1], num_outputs=5,
             drop_prob=0.0, drop_path=0.0)
    d.update(kw)
    return types.SimpleNamespace(**d)


@pytest.mark.parametrize("fixed", [False, True], ids=["search", "found"])
def test_cifar_micro_cnn_logits_parity(ref, fixed):
    from mfas_tpu.fusion.cifar import Searchable_MicroCNN

    conf = np.array([[1, 6, -2, -1],   # 3x3 conv + 3x3 maxpool
                     [3, 0, 0, -1],    # 3x3 depthconv + identity
                     [2, 7, -2, 1]])   # 5x5 conv + 3x3 avgpool
    torch.manual_seed(0)
    # the reference mutates args.planes at fixed-mode reduction points
    # (cifar_searchable.py:282-283) — each model needs its own args object
    ref_model = ref.cifar.Searchable_MicroCNN(
        _cifar_args(), conf, fixed=fixed).eval()
    ours = Searchable_MicroCNN(_cifar_args(), conf, fixed=fixed)

    tree = ckpt.tree_from_state_dict(_sd_numpy(ref_model),
                                     template=ours.init(0))
    rs = np.random.RandomState(5)
    x = rs.randn(2, 3, 16, 16).astype(np.float32)

    with torch.no_grad():
        ref_out, ref_aux = ref_model(torch.from_numpy(x))
    out, aux_out = ours.apply(tree, Ctx(train=False), jnp.asarray(x))

    _assert_close(out, ref_out, msg="main logits")
    _assert_close(aux_out, ref_aux, msg="aux-head logits")


# ---------------------------------------------------------------------------
# AVMNIST hand-built baselines (reference models/central/avmnist.py:119-279)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def ref_av(ref):
    import models.central.avmnist as ref_avmnist
    return ref_avmnist


def _av_inputs(seed):
    rs = np.random.RandomState(seed)
    audio = rs.randn(3, 1, 112, 112).astype(np.float32)
    image = rs.randn(3, 1, 28, 28).astype(np.float32)
    return audio, image


def test_simple_avnet_parity(ref_av):
    from mfas_tpu.models.avmnist import SimpleAVNet

    args = types.SimpleNamespace(channels=6, num_outputs=7)
    torch.manual_seed(8)
    ref_model = ref_av.SimpleAVNet(args, 1, 1).eval()
    ours = SimpleAVNet(args, 1, 1)
    tree = ckpt.tree_from_state_dict(_sd_numpy(ref_model),
                                     template=ours.init(0))
    audio, image = _av_inputs(13)
    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(audio), torch.from_numpy(image))
    out = ours.apply(tree, Ctx(train=False),
                     jnp.asarray(audio), jnp.asarray(image))
    _assert_close(out, ref_out)


def test_simple_avnet_deeper_parity(ref_av):
    from mfas_tpu.models.avmnist import SimpleAVNet_Deeper

    args = types.SimpleNamespace(channels=6, num_outputs=7)
    torch.manual_seed(9)
    ref_model = ref_av.SimpleAVNet_Deeper(args, 1, 1).eval()
    ours = SimpleAVNet_Deeper(args, 1, 1)
    tree = ckpt.tree_from_state_dict(_sd_numpy(ref_model),
                                     template=ours.init(0))
    audio, image = _av_inputs(14)
    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(audio), torch.from_numpy(image))
    out = ours.apply(tree, Ctx(train=False),
                     jnp.asarray(audio), jnp.asarray(image))
    _assert_close(out, ref_out)


def test_simple_av_centralnet_parity(ref_av):
    """channels=24 is the shape-consistent choice for fusingmix='31,42,53':
    16*channels = 384 = the hardcoded classifier width (avmnist.py:180-189),
    mirroring the SimpleVT_CentralNet situation."""
    from mfas_tpu.models.avmnist import SimpleAV_CentralNet

    args = types.SimpleNamespace(channels=24, num_outputs=7,
                                 fusingmix="31,42,53", fusetype="wsum")
    torch.manual_seed(10)
    ref_model = ref_av.SimpleAV_CentralNet(args, 1, 1).eval()
    ours = SimpleAV_CentralNet(args, 1, 1)
    tree = ckpt.tree_from_state_dict(_sd_numpy(ref_model),
                                     template=ours.init(0))
    audio, image = _av_inputs(15)
    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(audio), torch.from_numpy(image))
    out = ours.apply(tree, Ctx(train=False),
                     jnp.asarray(audio), jnp.asarray(image))
    assert len(ref_out) == 3 and len(out) == 3
    for name, r, o in zip(("audio", "image", "fusion"), ref_out, out):
        _assert_close(o, r, msg=name)


# ---------------------------------------------------------------------------
# MM-IMDB family
# ---------------------------------------------------------------------------
def _imdb_args(**kw):
    d = dict(num_outputs=6, channels=24, fusingmix="11,25", fusetype="wsum")
    d.update(kw)
    return types.SimpleNamespace(**d)


def test_maxout_mlp_parity(ref):
    from mfas_tpu.models.mm_imdb import MaxOut_MLP

    args = _imdb_args()
    torch.manual_seed(1)
    ref_model = ref.imdb.MaxOut_MLP(args).eval()
    ours = MaxOut_MLP(args)
    tree = ckpt.tree_from_state_dict(_sd_numpy(ref_model),
                                     template=ours.init(0))

    rs = np.random.RandomState(6)
    text = rs.randn(3, 300).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(text))
    out = ours.apply(tree, Ctx(train=False), jnp.asarray(text))
    assert len(ref_out) == 3 and len(out) == 3
    for name, r, o in zip(("o1", "o3", "logits"), ref_out, out):
        _assert_close(o, r, msg=name)


def test_simplevt_centralnet_parity(ref):
    """channels=24 is the shape-consistent choice for fusingmix='11,25':
    16*channels = 384 = the hardcoded classifier width
    (reference mm_imdb.py:417-424)."""
    from mfas_tpu.models.mm_imdb import SimpleVT_CentralNet

    args = _imdb_args()
    torch.manual_seed(2)
    ref_model = ref.imdb.SimpleVT_CentralNet(args, 64, 1).eval()
    ours = SimpleVT_CentralNet(args, 64, 1)
    tree = ckpt.tree_from_state_dict(_sd_numpy(ref_model),
                                     template=ours.init(0))

    rs = np.random.RandomState(7)
    text = rs.randn(3, 300).astype(np.float32)
    image = rs.randn(3, 1, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(text), torch.from_numpy(image))
    out = ours.apply(tree, Ctx(train=False),
                     jnp.asarray(text), jnp.asarray(image))
    assert len(ref_out) == 3 and len(out) == 3
    for name, r, o in zip(("text", "image", "fusion"), ref_out, out):
        _assert_close(o, r, msg=name)


def test_simple_recurrent_model_parity(ref):
    """2xGRU text net: pins the GRU scan and the last-valid-step gather.
    The reference applies nn.functional.dropout(p=0.666) unconditionally —
    even in eval mode (mm_imdb.py:144, a quirk the rebuild gates on
    ctx.train) — so the oracle call patches it to identity."""
    from mfas_tpu.models.mm_imdb import SimpleRecurrentModel

    args = _imdb_args()
    torch.manual_seed(4)
    ref_model = ref.imdb.SimpleRecurrentModel(args).eval()
    ours = SimpleRecurrentModel(args)
    tree = ckpt.tree_from_state_dict(_sd_numpy(ref_model),
                                     template=ours.init(0))

    rs = np.random.RandomState(9)
    text = rs.randn(3, 7, 100).astype(np.float32)
    lengths = np.array([7, 4, 1], np.int64)
    real_dropout = torch.nn.functional.dropout
    torch.nn.functional.dropout = lambda x, *a, **k: x
    try:
        with torch.no_grad():
            ref_out = ref_model(torch.from_numpy(text),
                                torch.from_numpy(lengths))
    finally:
        torch.nn.functional.dropout = real_dropout
    out = ours.apply(tree, Ctx(train=False),
                     jnp.asarray(text), jnp.asarray(lengths))
    _assert_close(out, ref_out)


def test_vggvtnet_parity(ref):
    from mfas_tpu.models.mm_imdb import VGGVTNet

    args = _imdb_args()
    torch.manual_seed(5)
    ref_model = ref.imdb.VGGVTNet(args, 64, 3).eval()
    ours = VGGVTNet(args, 64, 3)
    tree = ckpt.tree_from_state_dict(_sd_numpy(ref_model),
                                     template=ours.init(0))

    rs = np.random.RandomState(10)
    text = rs.randn(2, 300).astype(np.float32)
    image = rs.randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(text), torch.from_numpy(image))
    out = ours.apply(tree, Ctx(train=False),
                     jnp.asarray(text), jnp.asarray(image))
    _assert_close(out, ref_out, rtol=5e-4, atol=5e-5)


def test_vggt_centralnet_parity(ref):
    """V1: scalar-alpha fusion + Linear central column (mm_imdb.py:258-392)."""
    from mfas_tpu.models.mm_imdb import VGGT_CentralNet

    args = _imdb_args(channels=16, fusingmix="11,24")
    torch.manual_seed(6)
    ref_model = ref.imdb.VGGT_CentralNet(args, 64, 3).eval()
    ours = VGGT_CentralNet(args, 64, 3)
    tree = ckpt.tree_from_state_dict(_sd_numpy(ref_model),
                                     template=ours.init(0))

    rs = np.random.RandomState(11)
    text = rs.randn(2, 300).astype(np.float32)
    image = rs.randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(text), torch.from_numpy(image))
    out = ours.apply(tree, Ctx(train=False),
                     jnp.asarray(text), jnp.asarray(image))
    assert len(ref_out) == 3 and len(out) == 3
    for name, r, o in zip(("text", "image", "fusion"), ref_out, out):
        _assert_close(o, r, rtol=5e-4, atol=5e-5, msg=name)


def test_ntu_late_fusion_parity(ref):
    """LateFusion over the full HCN + inflated-ResNet backbones
    (reference models/central/ntu.py:186-200)."""
    from mfas_tpu.models.ntu import LateFusion

    args = types.SimpleNamespace(num_classes=7, num_outputs=7,
                                 vid_len=(1, 32), drpt=0.0)
    torch.manual_seed(7)
    ref_model = ref.central_ntu.LateFusion(args).eval()
    ours = LateFusion(args)
    tree = ckpt.tree_from_state_dict(_sd_numpy(ref_model),
                                     template=ours.init(0))

    rs = np.random.RandomState(12)
    rgb = rs.randn(2, 1, 224, 224, 3).astype(np.float32)
    ske = rs.randn(2, 3, 32, 25, 2).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_model((torch.from_numpy(rgb), torch.from_numpy(ske)))
    out = ours.apply(tree, Ctx(train=False),
                     (jnp.asarray(rgb), jnp.asarray(ske)))
    _assert_close(out, ref_out, rtol=2e-3, atol=5e-4)


def test_vggt_centralnet_v2_parity(ref):
    from mfas_tpu.models.mm_imdb import VGGT_CentralNetV2

    args = _imdb_args(channels=32, fusingmix="11,24")
    torch.manual_seed(3)
    ref_model = ref.imdb.VGGT_CentralNetV2(args, 64, 3).eval()
    ours = VGGT_CentralNetV2(args, 64, 3)
    tree = ckpt.tree_from_state_dict(_sd_numpy(ref_model),
                                     template=ours.init(0))

    rs = np.random.RandomState(8)
    text = rs.randn(2, 300).astype(np.float32)
    image = rs.randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(text), torch.from_numpy(image))
    out = ours.apply(tree, Ctx(train=False),
                     jnp.asarray(text), jnp.asarray(image))
    assert len(ref_out) == 3 and len(out) == 3
    for name, r, o in zip(("text", "image", "fusion"), ref_out, out):
        _assert_close(o, r, rtol=5e-4, atol=5e-5, msg=name)
