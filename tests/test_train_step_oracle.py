"""Training-DYNAMICS parity against the reference as torch oracle.

test_reference_oracle.py pins forward parity; this pins one full candidate
training step: identical weights + identical batch -> cross-entropy loss,
backward through the fusion head, and the torch-semantics Adam(wd=1e-4)
update must produce the same central parameters (reference candidate loop:
models/search/avmnist_searchable.py:59-89 builds Adam over central_params
with the backbones frozen by exclusion). Two consecutive steps are checked
so the Adam moment accumulation and bias correction are exercised, not
just the first-step special case.
"""

import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from mfas_tpu.core.module import flatten_tree, merge  # noqa: E402
from mfas_tpu.core.optim import adam_init  # noqa: E402
from mfas_tpu.engine.classifier import ClassifierEngine, split_tree  # noqa: E402
from mfas_tpu.runtime import checkpoint as ckpt  # noqa: E402
from tests.test_reference_oracle import _sd_numpy, ref  # noqa: E402,F401


def _av_args(**kw):
    d = dict(channels=6, num_outputs=7, inner_representation_size=16,
             drpt=0.0, multitask=False, alphas=False, batchnorm=False)
    d.update(kw)
    return types.SimpleNamespace(**d)


@pytest.mark.parametrize("alphas", [False, True])
def test_one_candidate_train_step_matches_reference(ref, alphas):  # noqa: F811
    args = _av_args(alphas=alphas)
    conf = np.array([[4, 2, 0], [1, 1, 1]])
    torch.manual_seed(0)
    ref_model = ref.av.Searchable_Audio_Image_Net(args, conf).train()
    sd0 = _sd_numpy(ref_model)

    rs = np.random.RandomState(5)
    image = rs.randn(4, 1, 28, 28).astype(np.float32)
    audio = rs.randn(4, 1, 112, 112).astype(np.float32)
    label = rs.randint(0, args.num_outputs, 4).astype(np.int64)

    # ---- reference: the candidate loop's optimizer/criterion
    # (avmnist_searchable.py:59-89, train loop train_searchable/avmnist.py)
    lr = 1e-3
    opt = torch.optim.Adam(ref_model.central_params(), lr=lr,
                           weight_decay=1e-4)
    crit = torch.nn.CrossEntropyLoss()
    ref_losses = []
    for _ in range(2):
        opt.zero_grad()
        out = ref_model((torch.from_numpy(image), torch.from_numpy(audio)))
        loss = crit(out, torch.from_numpy(label))
        loss.backward()
        opt.step()
        ref_losses.append(loss.item())
    sd_after = _sd_numpy(ref_model)

    # ---- rebuild: same weights through the checkpoint bridge, the
    # engine's compiled train step twice at the same fixed lr
    from mfas_tpu.fusion.avmnist import Searchable_Audio_Image_Net

    ours = Searchable_Audio_Image_Net(args, conf)
    tree = ckpt.tree_from_state_dict(sd0, template=ours.init(0))
    engine = ClassifierEngine(ours, multitask=False,
                              input_keys=("image", "audio"))
    trainable, frozen = split_tree(ours, tree, ours.central_params())
    opt_state = adam_init(trainable)
    batch = {"image": jnp.asarray(image), "audio": jnp.asarray(audio),
             "label": jnp.asarray(label.astype(np.int32)),
             "_mask": jnp.ones((4,), jnp.float32)}
    losses = []
    for step in range(2):
        trainable, frozen, opt_state, loss, corr = engine._train_step(
            trainable, frozen, opt_state, batch, jnp.float32(lr),
            jnp.zeros(2, jnp.uint32))
        losses.append(float(loss))

    np.testing.assert_allclose(losses, ref_losses, rtol=1e-4, atol=1e-5)

    flat = flatten_tree(merge(trainable, frozen))
    central_prefixes = tuple(p + "." for p in ours.central_params())
    checked_central = checked_frozen = 0
    for k, v_ref in sd_after.items():
        if "num_batches_tracked" in k:
            continue
        v = np.asarray(flat[k])
        if k.startswith(central_prefixes):
            # trained parameters: both frameworks took the same 2 Adam steps
            np.testing.assert_allclose(v, v_ref, rtol=1e-4, atol=1e-6,
                                       err_msg=k)
            checked_central += 1
        elif "running_" not in k:
            # frozen backbone parameters: must be bit-identical to the start
            np.testing.assert_array_equal(v, sd0[k], err_msg=k)
            checked_frozen += 1
    assert checked_central >= 4 and checked_frozen >= 4
