"""Loop-semantics tests: multitask loss/pred formulas and the activation
factory (reference train_searchable/ntu.py:53-61, models/central/ops.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mfas_tpu.core.module import Ctx, Module
from mfas_tpu.core.layers import Activ
from mfas_tpu.engine.classifier import ClassifierEngine

torch = pytest.importorskip("torch")


class StubModel(Module):
    """Returns fixed (out, v_logits, s_logits) scaled by a dummy param so
    gradients exist."""

    def __init__(self, outs):
        super().__init__()
        self.outs = [jnp.asarray(o) for o in outs]

    def create(self, rng):
        return {"w": jnp.ones(())}

    def leaf_kinds(self):
        return {"w": "param"}

    def apply(self, tree, ctx, inputs):
        return tuple(o * tree["w"] for o in self.outs)


def test_multitask_loss_and_preds_match_reference_formula():
    rs = np.random.RandomState(0)
    outs = [rs.randn(4, 5).astype(np.float32) for _ in range(3)]
    label = np.array([1, 0, 4, 2])

    model = StubModel(outs)
    model.init(0)
    engine = ClassifierEngine(model, multitask=True, input_keys=("x",))
    batch = {"x": jnp.zeros((4, 1)), "label": jnp.asarray(label),
             "_mask": jnp.ones((4,))}
    loss, corrects = engine._forward({"w": jnp.ones(())}, Ctx(), batch)

    tl = sum(torch.nn.functional.cross_entropy(torch.tensor(o),
                                               torch.tensor(label))
             for o in outs)
    assert float(loss) == pytest.approx(float(tl), rel=1e-5)

    summed = outs[0] + outs[1] + outs[2]
    want_corrects = (summed.argmax(1) == label).sum()
    assert int(corrects) == int(want_corrects)


def test_activation_factory_matches_torch():
    x = np.random.RandomState(1).randn(3, 7).astype(np.float32)
    xt = torch.from_numpy(x)
    cases = {
        "LeakyReLU": torch.nn.LeakyReLU(),
        "ELU": torch.nn.ELU(),
        "ReLU": torch.nn.ReLU(),
        "Tanh": torch.nn.Tanh(),
        "Sigmoid": torch.nn.Sigmoid(),
    }
    for name, tmod in cases.items():
        act = Activ(name)
        got = np.asarray(act(act.init(0), Ctx(), jnp.asarray(x)))
        np.testing.assert_allclose(got, tmod(xt).numpy(), rtol=1e-5,
                                   atol=1e-6, err_msg=name)

    # learned-beta swish: sigmoid(beta*x)*x with beta init 0.5
    act = Activ("Swish")
    tree = act.init(0)
    got = np.asarray(act(tree, Ctx(), jnp.asarray(x)))
    want = x / (1.0 + np.exp(-0.5 * x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    assert float(tree["beta"][0]) == 0.5
