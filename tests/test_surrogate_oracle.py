"""Surrogate parity against the reference as torch oracle
(/root/reference/models/search/surrogate.py).

The LSTM surrogate's predictions decide which candidates the EPNAS loop
samples, so its numerics are search-ranking-critical. Two pins:

  * prediction parity: identical weights (checkpoint bridge; the param
    tree uses torch state_dict names incl. lstm weight_ih_l0 layout and
    i,f,g,o gate order) -> eval_model agrees for every sequence length;
  * fit-trajectory parity: identical weights + identical grouped dataset
    -> N epochs of full-batch Adam MSE (the reference's
    train_simple_surrogate vs our fused lax.scan fit) produce the same
    last-batch loss, the same post-fit predictions, and the same
    trained parameters — this exercises the LSTM BACKWARD against torch.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from mfas_tpu.core.module import flatten_tree  # noqa: E402
from mfas_tpu.runtime import checkpoint as ckpt  # noqa: E402
from mfas_tpu.search.surrogate import SimpleRecurrentSurrogate  # noqa: E402

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_surr():
    if REF not in sys.path:
        sys.path.append(REF)
    import models.search.surrogate as ref_surrogate
    return ref_surrogate


def _confs(rs, n, length, feats=3):
    return [rs.randint(0, 4, (length, feats)) for _ in range(n)]


def _bridge(ref_model, ours):
    sd = {k: v.detach().cpu().numpy().copy()
          for k, v in ref_model.state_dict().items()}
    return ckpt.tree_from_state_dict(sd, template=ours.params)


def test_surrogate_prediction_parity(ref_surr):
    torch.manual_seed(0)
    ref_model = ref_surr.SimpleRecurrentSurrogate(12, 3, 10).eval()
    ours = SimpleRecurrentSurrogate(12, 3, 10, seed=1, max_seq_len=4)
    ours.params = _bridge(ref_model, ours)

    rs = np.random.RandomState(3)
    for L in (1, 2, 3, 4):
        for conf in _confs(rs, 3, L):
            want = float(ref_model.eval_model(conf.astype(np.float32), "cpu"))
            got = ours.eval_model(conf)
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_surrogate_fit_trajectory_parity(ref_surr):
    torch.manual_seed(1)
    ref_model = ref_surr.SimpleRecurrentSurrogate(12, 3, 10)
    ours = SimpleRecurrentSurrogate(12, 3, 10, seed=2, max_seq_len=4)
    ours.params = _bridge(ref_model, ours)

    # identical grouped dataset through both SurrogateDataloaders (same
    # insertion order -> same group order -> same update sequence)
    rs = np.random.RandomState(7)
    ref_data = ref_surr.SurrogateDataloader()
    from mfas_tpu.search.surrogate import SurrogateDataloader

    our_data = SurrogateDataloader()
    for L in (1, 2, 3):
        for conf in _confs(rs, 5, L):
            acc = float(rs.rand() * 0.6 + 0.2)
            ref_data.add_datum(conf, acc)
            our_data.add_datum(conf, acc)

    epochs, lr = 10, 1e-2
    opt = torch.optim.Adam(ref_model.parameters(), lr=lr)
    ref_loss = ref_surr.train_simple_surrogate(
        ref_model, torch.nn.MSELoss(), opt, ref_data.get_data(to_torch=True),
        epochs, "cpu")

    dataset_conf, dataset_acc = our_data.get_data()
    our_loss = ours.fit(dataset_conf, dataset_acc, epochs, lr)

    np.testing.assert_allclose(our_loss, ref_loss, rtol=1e-4, atol=1e-6)

    # trained parameters agree (LSTM backward + Adam over 30 updates)
    flat = flatten_tree(ours.params)
    for k, v in ref_model.state_dict().items():
        np.testing.assert_allclose(np.asarray(flat[k]),
                                   v.detach().cpu().numpy(),
                                   rtol=1e-3, atol=1e-5, err_msg=k)

    # and so do post-fit predictions on held-out confs
    for L in (1, 2, 3, 4):
        for conf in _confs(rs, 2, L):
            want = float(ref_model.eval_model(conf.astype(np.float32), "cpu"))
            got = ours.eval_model(conf)
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
