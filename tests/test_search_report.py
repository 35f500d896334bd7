"""tools/search_report.py over real --search_state / --jsonl_log artifacts
from a tiny AVMNIST search."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_search_report_over_real_artifacts(tmp_path):
    sys.path.insert(0, REPO)
    from mfas_tpu.data.avmnist import make_synthetic_avmnist

    data = tmp_path / "data"
    make_synthetic_avmnist(str(data), n_train=48, n_test=16)
    state = tmp_path / "search.pkl"
    jsonl = tmp_path / "search.jsonl"

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    run = subprocess.run(
        [sys.executable, os.path.join(REPO, "main_searchable_avmnist.py"),
         "--datadir", str(data), "--checkpointdir", str(tmp_path),
         "--channels", "4", "--batchsize", "16", "--epochs", "1",
         "--inner_representation_size", "8", "--max_fusions", "2",
         "--search_iterations", "1", "--num_samples", "2",
         "--epochs_surrogate", "2", "--random_backbones", "--seed", "0",
         "--search_state", str(state), "--jsonl_log", str(jsonl)],
        env=env, capture_output=True, text=True, timeout=900)
    assert run.returncode == 0, run.stdout + run.stderr
    assert state.exists() and jsonl.exists()

    rep = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "search_report.py"),
         "--search_state", str(state), "--jsonl", str(jsonl), "--top", "3"],
        capture_output=True, text=True, timeout=120)
    assert rep.returncode == 0, rep.stdout + rep.stderr
    out = rep.stdout
    assert "Now listing best architectures" in out
    assert "unique (conf, acc) entries" in out
    assert "epnas_step" in out
    # the listed architectures carry real accuracies
    listing = out.split("Now listing best architectures")[1].strip()
    assert len(listing.splitlines()) >= 1
