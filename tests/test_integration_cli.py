"""Integration tests (SURVEY.md §4.6): 1-epoch AV-MNIST end-to-end and a
tiny full search through the real CLI entry points, on synthetic data."""

import sys

import numpy as np
import pytest

from mfas_tpu.data.avmnist import make_synthetic_avmnist


def run_cli(module, monkeypatch, argv):
    monkeypatch.setattr(sys, "argv", argv)
    module.main()


def test_main_found_avmnist_smoke(tmp_path, monkeypatch, capsys):
    import main_found_avmnist as m
    make_synthetic_avmnist(str(tmp_path / "data"), n_train=64, n_test=32)
    run_cli(m, monkeypatch, [
        "main_found_avmnist.py",
        "--datadir", str(tmp_path / "data"),
        "--checkpointdir", str(tmp_path),
        "--channels", "4", "--batchsize", "16", "--epochs", "1",
        "--inner_representation_size", "8",
        "--random_backbones", "--no-verbose", "--save_checkpoint",
    ])
    out = capsys.readouterr().out
    assert "Model Acc:" in out
    assert "Saved" in out

    # the saved checkpoint round-trips through --test_cp
    import glob, os
    saved = glob.glob(str(tmp_path / "final_avmnist_conf_*.checkpoint"))
    assert saved
    run_cli(m, monkeypatch, [
        "main_found_avmnist.py",
        "--datadir", str(tmp_path / "data"),
        "--checkpointdir", str(tmp_path),
        "--test_cp", os.path.basename(saved[0]),
        "--channels", "4", "--batchsize", "16",
        "--inner_representation_size", "8", "--no-verbose",
    ])
    assert "Model Acc:" in capsys.readouterr().out


@pytest.mark.parametrize("extra", [(), ("--use_dataparallel",)],
                         ids=["single", "dataparallel_mesh"])
def test_main_found_mmimdb_smoke(tmp_path, monkeypatch, capsys, extra):
    import jax

    import main_found_mmimdb as m
    from mfas_tpu.data.mm_imdb import make_synthetic_mmimdb
    if extra and len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    for stage, n in (("train", 16), ("dev", 8), ("test", 8)):
        make_synthetic_mmimdb(str(tmp_path / "data"), stage, n=n,
                              feat_dim=300, num_labels=23)
    run_cli(m, monkeypatch, [
        "main_found_mmimdb.py",
        "--datadir", str(tmp_path / "data"),
        "--checkpointdir", str(tmp_path),
        "--model", "simplevt", "--channels", "4", "--text_first_hidden", "8",
        "--batchsize", "8", "--epochs", "1",
        "--train_size", "16", "--dev_size", "8", "--test_size", "8",
        "--no-verbose", *extra,
    ])
    out = capsys.readouterr().out
    assert "Model F1:" in out


def test_main_found_cifar_smoke(tmp_path, monkeypatch, capsys):
    import main_found_cifar as m
    from mfas_tpu.data.cifar import make_synthetic_cifar
    make_synthetic_cifar(str(tmp_path), n_per_batch=10)
    run_cli(m, monkeypatch, [
        "main_found_cifar.py",
        "--data_dir", str(tmp_path), "--checkpointdir", str(tmp_path),
        "--batchsize", "8", "--planes", "8", "--net_str", "1", "2", "1",
        "--epochs", "1", "--no-verbose", "--use_intermediate",
    ])
    out = capsys.readouterr().out
    assert "Model Acc:" in out


def test_main_searchable_avmnist_tiny_search(tmp_path, monkeypatch, capsys):
    import main_searchable_avmnist as m
    make_synthetic_avmnist(str(tmp_path / "data"), n_train=64, n_test=16)
    run_cli(m, monkeypatch, [
        "main_searchable_avmnist.py",
        "--datadir", str(tmp_path / "data"),
        "--checkpointdir", str(tmp_path),
        "--channels", "4", "--batchsize", "16", "--epochs", "1",
        "--inner_representation_size", "8",
        "--max_fusions", "2", "--search_iterations", "1",
        "--num_samples", "2", "--epochs_surrogate", "3",
        "--random_backbones", "--no-verbose", "--seed", "0",
        "--jsonl_log", str(tmp_path / "events.jsonl"),
        "--search_state", str(tmp_path / "state.pkl"),
    ])
    out = capsys.readouterr().out
    assert "Search complete" in out
    assert "Now listing best architectures" in out
    assert (tmp_path / "events.jsonl").exists()
    assert (tmp_path / "state.pkl").exists()
