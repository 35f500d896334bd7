"""CLI flag/default parity with the reference entry points (BASELINE.json:
"keep their CLI flags"; reference main_found_ntu.py:24-69 and
main_searchable_ntu.py:16-63)."""

import sys

import pytest


def parse(module, monkeypatch, extra=()):
    monkeypatch.setattr(sys, "argv", [module.__name__ + ".py", *extra])
    return module.parse_args()


def test_main_found_ntu_defaults(monkeypatch):
    import main_found_ntu as m
    a = parse(m, monkeypatch)
    assert a.ske_cp == "skeleton_32frames_85.24.checkpoint"
    assert a.rgb_cp == "rgb_8frames_83.91.checkpoint"
    assert a.test_cp == ""
    assert a.num_outputs == 60
    assert a.batchsize == 20
    assert a.inner_representation_size == 256
    assert a.epochs == 70
    assert a.eta_max == 0.001 and a.eta_min == 0.000001
    assert a.Ti == 5 and a.Tm == 2
    assert a.num_workers == 16
    assert a.modality == "both"
    assert a.verbose is True and a.multitask is True
    assert a.weightsharing is False and a.alphas is False
    assert a.batchnorm is False
    assert tuple(a.vid_len) == (8, 32)
    assert a.drpt == 0.4
    assert a.no_bad_skel is False and a.no_norm is False
    assert a.conf == 1

    # flag spellings from the reference work
    a2 = parse(m, monkeypatch, ["--no-verbose", "--no-multitask",
                                "--batchnorm", "--alphas", "--conf", "4",
                                "--vid_len", "8", "32", "--j", "4"])
    assert a2.verbose is False and a2.multitask is False
    assert a2.batchnorm and a2.alphas and a2.conf == 4
    assert a2.num_workers == 4


def test_main_searchable_ntu_defaults(monkeypatch):
    import main_searchable_ntu as m
    a = parse(m, monkeypatch)
    assert a.ske_cp == "skeleton_32frames_83.42"
    assert a.rgb_cp == "rgb_8frames_82.14"
    assert a.batchsize == 20
    assert a.inner_representation_size == 16
    assert a.epochs == 3
    assert a.lr_surrogate == 0.001 and a.epochs_surrogate == 50
    assert a.Ti == 1 and a.Tm == 2
    assert a.max_progression_levels == 4       # --max_fusions
    assert a.search_iterations == 3
    assert a.num_samples == 15
    assert a.initial_temperature == 10.0
    assert a.final_temperature == 0.2
    assert a.temperature_decay == 4.0
    assert a.verbose is True
    assert a.multitask is False                 # store_true here
    assert a.drpt == 0.5

    a2 = parse(m, monkeypatch, ["--max_fusions", "2", "--multitask"])
    assert a2.max_progression_levels == 2 and a2.multitask is True


def test_found_conf_table_matches_reference(monkeypatch):
    """Conf table 0..4 (reference main_found_ntu.py:173-182)."""
    import numpy as np
    import main_found_ntu as m
    want = {
        0: [[2, 2, 0], [1, 0, 1], [3, 2, 0], [3, 1, 1]],
        1: [[3, 0, 0], [1, 3, 0], [1, 1, 1], [3, 3, 0]],
        2: [[3, 2, 0], [2, 3, 1], [0, 1, 1], [3, 0, 0]],
        3: [[1, 1, 1], [3, 2, 0], [0, 1, 1], [3, 0, 0]],
        4: [[3, 1, 1], [1, 3, 0], [1, 1, 1], [3, 3, 0]],
    }
    for k, v in want.items():
        np.testing.assert_array_equal(m.FOUND_CONFS[k], np.array(v))
