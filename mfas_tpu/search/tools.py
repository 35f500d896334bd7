"""Search-space exploration primitives.

These stay in **host numpy** with the reference's exact formulas and RNG
call order (global ``np.random``), because BASELINE.json requires the
surrogate + temperature sampling preserved bit-for-bit in ranking behavior
(reference models/search/tools.py; SURVEY.md §7.3 hard part 2). Only
candidate *training* runs on device.
"""

from __future__ import annotations

import random

import numpy as np


def predict_accuracies_with_surrogate(configurations, surrogate):
    """Surrogate scores for a conf list (reference tools.py:22-30).
    ``surrogate`` is a mfas_tpu.search.surrogate.SimpleRecurrentSurrogate
    bound to its params. Scoring is batched into one device dispatch when
    the surrogate supports it (the reference loops per conf — same
    values, K*32 fewer dispatches per search level); stub surrogates
    without ``eval_models`` keep the per-conf path."""
    if hasattr(surrogate, "eval_models"):
        return surrogate.eval_models(configurations)
    return [surrogate.eval_model(np.asarray(c)) for c in configurations]


def update_surrogate_dataloader(surrogate_dataloader, configurations, accuracies):
    for conf, acc in zip(configurations, accuracies):
        surrogate_dataloader.add_datum(np.asarray(conf), float(acc))


def train_surrogate(surrogate, surrogate_dataloader, args):
    """Retrain the surrogate on all collected (conf, acc) pairs; returns the
    final epoch's loss (reference tools.py:38-44)."""
    confs, accs = surrogate_dataloader.get_data()
    return surrogate.fit(confs, accs, num_epochs=args.epochs_surrogate,
                         lr=args.lr_surrogate)


def sample_k_configurations(configurations, accuracies_, k, temperature):
    """Temperature-sharpened sampling without replacement, p ∝ acc^(1/T)
    (reference tools.py:47-56). Uses the *global* numpy RNG in the same
    call order as the reference so seeded traces match."""
    accuracies = np.array(accuracies_)
    p = accuracies / accuracies.sum()
    powered = pow(p, 1.0 / temperature)
    p = powered / powered.sum()

    indices = np.random.choice(len(configurations), k, replace=False, p=p)
    return [configurations[i] for i in indices]


def sample_k_configurations_uniform(configurations, k):
    indices = np.random.choice(len(configurations), k)
    return [configurations[i] for i in indices]


def merge_unfolded_with_sampled(previous_top_k_configurations,
                                unfolded_configurations, layer):
    """Unfold step of the progressive search (reference tools.py:66-97):
    row-substitute when layer < len(prev), else append the new row; the
    very first call expands each single row into a (1,3) conf."""
    merged = []
    if not previous_top_k_configurations:
        if layer != 0:
            raise ValueError(
                "merge_unfolded_with_sampled: no previous configurations "
                "but layer != 0")
        for unfolded_conf in unfolded_configurations:
            merged.append(np.expand_dims(np.asarray(unfolded_conf), 0))
    else:
        for prev_conf in previous_top_k_configurations:
            for unfolded_conf in unfolded_configurations:
                if layer < len(prev_conf):
                    new_conf = np.copy(prev_conf)
                    new_conf[layer] = unfolded_conf
                else:
                    new_conf = np.concatenate(
                        [prev_conf, np.expand_dims(np.asarray(unfolded_conf), 0)], 0)
                merged.append(new_conf)
    return merged


def sample_k_configurations_directly(k, max_progression_levels,
                                     get_possible_layer_configurations_fun,
                                     legacy_bug: bool = False):
    """Random-search sampler (reference tools.py:100-118). The reference
    indexes the possible-conf table with a stale loop variable
    (tools.py:112, SURVEY §2 bug list) which makes every layer draw from
    the *last* layer's space; ``legacy_bug=True`` reproduces that, the
    default samples each layer from its own space."""
    configurations = []
    possible = [get_possible_layer_configurations_fun(l)
                for l in range(max_progression_levels)]
    stale = max_progression_levels - 1

    for _ in range(k):
        num_layers_sample = random.randint(1, max_progression_levels)
        conf = []
        for layer in range(num_layers_sample):
            idx = stale if legacy_bug else layer
            conf.append(sample_k_configurations_uniform(possible[idx], 1))
        configurations.append(np.array(conf)[:, 0, :])
    return configurations


def compute_temperature(iteration, args):
    """(T0-Tf)*exp(-(it+1)^2/sigma^2)+Tf (reference tools.py:121-124)."""
    return (args.initial_temperature - args.final_temperature) * np.exp(
        -(iteration + 1.0) ** 2 / args.temperature_decay ** 2
    ) + args.final_temperature
