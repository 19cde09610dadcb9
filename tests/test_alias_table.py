"""Alias-table property tests.

Port of the reference's only unit tests (data_structures.rs:1080-1158):
per-bin probability vs normalized weights, plus statistical validation of
100k samples against expected frequencies.
"""

import numpy as np

from lupinpathtracer_tpu.accel.alias_table import (
    build_alias_table,
    sample_alias_table_host,
)


def _check_probs(weights):
    weights = np.asarray(weights, np.float64)
    prob, thresh, alias = build_alias_table(weights)
    norm = weights / weights.sum()
    assert prob.shape == weights.shape
    np.testing.assert_allclose(prob, norm, atol=0.01)
    # Effective per-outcome probability implied by (threshold, alias):
    n = len(weights)
    eff = thresh.astype(np.float64) / n
    for i in range(n):
        if thresh[i] < 1.0:
            eff[alias[i]] += (1.0 - thresh[i]) / n
    np.testing.assert_allclose(eff, norm, atol=0.01)


def test_generic_weights():
    _check_probs([1.0, 2.0, 3.0, 4.0])
    _check_probs([0.5, 0.0, 1.5, 2.0, 10.0])


def test_uniform_weights():
    _check_probs([1.0] * 7)


def test_single_weight():
    prob, thresh, alias = build_alias_table([5.0])
    assert prob[0] == 1.0
    assert thresh[0] == 1.0


def test_empty_and_zero():
    for w in ([], [0.0, 0.0]):
        prob, thresh, alias = build_alias_table(w)
        assert prob.shape[0] == 0


def test_statistical(rng):
    weights = np.array([1.0, 5.0, 0.25, 2.75, 1.0], np.float64)
    prob, thresh, alias = build_alias_table(weights)
    n = 100_000
    idx = sample_alias_table_host(
        prob, thresh, alias, rng.random(n), rng.random(n)
    )
    freq = np.bincount(idx, minlength=len(weights)) / n
    np.testing.assert_allclose(freq, weights / weights.sum(), atol=0.01)
