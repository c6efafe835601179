"""Randomized parity fuzz for the device metrics kernels.

The sorted-foundation kernels (one unstable `lax.sort` + cumulative-scan
group aggregates, eval/metrics.py) promise results INVARIANT to the unstable
sort's within-tie permutation and equal to the host references. A round-2
review found an AP tie-boundary defect the fixture-based tests missed because
their tie structure never put positives inside a tie group — this file closes
that class: many random draws over tie quantization levels, positive rates,
and degenerate shapes, each checked against sklearn / numpy / the host
greedy search.
"""
import numpy as np
import pytest
from sklearn.metrics import average_precision_score, roc_auc_score

from conditioned_diffusion_models_uad_tpu.eval.metrics import (
    find_best_val,
    find_best_val_device,
    quantiles_device,
    seg_metrics_device,
)


def _random_case(rng):
    n = int(rng.integers(64, 30000))
    rate = float(rng.uniform(0.002, 0.5))
    y = rng.uniform(size=n) < rate
    if not y.any():
        y[int(rng.integers(n))] = True
    if y.all():
        y[int(rng.integers(n))] = False
    x = (y * rng.uniform(0.0, 0.6) + rng.uniform(size=n)).astype(np.float32)
    # tie structure: quantize to a random grid, and zero a random fraction
    levels = int(rng.choice([0, 4, 16, 64, 1024]))
    if levels:
        x = np.round(x * levels).astype(np.float32) / levels
    zero_frac = float(rng.choice([0.0, 0.1, 0.5]))
    if zero_frac:
        x[rng.uniform(size=n) < zero_frac] = 0.0
    return x, y


@pytest.mark.parametrize("seed", range(12))
def test_seg_metrics_fuzz_vs_sklearn(seed):
    rng = np.random.default_rng(100 + seed)
    x, y = _random_case(rng)
    auc_d, ap_d, bd_d, bt_d = seg_metrics_device(x, y)
    assert auc_d == pytest.approx(roc_auc_score(y, x), abs=2e-5)
    assert ap_d == pytest.approx(average_precision_score(y, x), abs=2e-5)
    bd_h, bt_h = find_best_val(x, y, val_range=(0, float(x.max())), max_steps=10)
    assert bd_d == pytest.approx(bd_h, abs=1e-5)
    assert bt_d == pytest.approx(bt_h, abs=1e-5)


@pytest.mark.parametrize("seed", range(6))
def test_pooled_greedy_search_fuzz(seed):
    rng = np.random.default_rng(300 + seed)
    x, y = _random_case(rng)
    bd_d, bt_d = find_best_val_device(x, y, val_range=(0.0, float(x.max())))
    bd_h, bt_h = find_best_val(x, y, val_range=(0.0, float(x.max())), max_steps=10)
    assert bd_d == pytest.approx(bd_h, abs=1e-5)
    assert bt_d == pytest.approx(bt_h, abs=1e-5)


@pytest.mark.parametrize("seed", range(6))
def test_quantiles_fuzz_vs_numpy(seed):
    rng = np.random.default_rng(500 + seed)
    x, _ = _random_case(rng)
    qs = (0.99, 0.95, 0.90, 0.5)
    got = np.asarray(quantiles_device(x, qs))
    want = np.quantile(x.astype(np.float64), qs)
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-5)


def test_seg_metrics_all_tied():
    """One global tie group: AUROC must be 1/2 (pure chance), AP must equal
    the prevalence, invariant to the unstable sort order."""
    x = np.full(5000, 0.25, np.float32)
    y = np.zeros(5000, bool)
    y[:500] = True
    auc_d, ap_d, _, _ = seg_metrics_device(x, y)
    assert auc_d == pytest.approx(0.5, abs=1e-6)
    assert ap_d == pytest.approx(0.1, abs=1e-6)


def test_seg_metrics_tiny_input():
    x = np.array([0.0, 0.5, 0.5, 1.0], np.float32)
    y = np.array([0, 0, 1, 1], bool)
    auc_d, ap_d, _, _ = seg_metrics_device(x, y)
    assert auc_d == pytest.approx(roc_auc_score(y, x), abs=1e-6)
    assert ap_d == pytest.approx(average_precision_score(y, x), abs=1e-6)
