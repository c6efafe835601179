"""Device-side 3D connected components (eval/cc.py) vs scipy ground truth.

The device labeler must produce the exact same component PARTITION as
scipy.ndimage.label(structure=ones((3,3,3))) — the reference's
skimage.label(connectivity=3) equivalent (utils_eval.py:489-503) — and the
size filter must keep/drop exactly the same voxels as the host
filter_3d_connected_components.
"""
import numpy as np
import pytest
import scipy.ndimage as ndi

from conditioned_diffusion_models_uad_tpu.eval.cc import (
    filter_3d_connected_components_device,
    label_components_3d,
)
from conditioned_diffusion_models_uad_tpu.eval.metrics import (
    filter_3d_connected_components,
)


def _partition_equal(mask: np.ndarray, dev_labels: np.ndarray) -> bool:
    """Same partition <=> the (scipy_label, device_label) pair mapping is a
    bijection over foreground voxels."""
    ref, n = ndi.label(mask, structure=np.ones((3, 3, 3), bool))
    fg = mask.astype(bool)
    pairs = set(zip(ref[fg].tolist(), dev_labels[fg].tolist()))
    return (
        len(pairs) == n
        and len({a for a, _ in pairs}) == n
        and len({b for _, b in pairs}) == n
    )


@pytest.mark.parametrize("density", [0.05, 0.2, 0.5, 0.8])
def test_labels_match_scipy_partition(density):
    rng = np.random.default_rng(int(density * 100))
    mask = rng.random((23, 31, 17)) < density
    labels = np.asarray(label_components_3d(mask))
    assert _partition_equal(mask, labels)
    # background voxels carry the sentinel N
    assert (labels[~mask] == mask.size).all()


def test_labels_snake_worst_case():
    # a single serpentine component whose geodesic diameter is ~H*W/2:
    # pointer jumping must converge far faster than diameter iterations
    mask = np.zeros((20, 20, 3), bool)
    for r in range(0, 20, 2):
        mask[r, :, 1] = True
    for r in range(0, 18, 4):  # right-edge connectors: rows 1, 5, 9, 13, 17
        mask[r + 1, 19, 1] = True
    for r in range(2, 18, 4):  # left-edge connectors: rows 3, 7, 11, 15
        mask[r + 1, 0, 1] = True
    labels = np.asarray(label_components_3d(mask))
    assert _partition_equal(mask, labels)
    assert len(np.unique(labels[mask])) == 1  # one component


@pytest.mark.parametrize("min_size", [1, 2, 8, 30])
def test_filter_matches_host(min_size):
    rng = np.random.default_rng(min_size)
    mask = rng.random((24, 28, 15)) < 0.25
    got = np.asarray(filter_3d_connected_components_device(mask, min_size))
    want = filter_3d_connected_components(mask.copy(), min_size=min_size)
    np.testing.assert_array_equal(got, want)


def test_filter_exact_size_boundary():
    mask = np.zeros((12, 12, 6), bool)
    mask[1, 1:8, 1] = True  # 7 voxels -> dropped at min_size=8 (ref <= 7)
    mask[5, 1:9, 3] = True  # 8 voxels -> kept
    got = np.asarray(filter_3d_connected_components_device(mask, 8))
    assert not got[1, :, 1].any()
    assert got[5, 1:9, 3].all()
    np.testing.assert_array_equal(
        got, filter_3d_connected_components(mask.copy(), min_size=8)
    )


def test_filter_empty_and_full():
    empty = np.zeros((8, 9, 7), bool)
    assert not np.asarray(filter_3d_connected_components_device(empty, 8)).any()
    full = np.ones((8, 9, 7), bool)
    np.testing.assert_array_equal(
        np.asarray(filter_3d_connected_components_device(full, 8)), full
    )
