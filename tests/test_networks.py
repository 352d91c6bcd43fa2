"""Selection-network generator tests: exactness of the min/max medians."""

import numpy as np
import pytest

from dips_tpu.ops import networks


@pytest.mark.parametrize("n", list(range(1, 17)) + [25, 49])
def test_sorting_network_sorts(n):
    r = np.random.default_rng(n)
    for _ in range(20):
        x = r.standard_normal(n).astype(np.float32)
        vals = list(x)
        out = networks.apply_network(
            vals, [(i, j, True, True) for i, j in networks.sorting_network(n)],
            np.minimum, np.maximum)
        np.testing.assert_array_equal(np.array(out), np.sort(x))


@pytest.mark.parametrize("n", list(range(1, 17)) + [25, 49])
def test_median_network_exact(n):
    r = np.random.default_rng(100 + n)
    # vector planes, duplicates included (uint8-like values)
    x = r.integers(0, 8, (n, 64)).astype(np.float32)
    med = networks.median_of(list(x), np.minimum, np.maximum)
    expected = np.sort(x, axis=0)[n // 2]
    np.testing.assert_array_equal(med, expected)


def test_pruning_shrinks_network():
    full = networks.sorting_network(49)
    pruned = networks.median_network(49)
    assert len(pruned) < len(full)
    # and single-sided ops exist (min-only or max-only)
    assert any(not (m and M) for (_, _, m, M) in pruned)
