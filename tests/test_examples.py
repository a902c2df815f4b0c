"""The foreign-data demo's generators (examples/discover_foreign.py).

The demo's point is that these systems live OUTSIDE the framework — but
their stability and truth layout must stay pinned, or the committed
results/discover_demo artifacts silently desynchronize from the script.
"""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "examples"))

from discover_foreign import (  # noqa: E402
    narma_adjacency,
    narma_network,
    rossler_ring,
    rossler_truth,
)


def test_narma_network_stable_and_truthful():
    series, truth = narma_network(10, 2000)
    assert series.shape == (2000, 10)
    assert np.isfinite(series).all()
    assert np.abs(series).max() < 10          # bounded dynamics
    assert series.std(axis=0).min() > 0.05    # every node actually moves
    np.testing.assert_array_equal(truth, narma_adjacency(10))
    assert (np.diag(truth) == 1).all()        # autoregressive self-loops
    # ring parents present
    for j in range(10):
        assert truth[j, (j - 1) % 10] == 1


def test_narma_deterministic_per_seed():
    a, _ = narma_network(6, 500, seed=3)
    b, _ = narma_network(6, 500, seed=3)
    np.testing.assert_array_equal(a, b)
    c, _ = narma_network(6, 500, seed=4)
    assert not np.array_equal(a, c)


def test_rossler_ring_shapes_and_truth():
    series = rossler_ring(3, 400, eps=0.5)
    assert series.shape == (400, 9)
    assert np.isfinite(series).all()
    truth = rossler_truth(3)
    assert truth.shape == (9, 9)
    # per-oscillator block structure: x <- {x, y, z, x_prev}; y <- {x, y};
    # z <- {x, z}
    assert truth.sum() == 3 * 8
    x0, y0, z0 = 0, 1, 2
    assert truth[x0, [x0, y0, z0]].all() and truth[x0, 6] == 1  # x2 -> x0
    assert truth[y0, x0] == 1 and truth[y0, y0] == 1
    assert truth[z0, x0] == 1 and truth[z0, z0] == 1
