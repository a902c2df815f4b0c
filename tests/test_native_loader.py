"""Native C++ window loader: parity with the pure-numpy/JAX window path."""

import shutil

import numpy as np
import pytest

if shutil.which("g++") is None:
    pytest.skip("no C++ toolchain", allow_module_level=True)

from vae_connexe_tpu.data.native_loader import NativeWindowLoader


@pytest.fixture(scope="module")
def series():
    return np.random.default_rng(0).normal(size=(2000, 5)).astype(np.float32)


def test_file_backed_gather_matches_numpy(series, tmp_path_factory):
    path = tmp_path_factory.mktemp("wl") / "series.f32"
    series.tofile(path)
    with NativeWindowLoader.from_file(str(path), *series.shape) as loader:
        idx = np.array([0, 7, 1979], dtype=np.int64)
        batch = loader.gather(idx, 20)
        expected = np.stack([series[i:i + 20] for i in idx])
        np.testing.assert_array_equal(batch, expected)


def test_shifted_targets_match_arrange_input_contract(series):
    with NativeWindowLoader.from_array(series) as loader:
        idx = np.array([3, 100], dtype=np.int64)
        inp, tgt = loader.gather_shifted(idx, 15)
        np.testing.assert_array_equal(inp, np.stack([series[i:i + 15] for i in idx]))
        np.testing.assert_array_equal(tgt, np.stack([series[i + 1:i + 16] for i in idx]))


def test_standardize_matches_host(series):
    with NativeWindowLoader.from_array(series) as loader:
        loader.standardize()
        full = loader.gather(np.zeros(1, np.int64), series.shape[0])[0]
    expected = (series - series.mean(0)) / (series.std(0) + 1e-8)
    np.testing.assert_allclose(full, expected, atol=1e-4)


def test_window_counts_match_pure_paths(series):
    """Plain count == sliding_windows (T-ctx+1); shifted == arrange_input
    (T-ctx); the LAST plain window is reachable."""
    t = series.shape[0]
    with NativeWindowLoader.from_array(series) as loader:
        assert loader.num_windows(20) == t - 20 + 1
        assert loader.num_windows(20, shifted=True) == t - 20
        last = loader.gather(np.array([t - 20], np.int64), 20)[0]
        np.testing.assert_array_equal(last, series[t - 20:])
        # The same start is out of range for shifted pairs.
        with pytest.raises(IndexError):
            loader.gather_shifted(np.array([t - 20], np.int64), 20)


def test_out_of_range_raises(series):
    with NativeWindowLoader.from_array(series) as loader:
        with pytest.raises(IndexError):
            loader.gather(np.array([series.shape[0] - 5], np.int64), 20)


def test_sample_batch_shapes(series):
    with NativeWindowLoader.from_array(series) as loader:
        b = loader.sample_batch(np.random.default_rng(1), 17, 9)
        assert b.shape == (17, 9, 5)
        assert np.isfinite(b).all()


def test_bad_file_raises(tmp_path):
    short = tmp_path / "short.f32"
    short.write_bytes(b"\x00" * 16)   # far too small for (100, 5)
    with pytest.raises(OSError):
        NativeWindowLoader.from_file(str(short), 100, 5)
