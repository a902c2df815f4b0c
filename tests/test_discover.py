"""User-data discovery pipeline: data/io loading + the discover() API + CLI.

The reference has no external-data entry beyond a hardcoded
``np.load('henon.npy')`` (``/root/reference/author_CRVAE.py:722-729``);
``discover`` is the framework's bring-your-own-series surface, so these
tests pin the whole contract: file formats, shapes, stability voting,
phase-2 generation, and the CLI artifact layout.
"""

import json
import pathlib

import jax
import numpy as np
import pytest

from vae_connexe_tpu.data import var_process, var_truth
from vae_connexe_tpu.data.io import load_series
from vae_connexe_tpu.discover import discover


@pytest.fixture(scope="module")
def var_series():
    a = var_truth(5)
    series = np.asarray(var_process(jax.random.key(0), a, n=1, t=1200))[0]
    return series, np.asarray(a > 0).astype(int)


# ---------------------------------------------------------------------------
# data/io.load_series
# ---------------------------------------------------------------------------

class TestLoadSeries:
    def test_npy_roundtrip(self, tmp_path, var_series):
        series, _ = var_series
        p = tmp_path / "s.npy"
        np.save(p, series)
        loaded, names = load_series(str(p))
        np.testing.assert_array_equal(loaded, series.astype(np.float32))
        assert names is None

    def test_npz_prefers_series_key(self, tmp_path, var_series):
        series, _ = var_series
        p = tmp_path / "s.npz"
        np.savez(p, other=np.zeros(3), series=series)
        loaded, _ = load_series(str(p))
        np.testing.assert_array_equal(loaded, series.astype(np.float32))

    def test_csv_with_header(self, tmp_path, var_series):
        series, _ = var_series
        p = tmp_path / "s.csv"
        hdr = ",".join(f"var{i}" for i in range(series.shape[1]))
        np.savetxt(p, series, delimiter=",", header=hdr, comments="")
        loaded, names = load_series(str(p))
        assert names == [f"var{i}" for i in range(series.shape[1])]
        np.testing.assert_allclose(loaded, series, rtol=1e-5)

    def test_csv_headerless_and_tsv(self, tmp_path, var_series):
        series, _ = var_series
        p = tmp_path / "s.csv"
        np.savetxt(p, series, delimiter=",")
        loaded, names = load_series(str(p))
        assert names is None and loaded.shape == series.shape
        p2 = tmp_path / "s.tsv"
        np.savetxt(p2, series, delimiter="\t")
        loaded2, _ = load_series(str(p2))
        np.testing.assert_allclose(loaded2, loaded, rtol=1e-5)

    def test_whitespace_txt(self, tmp_path, var_series):
        series, _ = var_series
        p = tmp_path / "s.txt"
        np.savetxt(p, series)
        loaded, _ = load_series(str(p))
        np.testing.assert_allclose(loaded, series, rtol=1e-5)

    def test_raw_f32_needs_shape(self, tmp_path, var_series):
        series, _ = var_series
        p = tmp_path / "s.f32"
        series.astype(np.float32).tofile(p)
        with pytest.raises(ValueError, match="shape"):
            load_series(str(p))
        loaded, _ = load_series(str(p), shape=series.shape)
        np.testing.assert_array_equal(loaded, series.astype(np.float32))
        with pytest.raises(ValueError, match="float32 values"):
            load_series(str(p), shape=(7, 7))

    def test_rejects_nan_and_bad_shapes(self, tmp_path):
        p = tmp_path / "bad.npy"
        np.save(p, np.array([[1.0, np.nan]] * 20))
        with pytest.raises(ValueError, match="non-finite"):
            load_series(str(p))
        np.save(p, np.zeros((2, 2, 2, 2)))
        with pytest.raises(ValueError, match=r"\(T, p\)"):
            load_series(str(p))
        np.save(p, np.zeros((3, 4)))          # too few time steps
        with pytest.raises(ValueError, match="time steps"):
            load_series(str(p))
        with pytest.raises(FileNotFoundError):
            load_series(str(tmp_path / "missing.npy"))

    def test_header_width_mismatch(self, tmp_path):
        p = tmp_path / "s.csv"
        p.write_text("a,b,c\n" + "\n".join("1,2" for _ in range(20)) + "\n")
        with pytest.raises(ValueError, match="header"):
            load_series(str(p))

    def test_1d_becomes_column(self, tmp_path):
        p = tmp_path / "s.npy"
        np.save(p, np.arange(64, dtype=np.float32))
        loaded, _ = load_series(str(p))
        assert loaded.shape == (64, 1)


# ---------------------------------------------------------------------------
# discover()
# ---------------------------------------------------------------------------

class TestDiscover:
    def test_single_seed_recovers_var_structure(self, var_series):
        series, truth = var_series
        res = discover(series, context=10, max_iter=400, batch_size=128,
                       seed=0)
        assert res.gc.shape == truth.shape
        assert res.scores.shape == truth.shape
        assert res.votes is None and res.seed_scores is None
        assert res.params is not None
        # The VAR(1) task is easy: most cells should agree with the truth.
        agree = (res.gc == truth).mean()
        assert agree >= 0.8, f"GC agreement {agree} vs VAR truth"
        # The diagonal (self-edges) carries the strongest VAR coefficients.
        assert res.gc.diagonal().mean() >= 0.8

    def test_stability_selection_path(self, var_series):
        series, truth = var_series
        res = discover(series, context=10, max_iter=300, batch_size=128,
                       seeds=3)
        assert res.votes is not None and res.votes.shape == truth.shape
        assert res.seed_scores.shape == (3,) + truth.shape
        assert 0.5 <= res.threshold <= 0.95     # vote threshold, auto-clamped
        assert set(np.unique(res.gc)) <= {0, 1}
        # Median-of-seeds scores are reported.
        np.testing.assert_allclose(
            res.scores, np.median(res.seed_scores, axis=0), rtol=1e-6)

    def test_generate_phase2(self, var_series):
        series, _ = var_series
        res = discover(series, context=10, max_iter=150, batch_size=64,
                       generate=8, phase2_iters=100)
        assert res.samples.shape == (8, 21, series.shape[1])
        assert np.isfinite(res.samples).all()
        assert res.err_params is not None
        assert any(k.startswith("phase2_") for k in res.metrics)

    def test_3d_stack_pools_windows(self, var_series):
        _, truth = var_series
        a = var_truth(5)
        stack = np.asarray(var_process(jax.random.key(1), a, n=4, t=300))
        res = discover(stack, context=10, max_iter=150, batch_size=64)
        assert res.gc.shape == truth.shape

    def test_named_edges_sorted(self, var_series):
        series, _ = var_series
        names = [f"v{i}" for i in range(series.shape[1])]
        res = discover(series, context=10, max_iter=150, batch_size=64,
                       names=names)
        edges = res.edges()
        assert all(e[0] in names and e[1] in names for e in edges)
        scores = [e[2] for e in edges]
        assert scores == sorted(scores, reverse=True)

    def test_fixed_threshold_and_validation(self, var_series):
        series, _ = var_series
        res = discover(series, context=10, max_iter=100, batch_size=64,
                       threshold=1e9)
        assert res.gc.sum() == 0 and res.threshold == 1e9
        with pytest.raises(ValueError, match="context"):
            discover(series[:8], context=10, max_iter=10)
        with pytest.raises(ValueError, match="names"):
            discover(series, context=10, max_iter=10, names=["only-one"])
        with pytest.raises(ValueError, match="enc_len"):
            discover(series, context=10, enc_len=10, max_iter=10)
        with pytest.raises(ValueError, match="empty"):
            discover(series, context=10, max_iter=50, batch_size=64,
                     threshold=1e9, generate=4)


class TestDiscoverWinFamily:
    def test_win_single_seed(self, var_series):
        series, truth = var_series
        res = discover(series, context=10, max_iter=120, batch_size=128,
                       family="win")
        assert res.scores.shape == truth.shape
        assert set(np.unique(res.gc)) <= {0, 1}
        assert np.isfinite(res.scores).all()
        # W_in norms: diagonal (self) rows dominate in a VAR(1) process.
        assert res.scores.diagonal().mean() > np.median(res.scores)

    def test_win_stability_and_generate(self, var_series):
        series, truth = var_series
        res = discover(series, context=10, max_iter=80, batch_size=128,
                       family="win", prox="element", seeds=3, generate=6)
        assert res.votes is not None and res.votes.shape == truth.shape
        assert res.seed_scores.shape == (3,) + truth.shape
        # win generation conditions on 2τ windows of the series.
        assert res.samples.shape == (6, 10, series.shape[1])
        assert np.isfinite(res.samples).all()

    def test_win_seed0_in_vmap_matches_sequential(self, var_series):
        """The unified sweep trains seed 0 INSIDE the vmapped program with
        the exact init/run keys the sequential path uses — its scores must
        match the seeds=1 run (up to vmap-batched float reassociation)."""
        series, _ = var_series
        kw = dict(context=10, max_iter=60, batch_size=128, family="win",
                  seed=3)
        seq = discover(series, **kw)
        swept = discover(series, seeds=3, **kw)
        np.testing.assert_allclose(swept.seed_scores[0], seq.scores,
                                   rtol=1e-4, atol=1e-5)

    def test_win_mesh_shards_seed_axis(self, var_series, eight_devices):
        """mesh= for the win family: the stability sweep's seed axis shards
        over dp, results equal the unsharded sweep."""
        from vae_connexe_tpu.parallel import make_mesh

        series, _ = var_series
        kw = dict(context=10, max_iter=40, batch_size=128, family="win",
                  seeds=4)
        plain = discover(series, **kw)
        meshed = discover(series, mesh=make_mesh(n_dp=4, n_ep=1), **kw)
        np.testing.assert_allclose(meshed.seed_scores, plain.seed_scores,
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(meshed.gc, plain.gc)

    def test_family_validation(self, var_series):
        series, _ = var_series
        with pytest.raises(ValueError, match="family"):
            discover(series, context=10, max_iter=10, family="mystery")
        with pytest.raises(ValueError, match="win"):
            discover(series, context=10, max_iter=10, prox="row")
        # win + mesh needs the seed axis to shard (no sharded single fit).
        with pytest.raises(ValueError, match="seeds > 1"):
            discover(series, context=10, max_iter=10, family="win",
                     mesh=object())


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------

class TestDiscoverCli:
    def test_cli_end_to_end(self, tmp_path, var_series, capsys):
        from vae_connexe_tpu.cli import main

        series, _ = var_series
        data = tmp_path / "mine.csv"
        hdr = ",".join(f"x{i}" for i in range(series.shape[1]))
        np.savetxt(data, series, delimiter=",", header=hdr, comments="")
        out = tmp_path / "out"
        main(["discover", str(data), "--context", "10", "--iters", "150",
              "--batch", "64", "--out-dir", str(out), "--quiet"])
        summary = json.loads(capsys.readouterr().out)
        assert summary["variables"] == [f"x{i}" for i in range(series.shape[1])]
        assert summary["n_edges"] == len(summary["edges"])
        stem = "mine"
        for f in (f"GC_{stem}.npy", f"GC_scores_{stem}.npy",
                  f"discovery_{stem}.png", f"discovery_{stem}.json"):
            assert (out / f).exists(), f
        saved = json.loads((out / f"discovery_{stem}.json").read_text())
        assert saved["threshold"] == summary["threshold"]
        gc = np.load(out / f"GC_{stem}.npy")
        assert gc.shape == (series.shape[1], series.shape[1])

    def test_cli_seeds_and_generate(self, tmp_path, var_series, capsys):
        from vae_connexe_tpu.cli import main

        series, _ = var_series
        data = tmp_path / "s.npy"
        np.save(data, series)
        out = tmp_path / "out2"
        main(["discover", str(data), "--context", "10", "--iters", "100",
              "--batch", "64", "--seeds", "2", "--generate", "4",
              "--phase2-iters", "60", "--out-dir", str(out), "--quiet"])
        summary = json.loads(capsys.readouterr().out)
        assert summary["seeds"] == 2
        assert (out / "GC_votes_s.npy").exists()
        gen = np.load(out / "generated_s.npy")
        assert gen.shape[0] == 4 and np.isfinite(gen).all()


def test_vote_confidence_pins_committed_artifacts():
    """The confidence scale is calibrated by the two committed foreign-data
    systems (results/discover_demo, round 4): NARMA — recovered at
    votes-AUROC 0.989 — reads HIGH; the Rössler ring — 63 edges selected vs
    24 true, every seed agreeing on a dense graph — reads LOW.  The failure
    mode is confidently-dense agreement, which is why the signal is the
    ruled-OUT candidate mass, not the vote-spectrum gap (the gap is higher
    on Rössler)."""
    import pathlib

    from vae_connexe_tpu.evals import vote_confidence

    demo = pathlib.Path(__file__).parent.parent / "results" / "discover_demo"
    narma = np.load(demo / "GC_votes_narma.npy")
    rossler = np.load(demo / "GC_votes_rossler.npy")
    assert vote_confidence(narma) >= 0.7
    assert vote_confidence(rossler) <= 0.3


def test_discover_confidence_field():
    """seeds > 1 fills DiscoveryResult.confidence with the ruled-out
    candidate fraction; a single-seed run has no ensemble, hence None."""
    a = var_truth(4)
    series = np.asarray(var_process(jax.random.key(0), a, n=1, t=400))[0]
    res = discover(series, context=10, hidden=12, max_iter=40,
                   batch_size=32, seeds=4)
    assert res.confidence is not None and 0.0 <= res.confidence <= 1.0
    res1 = discover(series, context=10, hidden=12, max_iter=40,
                    batch_size=32, seeds=1)
    assert res1.confidence is None


def test_discover_diff_preprocessing():
    """diff=True first-differences along time before standardizing — the
    structural lever for smooth flows — and equals discovery on a manually
    differenced series (same keys)."""
    a = var_truth(4)
    series = np.asarray(var_process(jax.random.key(1), a, n=1, t=400))[0]
    res_d = discover(series, context=10, hidden=12, max_iter=30,
                     batch_size=32, diff=True)
    res_m = discover(np.diff(series, axis=0), context=10, hidden=12,
                     max_iter=30, batch_size=32)
    np.testing.assert_allclose(res_d.scores, res_m.scores, rtol=1e-6)
    np.testing.assert_array_equal(res_d.gc, res_m.gc)


def test_cli_discover_warns_on_low_confidence(tmp_path, capsys, monkeypatch):
    """cli discover prints the distrust warning (stderr) when the ensemble
    confidence is low, and includes confidence in the JSON summary — the
    Rössler failure reaches users as a warning, not a confident graph."""
    import json as _json

    import sys as _sys

    from vae_connexe_tpu import cli
    # the package __init__ rebinds the attribute `vae_connexe_tpu.discover`
    # to the function; fetch the module itself
    discover_mod = _sys.modules["vae_connexe_tpu.discover"]

    p = 4
    rng = np.random.default_rng(0)
    csv = tmp_path / "dense.csv"
    np.savetxt(csv, rng.standard_normal((64, p)).astype(np.float32),
               delimiter=",")

    fake = discover_mod.DiscoveryResult(
        scores=np.ones((p, p), np.float32),
        gc=np.ones((p, p), np.int32), threshold=0.9,
        votes=np.ones((p, p), np.float32), seed_scores=None, params=None,
        model=None, names=None, metrics={}, confidence=0.2)
    monkeypatch.setattr(discover_mod, "discover", lambda *a, **k: fake)
    cli.main(["discover", str(csv), "--seeds", "4", "--quiet"])
    out = capsys.readouterr()
    assert "WARNING: low discovery confidence" in out.err
    assert "--diff" in out.err
    assert _json.loads(out.out)["confidence"] == 0.2
