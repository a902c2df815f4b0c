"""Serving-artifact export: jax.export roundtrip, parity, CLI.

The reference has no deployment path (no ``torch.save`` anywhere —
SURVEY.md §5); ``vae_connexe_tpu.serving`` exports the compensated
generator (``author_CRVAE.py:682-684`` + ``:284-286``) as a self-contained
StableHLO artifact.  These tests pin: byte-level container format, exact
parity with the in-process ``generate_with_compensation``, determinism,
cross-process usability (no model code), and the CLI surface.
"""

import json
import subprocess
import sys

import jax
import numpy as np
import pytest

from vae_connexe_tpu.models import CRVAE, ErrorVAE
from vae_connexe_tpu.serving import export_generator, load_generator
from vae_connexe_tpu.train import generate_with_compensation


@pytest.fixture(scope="module")
def small_pair():
    p = 5
    model, err = CRVAE(p=p, hidden=16), ErrorVAE(d=p, hidden=16)
    return (model, err, model.init(jax.random.key(0)),
            err.init(jax.random.key(1)))


class TestExportRoundtrip:
    def test_matches_in_process_generation(self, small_pair):
        model, err, params, eparams = small_pair
        blob = export_generator(model, err, params, eparams, batch=8)
        fn, meta = load_generator(blob)
        out = fn(3)
        assert out.shape == (8, model.rollout_len, model.p)
        ref = np.asarray(generate_with_compensation(
            model, err, params, eparams, jax.random.key(3), 8))
        np.testing.assert_allclose(out, ref, atol=1e-6)

    def test_deterministic_and_seed_sensitive(self, small_pair):
        model, err, params, eparams = small_pair
        fn, _ = load_generator(
            export_generator(model, err, params, eparams, batch=4))
        a, b = fn(7), fn(7)
        np.testing.assert_array_equal(a, b)
        assert not np.allclose(fn(8), a)

    def test_meta_header(self, small_pair):
        model, err, params, eparams = small_pair
        blob = export_generator(model, err, params, eparams, batch=4,
                                length=9)
        _, meta = load_generator(blob)
        assert meta["kind"] == "crvae_compensated_generator"
        assert meta["batch"] == 4 and meta["rollout_len"] == 9
        assert meta["p"] == model.p and meta["hidden"] == model.hidden
        assert meta["platforms"]

    def test_file_roundtrip_and_bad_magic(self, small_pair, tmp_path):
        model, err, params, eparams = small_pair
        path = tmp_path / "gen.vcx"
        path.write_bytes(
            export_generator(model, err, params, eparams, batch=2))
        fn, _ = load_generator(str(path))
        assert fn(0).shape[0] == 2
        bad = tmp_path / "bad.vcx"
        bad.write_bytes(b"NOTMAGIC" + b"\x00" * 64)
        with pytest.raises(ValueError, match="magic"):
            load_generator(str(bad))

    def test_parents_mask_projects_heads(self, small_pair):
        model, err, params, eparams = small_pair
        parents = np.eye(model.p, dtype=np.float32)
        fn_m, _ = load_generator(export_generator(
            model, err, params, eparams, batch=4, parents=parents))
        fn_u, _ = load_generator(export_generator(
            model, err, params, eparams, batch=4))
        # The baked-in mask changes the rollout (dense init weights get
        # projected to the diagonal) and the result stays finite.
        assert np.isfinite(fn_m(0)).all()
        assert not np.allclose(fn_m(0), fn_u(0))

    def test_usable_without_framework(self, small_pair, tmp_path):
        """A fresh process with ONLY jax — no vae_connexe_tpu import at all
        — can consume the artifact: the container is 12 bytes of header
        framing + JSON + a standard ``jax.export`` serialization."""
        model, err, params, eparams = small_pair
        path = tmp_path / "gen.vcx"
        path.write_bytes(
            export_generator(model, err, params, eparams, batch=3))
        code = f"""
import json, struct, sys
import jax, jax.numpy as jnp, numpy as np
data = open({str(path)!r}, "rb").read()
assert data[:8] == b"VCXEXPT1"
(hlen,) = struct.unpack("<I", data[8:12])
meta = json.loads(data[12:12 + hlen].decode())
exported = jax.export.deserialize(data[12 + hlen:])
out = np.asarray(exported.call(jnp.asarray(5, jnp.int32)))
assert out.shape == (3, {model.rollout_len}, {model.p}), out.shape
assert np.isfinite(out).all()
assert not any(m.startswith("vae_connexe_tpu") for m in sys.modules)
print("OK", out.shape)
"""
        env = {"JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": "",
               "PATH": "/usr/bin:/bin"}
        import os

        env = {**os.environ, **env}
        proc = subprocess.run([sys.executable, "-c", code], env=env,
                              capture_output=True, text=True, timeout=300)
        assert proc.returncode == 0, proc.stderr
        assert "OK" in proc.stdout


class TestServingCli:
    def test_export_then_generate(self, tmp_path, capsys):
        from vae_connexe_tpu.cli import main
        from vae_connexe_tpu.utils import save_checkpoint

        p, hidden = 4, 16
        model, err = CRVAE(p=p, hidden=hidden), ErrorVAE(d=p, hidden=hidden)
        ckpt = tmp_path / "ckpt_phase2"
        save_checkpoint(str(ckpt), {
            "crvae": model.init(jax.random.key(0)),
            "error_vae": err.init(jax.random.key(1))})

        # cli export resolves model geometry from the experiment registry;
        # register a small throwaway experiment for the test checkpoint.
        import dataclasses

        from vae_connexe_tpu.configs import EXPERIMENTS

        base = EXPERIMENTS["lorenz96_crvae"]
        EXPERIMENTS["_test_export"] = dataclasses.replace(
            base, name="_test_export", p=p, hidden=hidden)
        try:
            art = tmp_path / "gen.vcx"
            main(["export", "_test_export", str(ckpt), "--out", str(art),
                  "--batch", "6"])
            summary = json.loads(capsys.readouterr().out)
            assert summary["bytes"] == art.stat().st_size

            out_npy = tmp_path / "samples.npy"
            main(["generate", str(art), "--seed", "2", "--out",
                  str(out_npy)])
            gen = json.loads(capsys.readouterr().out)
            assert gen["shape"][0] == 6
            samples = np.load(out_npy)
            assert samples.shape == tuple(gen["shape"])
            assert np.isfinite(samples).all()
        finally:
            EXPERIMENTS.pop("_test_export", None)


class TestExportServeDtype:
    """bf16 serving precision baked into the artifact (see
    ``tests/test_serve_dtype.py`` for the in-process lever)."""

    def test_bf16_artifact_f32_output_and_header(self, small_pair):
        model, err, params, eparams = small_pair
        fn, meta = load_generator(export_generator(
            model, err, params, eparams, batch=16,
            serve_dtype="bfloat16"))
        assert meta["serve_dtype"] == "bfloat16"
        out = fn(11)
        assert out.dtype == np.float32
        assert np.isfinite(out).all()
        # Distribution must track the f32 artifact (same seed => same
        # h0/noise draws; bf16 only perturbs the gate math).
        fn32, meta32 = load_generator(export_generator(
            model, err, params, eparams, batch=16))
        assert meta32["serve_dtype"] == "float32"
        ref = fn32(11)
        assert np.allclose(out.mean(), ref.mean(), atol=0.02)
        assert np.allclose(out.std(), ref.std(), rtol=0.05, atol=0.02)

    def test_bad_serve_dtype_rejected(self, small_pair):
        model, err, params, eparams = small_pair
        with pytest.raises(ValueError, match="serve_dtype"):
            export_generator(model, err, params, eparams, batch=2,
                             serve_dtype="float16")


class TestWinExport:
    """Context-conditioned W_in-family artifacts
    (``serving.export_win_generator``; generation semantics from
    ``CRVAE.py:105-123``)."""

    @pytest.fixture(scope="class")
    def win(self):
        from vae_connexe_tpu.models import WInCRVAE

        model = WInCRVAE(d=4, hidden=16, latent=8, tau=5)
        return model, model.init(jax.random.key(0))

    def test_roundtrip_matches_in_process(self, win):
        model, params = win
        from vae_connexe_tpu.serving import export_win_generator

        blob = export_win_generator(model, params, batch=3, length=7)
        fn, meta = load_generator(blob)
        assert meta["kind"] == "win_conditioned_generator"
        assert meta["tau"] == model.tau and meta["batch"] == 3
        ctx = np.asarray(jax.random.normal(jax.random.key(1),
                                           (3, model.tau, model.d)))
        out = fn(9, ctx)
        assert out.shape == (3, 7, model.d)
        import jax.numpy as jnp

        ref = np.asarray(model.generate(params, jnp.asarray(ctx),
                                        jax.random.key(9), 7))
        np.testing.assert_allclose(out, ref, atol=1e-6)

    def test_context_shape_validated(self, win):
        model, params = win
        from vae_connexe_tpu.serving import export_win_generator

        fn, _ = load_generator(export_win_generator(model, params,
                                                    batch=3, length=7))
        with pytest.raises(ValueError, match="context shape"):
            fn(0, np.zeros((3, model.tau + 2, model.d), np.float32))

    def test_bf16_win_artifact(self, win):
        model, params = win
        from vae_connexe_tpu.serving import export_win_generator

        fn, meta = load_generator(export_win_generator(
            model, params, batch=8, length=6, serve_dtype="bfloat16"))
        assert meta["serve_dtype"] == "bfloat16"
        ctx = np.asarray(jax.random.normal(jax.random.key(2),
                                           (8, model.tau, model.d)))
        out = fn(1, ctx)
        assert out.dtype == np.float32 and np.isfinite(out).all()
        f32fn, _ = load_generator(export_win_generator(model, params,
                                                       batch=8, length=6))
        ref = f32fn(1, ctx)
        assert np.allclose(out.std(), ref.std(), rtol=0.05, atol=0.02)

    def test_server_serves_win_artifact(self, win):
        import io
        import urllib.error
        import urllib.request

        from vae_connexe_tpu.server import GeneratorServer
        from vae_connexe_tpu.serving import export_win_generator

        model, params = win
        blob = export_win_generator(model, params, batch=2, length=5)
        srv = GeneratorServer(blob)
        srv.start()
        try:
            ctx = np.zeros((2, model.tau, model.d), np.float32)
            req = urllib.request.Request(
                f"http://{srv.host}:{srv.port}/generate",
                data=json.dumps({"seed": 4,
                                 "context": ctx.tolist()}).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=60) as r:
                samples = np.load(io.BytesIO(r.read()))
            assert samples.shape == (2, 5, model.d)
            # Missing context -> 400 with an actionable message.
            req = urllib.request.Request(
                f"http://{srv.host}:{srv.port}/generate",
                data=json.dumps({"seed": 4}).encode(),
                headers={"Content-Type": "application/json"})
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req, timeout=30)
            assert ei.value.code == 400
        finally:
            srv.shutdown()

    def test_cli_export_win(self, win, tmp_path, capsys):
        from vae_connexe_tpu.cli import main
        from vae_connexe_tpu.utils import save_checkpoint

        model, params = win
        ckpt = tmp_path / "ckpt_win"
        save_checkpoint(str(ckpt), params)

        import dataclasses

        from vae_connexe_tpu.configs import EXPERIMENTS

        base = EXPERIMENTS["henon6d_win"]
        EXPERIMENTS["_test_export_win"] = dataclasses.replace(
            base, name="_test_export_win", p=model.d, hidden=model.hidden,
            latent=model.latent, tau=model.tau)
        try:
            art = tmp_path / "win.vcx"
            main(["export", "_test_export_win", str(ckpt), "--out",
                  str(art), "--batch", "2", "--length", "5"])
            summary = json.loads(capsys.readouterr().out)
            assert summary["bytes"] == art.stat().st_size

            ctx = np.zeros((2, 9, model.d), np.float32)   # > tau: sliced
            ctx_path = tmp_path / "ctx.npy"
            np.save(ctx_path, ctx)
            out_npy = tmp_path / "win_samples.npy"
            main(["generate", str(art), "--seed", "2", "--context",
                  str(ctx_path), "--out", str(out_npy)])
            gen = json.loads(capsys.readouterr().out)
            assert gen["shape"] == [2, 5, model.d]
            assert np.isfinite(np.load(out_npy)).all()
        finally:
            EXPERIMENTS.pop("_test_export_win", None)
