"""Minimal production serving daemon for exported generator artifacts.

Completes the deployment story the reference lacks entirely (its
"serving" is re-running a notebook cell — SURVEY.md §5): train →
``cli export`` (StableHLO artifact, weights baked in) → ``cli serve``
(this module) → HTTP clients.  Stdlib-only (``http.server``): no web
framework to vendor, nothing to install on the serving host beyond jax.

Endpoints:

- ``GET /healthz``  → ``{"ok": true}`` once the artifact is warm.
- ``GET /meta``     → the artifact header (model geometry, batch,
  rollout_len, serve_dtype, platforms) + serving stats.
- ``POST /generate`` with JSON body ``{"seed": <int>, "format":
  "npy"|"json"}`` → one compensated-rollout batch.  ``"npy"`` (default)
  streams an ``application/x-npy`` body (``np.load``-able); ``"json"``
  returns the nested list.  Deterministic per seed — the artifact's
  calling convention (pinned in ``tests/test_serving.py``).
  Context-conditioned (win-family) artifacts additionally require
  ``"context"``: a nested list of shape (batch, tau, p) — the last τ
  steps of each series to forecast from.

Dispatch is serialized with a lock: one TPU program, one queue — the
batch dimension (baked into the artifact, ``bench.pick_serve_batch``)
is the throughput lever, not concurrent dispatch, and serialization
keeps per-request latency predictable.
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from vae_connexe_tpu.serving import load_generator


class GeneratorServer:
    """Serve one exported generator artifact over HTTP.

    ``port=0`` picks a free port (read it back from ``.port`` — the test
    harness pattern).  ``start()`` spawns the accept loop in a daemon
    thread; ``serve_forever()`` blocks (the CLI path).
    """

    def __init__(self, artifact, host: str = "127.0.0.1", port: int = 0):
        self._fn, self.meta = load_generator(artifact)
        self._needs_context = self.meta["kind"] == "win_conditioned_generator"
        self._lock = threading.Lock()
        self._stats = {"requests": 0, "generate_s_total": 0.0}
        # Warm the executable before accepting traffic: the first call
        # pays the deserialized program's device load.
        t0 = time.perf_counter()
        if self._needs_context:
            self._fn(0, np.zeros((self.meta["batch"], self.meta["tau"],
                                  self.meta["p"]), np.float32))
        else:
            self._fn(0)
        self._warmup_s = time.perf_counter() - t0

        server = self

        class Handler(BaseHTTPRequestHandler):
            # quiet by default; the CLI enables logging
            log_enabled = False

            def log_message(self, fmt, *args):  # noqa: N802
                if self.log_enabled:
                    BaseHTTPRequestHandler.log_message(self, fmt, *args)

            def _send(self, code: int, body: bytes, ctype: str):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _send_json(self, code: int, obj):
                self._send(code, json.dumps(obj).encode(), "application/json")

            def do_GET(self):  # noqa: N802
                if self.path == "/healthz":
                    self._send_json(200, {"ok": True})
                elif self.path == "/meta":
                    stats = dict(server._stats)
                    n = stats.pop("requests")
                    tot = stats.pop("generate_s_total")
                    self._send_json(200, {
                        **server.meta, "requests": n,
                        "warmup_s": round(server._warmup_s, 4),
                        "mean_generate_ms":
                            round(1e3 * tot / n, 3) if n else None})
                else:
                    self._send_json(404, {"error": f"no route {self.path}"})

            def do_POST(self):  # noqa: N802
                if self.path != "/generate":
                    self._send_json(404, {"error": f"no route {self.path}"})
                    return
                try:
                    length = int(self.headers.get("Content-Length") or 0)
                    req = json.loads(self.rfile.read(length) or b"{}")
                    seed = int(req.get("seed", 0))
                    fmt = req.get("format", "npy")
                    if fmt not in ("npy", "json"):
                        raise ValueError(f"format must be 'npy' or 'json', "
                                         f"got {fmt!r}")
                    args = (seed,)
                    if server._needs_context:
                        if "context" not in req:
                            raise ValueError(
                                "this artifact is context-conditioned; the "
                                "request body needs 'context': nested list "
                                f"of shape (batch={server.meta['batch']}, "
                                f"tau={server.meta['tau']}, "
                                f"p={server.meta['p']})")
                        args = (seed, np.asarray(req["context"], np.float32))
                except (ValueError, json.JSONDecodeError) as e:
                    self._send_json(400, {"error": str(e)})
                    return
                try:
                    with server._lock:
                        t0 = time.perf_counter()
                        samples = server._fn(*args)
                        dt = time.perf_counter() - t0
                        server._stats["requests"] += 1
                        server._stats["generate_s_total"] += dt
                except ValueError as e:     # e.g. context shape mismatch
                    self._send_json(400, {"error": str(e)})
                    return
                if fmt == "json":
                    self._send_json(200, {"seed": seed,
                                          "shape": list(samples.shape),
                                          "samples": samples.tolist()})
                else:
                    buf = io.BytesIO()
                    np.save(buf, samples)
                    self._send(200, buf.getvalue(), "application/x-npy")

        self._handler_cls = Handler
        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = self._httpd.server_address[:2]
        self._thread = None

    def start(self) -> None:
        """Accept requests on a daemon thread (returns immediately)."""
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)
        self._thread.start()

    def serve_forever(self, log: bool = True) -> None:
        """Block serving requests (the ``cli serve`` path)."""
        self._handler_cls.log_enabled = log
        self._httpd.serve_forever()

    def shutdown(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=10)
