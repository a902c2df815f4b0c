"""HTTP serving daemon (``vae_connexe_tpu/server.py``).

Pins: health/meta endpoints, npy and json generation responses matching
the in-process artifact call per seed, request stats, and error paths.
The daemon completes the deployment story the reference lacks entirely
(SURVEY.md §5: its "serving" is re-running a notebook cell).
"""

import io
import json
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from vae_connexe_tpu.models import CRVAE, ErrorVAE
from vae_connexe_tpu.server import GeneratorServer
from vae_connexe_tpu.serving import export_generator, load_generator


@pytest.fixture(scope="module")
def server():
    p = 4
    model, err = CRVAE(p=p, hidden=16), ErrorVAE(d=p, hidden=16)
    blob = export_generator(model, err, model.init(jax.random.key(0)),
                            err.init(jax.random.key(1)), batch=6)
    srv = GeneratorServer(blob)          # port=0: auto-pick
    srv.start()
    yield srv, blob
    srv.shutdown()


def _get(srv, path):
    with urllib.request.urlopen(
            f"http://{srv.host}:{srv.port}{path}", timeout=30) as r:
        return r.status, json.loads(r.read())


def _post(srv, path, body: dict):
    req = urllib.request.Request(
        f"http://{srv.host}:{srv.port}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    return urllib.request.urlopen(req, timeout=60)


def test_healthz_and_meta(server):
    srv, _ = server
    status, body = _get(srv, "/healthz")
    assert status == 200 and body == {"ok": True}
    status, meta = _get(srv, "/meta")
    assert status == 200
    assert meta["kind"] == "crvae_compensated_generator"
    assert meta["batch"] == 6 and meta["warmup_s"] > 0


def test_generate_npy_matches_artifact(server):
    srv, blob = server
    with _post(srv, "/generate", {"seed": 5}) as r:
        assert r.status == 200
        assert r.headers["Content-Type"] == "application/x-npy"
        samples = np.load(io.BytesIO(r.read()))
    fn, _ = load_generator(blob)
    np.testing.assert_array_equal(samples, fn(5))


def test_generate_json_and_stats(server):
    srv, _ = server
    with _post(srv, "/generate", {"seed": 1, "format": "json"}) as r:
        body = json.loads(r.read())
    arr = np.asarray(body["samples"], np.float32)
    assert list(arr.shape) == body["shape"]
    assert np.isfinite(arr).all()
    _, meta = _get(srv, "/meta")
    assert meta["requests"] >= 1
    assert meta["generate_ms"]["mean"] > 0
    # Latency percentiles over the sliding window, ordered as percentiles.
    g = meta["generate_ms"]
    assert g["p50"] <= g["p95"] <= g["p99"]
    # One latency sample per DEVICE CALL (a coalesced dispatch serves many
    # requests from one call), so the window tracks device_calls, not
    # requests — robust to test ordering against the module-scoped server.
    assert g["window"] == min(meta["device_calls"], 1024)
    # Queue depth is instantaneous; with no in-flight request it is 0.
    assert meta["queue_depth"] == 0


def test_n_samples_slice_and_loop(server):
    """n_samples below the baked batch slices it; above, the daemon loops
    deterministic sub-seeds — same (seed, n) always returns the same
    tensor, and the first batch rows equal the plain seed-0 call."""
    srv, blob = server
    with _post(srv, "/generate", {"seed": 3, "n_samples": 2}) as r:
        small = np.load(io.BytesIO(r.read()))
    assert small.shape[0] == 2
    fn, meta = load_generator(blob)
    np.testing.assert_array_equal(small, fn(3)[:2])

    n_big = meta["batch"] + 4
    with _post(srv, "/generate", {"seed": 3, "n_samples": n_big}) as r:
        big1 = np.load(io.BytesIO(r.read()))
    with _post(srv, "/generate", {"seed": 3, "n_samples": n_big}) as r:
        big2 = np.load(io.BytesIO(r.read()))
    assert big1.shape[0] == n_big
    np.testing.assert_array_equal(big1, big2)

    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(srv, "/generate", {"n_samples": 0})
    assert ei.value.code == 400


def test_multi_artifact_routing():
    """One daemon, several artifacts: named routes, /artifacts listing,
    per-route stats, default route = first artifact."""
    p = 3
    model, err = CRVAE(p=p, hidden=8), ErrorVAE(d=p, hidden=8)
    blob_a = export_generator(model, err, model.init(jax.random.key(0)),
                              err.init(jax.random.key(1)), batch=4)
    blob_b = export_generator(model, err, model.init(jax.random.key(2)),
                              err.init(jax.random.key(3)), batch=2)
    srv = GeneratorServer({"big": blob_a, "small": blob_b})
    srv.start()
    try:
        _, arts = _get(srv, "/artifacts")
        assert arts["default"] == "big"
        assert set(arts["artifacts"]) == {"big", "small"}
        assert arts["artifacts"]["small"]["batch"] == 2

        with _post(srv, "/generate/small", {"seed": 7}) as r:
            s = np.load(io.BytesIO(r.read()))
        assert s.shape[0] == 2
        with _post(srv, "/generate", {"seed": 7}) as r:   # default = big
            b = np.load(io.BytesIO(r.read()))
        assert b.shape[0] == 4
        fn_b, _ = load_generator(blob_b)
        np.testing.assert_array_equal(s, fn_b(7))

        _, meta_small = _get(srv, "/meta/small")
        assert meta_small["artifact"] == "small"
        assert meta_small["requests"] == 1

        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(srv, "/generate/nope", {})
        assert ei.value.code == 404
    finally:
        srv.shutdown()


def test_unknown_artifact_kind_rejected():
    """load_generator must raise on unknown kinds, not fall through to the
    seed-only calling convention."""
    import struct

    from vae_connexe_tpu.serving import _MAGIC

    header = json.dumps({"kind": "mystery_generator"}).encode()
    blob = _MAGIC + struct.pack("<I", len(header)) + header + b""
    with pytest.raises(ValueError, match="unknown artifact kind"):
        load_generator(blob)


def test_error_paths(server):
    srv, _ = server
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(srv, "/generate", {"format": "protobuf"})
    assert ei.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(srv, "/nope", {})
    assert ei.value.code == 404
    status = None
    try:
        _get(srv, "/nothing")
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 404


def test_fair_lock_fifo_order():
    """The dispatch lock serves waiters in strict arrival order.

    A bare threading.Lock wakes waiters in OS scheduling order (barging) —
    measured as the 6.4 s p95 starvation spike at 16 concurrent clients
    (RESULTS.md round 4).  _FairLock's ticket discipline pins the fix:
    threads that queued while the lock was held complete in the order
    they arrived.
    """
    import threading
    import time

    from vae_connexe_tpu.server import _FairLock

    lock = _FairLock()
    order: list[int] = []

    def worker(i):
        with lock:
            order.append(i)

    # Hold the lock, stagger N waiters into the queue in a known arrival
    # order, then release and let the ticket discipline drain them.
    n = 12
    with lock._cond:
        lock._next_ticket += 1            # main thread "holds" ticket 0
    threads = []
    for i in range(n):
        t = threading.Thread(target=worker, args=(i,))
        t.start()
        # Wait until thread i has taken its ticket (joined the queue)
        # before starting i+1 — arrival order is then exactly 0..n-1.
        deadline = time.time() + 10
        while time.time() < deadline:
            with lock._cond:
                if lock._next_ticket >= i + 2:
                    break
            time.sleep(0.001)
        threads.append(t)
    with lock._cond:                      # release ticket 0
        lock._serving += 1
        lock._cond.notify_all()
    for t in threads:
        t.join(timeout=10)
    assert order == list(range(n))


def test_coalescing_single_request_deterministic(server):
    """A "seed": null request is served from a server-assigned seed: the
    response is the head slice of the artifact called at that seed (read
    white-box from the counter — coalesced responses carry no
    reproducibility contract, but the slicing must be exact)."""
    srv, blob = server
    next_seed = srv._auto_seed_next
    with _post(srv, "/generate", {"seed": None, "n_samples": 3}) as r:
        out = np.load(io.BytesIO(r.read()))
    fn, _ = load_generator(blob)
    np.testing.assert_array_equal(out, fn(next_seed)[:3])


def test_coalescing_concurrent_requests_share_dispatches(server):
    """k concurrent "seed": null requests are served FIFO from shared
    dispatches: with n_samples=2 against a batch-6 artifact, 6 requests
    must cost strictly fewer than 6 device calls (a slowed generator
    guarantees the queue forms), and every response is a valid slice."""
    import threading
    import time as _time

    srv, _ = server
    art = srv._artifacts[srv._default]
    orig_fn = art.fn
    calls0, coal0, req0 = (art.device_calls, art.coalesced_requests,
                           art.requests)

    def slow_fn(seed):
        _time.sleep(0.3)
        return orig_fn(seed)

    art.fn = slow_fn
    outs, errs = [None] * 6, []
    try:
        def client(i):
            try:
                with _post(srv, "/generate",
                           {"seed": None, "n_samples": 2}) as r:
                    outs[i] = np.load(io.BytesIO(r.read()))
            except Exception as e:          # surface in the main thread
                errs.append(e)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
    finally:
        art.fn = orig_fn
    assert not errs, errs
    for o in outs:
        assert o is not None and o.shape[0] == 2 and np.isfinite(o).all()
    assert art.requests - req0 == 6
    assert art.coalesced_requests - coal0 == 6
    # 6 requests x 2 samples = 12 samples over batch-6 dispatches: >= 2
    # dispatches are necessary; < 6 proves sharing actually happened.
    n_calls = art.device_calls - calls0
    assert 2 <= n_calls < 6, n_calls


def test_wire_dtype_float16(server):
    """wire_dtype=float16 halves the npy body: same values as the float32
    response cast to f16, dtype on the wire is f16, and bad values 400."""
    srv, _ = server
    with _post(srv, "/generate", {"seed": 11, "n_samples": 4}) as r:
        f32 = np.load(io.BytesIO(r.read()))
    with _post(srv, "/generate", {"seed": 11, "n_samples": 4,
                                  "wire_dtype": "float16"}) as r:
        body = r.read()
        f16 = np.load(io.BytesIO(body))
    assert f16.dtype == np.float16
    np.testing.assert_array_equal(f16, f32.astype(np.float16))
    assert len(body) < f32.nbytes * 0.6     # ~half + npy header
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(srv, "/generate", {"wire_dtype": "int4"})
    assert ei.value.code == 400


def test_auto_seed_above_batch_not_coalesced(server):
    """"seed": null with n_samples > batch takes the multi-call path with a
    server-assigned seed (deterministic sub-seed loop, exact length)."""
    srv, blob = server
    _, meta = _get(srv, "/meta")
    n_big = meta["batch"] + 2
    next_seed = srv._auto_seed_next
    with _post(srv, "/generate", {"seed": None, "n_samples": n_big}) as r:
        out = np.load(io.BytesIO(r.read()))
    assert out.shape[0] == n_big
    from vae_connexe_tpu.server import _sub_seeds
    fn, _ = load_generator(blob)
    ref = np.concatenate([fn(s) for s in _sub_seeds(next_seed, 2)])[:n_big]
    np.testing.assert_array_equal(out, ref)


def test_unexpected_dispatch_error_returns_500(server):
    """A non-ValueError from the generator (relay hiccup, XLA runtime
    error) must produce a JSON 500 counted in /meta — never a dropped
    connection — on BOTH the explicit-seed and the coalesced path."""
    srv, _ = server
    art = srv._artifacts[srv._default]
    orig_fn, err0 = art.fn, art.errors

    def boom(seed, *a):
        raise RuntimeError("relay reset by peer")

    art.fn = boom
    try:
        for body in ({"seed": 7},               # explicit-seed path
                     {"seed": None, "n_samples": 2}):   # coalesced path
            with pytest.raises(urllib.error.HTTPError) as ei:
                _post(srv, "/generate", body)
            assert ei.value.code == 500
            payload = json.loads(ei.value.read())
            assert "RuntimeError" in payload["error"]
    finally:
        art.fn = orig_fn
    _, meta = _get(srv, "/meta")
    assert meta["errors"] == err0 + 2
    # The daemon still serves after the failures (no wedged lock/queue).
    with _post(srv, "/generate", {"seed": 1, "n_samples": 2}) as r:
        assert r.status == 200


def test_coalesced_ghost_waiter_removed_on_dispatch_failure(server):
    """If the dispatch fails while our own waiter was NOT in the popped
    prefix (the queue front filled the batch), the waiter must be removed
    from the queue on the way out — a ghost entry would waste a later
    dispatch's batch capacity and inflate the request stats."""
    from vae_connexe_tpu.server import _Waiter

    srv, _ = server
    art = srv._artifacts[srv._default]
    orig_fn = art.fn
    batch = art.meta["batch"]

    filler = _Waiter(batch)          # fills the whole first dispatch
    art.coal_queue.append(filler)

    def boom(seed, *a):
        raise RuntimeError("dispatch died")

    art.fn = boom
    try:
        with pytest.raises(RuntimeError):
            srv._coalesced_generate(art, 1)
    finally:
        art.fn = orig_fn
    assert filler.done and isinstance(filler.error, RuntimeError)
    assert len(art.coal_queue) == 0      # our waiter did not linger


def test_fair_lock_cancellable_acquire():
    """acquire(until=...) lets a waiter filled by another thread's shared
    dispatch leave the ticket queue immediately: the cancelled ticket is
    skipped so later waiters still get the lock, and the filled waiter
    returns before earlier-ticketed work completes."""
    import threading
    import time

    from vae_connexe_tpu.server import _FairLock

    lock = _FairLock()
    done = threading.Event()
    events = []

    assert lock.acquire() is True          # main thread holds ticket 0

    def filled_waiter():
        got = lock.acquire(until=done.is_set)
        events.append(("filled", got))
        if got:
            lock.release()

    def normal_waiter():
        with lock:
            events.append(("normal", True))

    t1 = threading.Thread(target=filled_waiter)
    t1.start()
    deadline = time.time() + 10            # t1 queued (ticket 1)
    while lock._next_ticket < 2 and time.time() < deadline:
        time.sleep(0.001)
    t2 = threading.Thread(target=normal_waiter)
    t2.start()
    while lock._next_ticket < 3 and time.time() < deadline:
        time.sleep(0.001)

    done.set()                             # "another dispatch filled t1"
    lock.wake()
    t1.join(timeout=10)
    # t1 returned WITHOUT the lock while ticket 0 is still held.
    assert events == [("filled", False)]
    lock.release()                         # release ticket 0 -> skips 1
    t2.join(timeout=10)
    assert ("normal", True) in events
    assert lock._cancelled == set()        # cancelled ticket was reaped


def test_coalesced_json_reports_dispatch_seed_and_offset(server):
    """Coalesced JSON responses carry the shared dispatch's seed and this
    request's slice offset (debuggability), instead of seed: null."""
    srv, blob = server
    next_seed = srv._auto_seed_next
    with _post(srv, "/generate",
               {"seed": None, "n_samples": 2, "format": "json"}) as r:
        body = json.loads(r.read())
    assert body["seed"] == next_seed and body["offset"] == 0
    fn, _ = load_generator(blob)
    np.testing.assert_array_equal(np.asarray(body["samples"], np.float32),
                                  np.asarray(fn(next_seed)[:2]))


def test_wire_dtype_f16_rejected_with_json_format(server):
    """wire_dtype=float16 is npy-only; combining it with format=json is a
    400 (it used to be silently ignored)."""
    srv, _ = server
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(srv, "/generate", {"seed": 1, "format": "json",
                                 "wire_dtype": "float16"})
    assert ei.value.code == 400
    assert "npy" in json.loads(ei.value.read())["error"]
