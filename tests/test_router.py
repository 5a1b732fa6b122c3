"""Multi-host fan-out router: affinity, load balancing, aggregation,
failover — against two live backend servers with tiny-random engines."""

import json
import socket
import urllib.request

import numpy as np
import pytest

import jax.numpy as jnp


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def cluster(tmp_path_factory):
    """Two backend servers + one router in front."""
    import os
    from nobs_whisper_tpu.api import WhisperEngine
    from nobs_whisper_tpu.serve.router import serve_router
    from nobs_whisper_tpu.serve.server import serve
    from nobs_whisper_tpu.utils.testing import write_tiny_checkpoint

    os.environ["NOBS_WHISPER_TPU_HOME"] = str(tmp_path_factory.mktemp("home"))
    path = str(tmp_path_factory.mktemp("m") / "m.bin")
    write_tiny_checkpoint(path)
    engine = WhisperEngine.from_ggml(path, dtype=jnp.float32)

    backends, httpds = [], []
    for _ in range(2):
        port = _free_port()
        httpds.append(serve(engine, port=port, background=True))
        backends.append(f"http://127.0.0.1:{port}")

    rport = _free_port()
    router = serve_router(backends, port=rport, background=True)
    yield f"http://127.0.0.1:{rport}", router, backends, httpds
    router.shutdown()
    for h in httpds:
        h.shutdown()


def _get(base, path):
    with urllib.request.urlopen(base + path, timeout=30) as r:
        return json.loads(r.read())


def _post(base, path, data=b""):
    req = urllib.request.Request(base + path, data=data, method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_health_aggregates_all_backends(cluster):
    base, _, backends, _ = cluster
    h = _get(base, "/health")
    assert set(h["backends"]) == set(backends)
    assert all(v["ok"] for v in h["backends"].values())


def test_backends_listing(cluster):
    base, _, backends, _ = cluster
    listing = _get(base, "/backends")
    assert {b["url"] for b in listing} == set(backends)
    assert all(b["healthy"] for b in listing)


def test_session_affinity(cluster):
    """Verbs on a session land on the backend that created it, and
    creation balances across backends (least-loaded)."""
    base, router, backends, _ = cluster
    sids = [_post(base, "/sessions", b"{}")["session"] for _ in range(4)]
    owners = [router.state.affinity[s].base_url for s in sids]
    # least-loaded: 4 sessions over 2 backends -> 2 each
    assert sorted(owners.count(b) for b in backends) == [2, 2]

    for sid in sids:
        r = _post(base, f"/sessions/{sid}/start")
        assert r["state"] == "recording"
        r = _post(base, f"/sessions/{sid}/cancel")
        assert r["state"] == "idle"

    # deleting a session releases its slot
    import urllib.request as ur
    req = ur.Request(base + f"/sessions/{sids[0]}", method="DELETE")
    with ur.urlopen(req, timeout=30) as resp:
        assert json.loads(resp.read())["deleted"]
    assert sids[0] not in router.state.affinity


def test_unknown_session_404(cluster):
    base, *_ = cluster
    import urllib.error
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, "/sessions/nope/start")
    assert e.value.code == 404


def test_transcribe_round_robins(cluster):
    base, router, backends, _ = cluster
    audio = (0.1 * np.sin(np.linspace(0, 300, 8000))).astype("<f4")
    r1 = _post(base, "/transcribe?language=en", audio.tobytes())
    r2 = _post(base, "/transcribe?language=en", audio.tobytes())
    assert "text" in r1 and "text" in r2
    # same engine weights on both backends -> identical output
    assert r1["text"] == r2["text"]


def test_failover_and_recovery(cluster):
    """Kill one backend: transcribe fails over; it is marked down; other
    requests keep working."""
    base, router, backends, httpds = cluster
    httpds[0].shutdown()       # stop serving
    httpds[0].server_close()   # and close the listening socket
    audio = (0.1 * np.sin(np.linspace(0, 300, 8000))).astype("<f4")
    for _ in range(3):     # every try must succeed via failover
        r = _post(base, "/transcribe?language=en", audio.tobytes())
        assert "text" in r
    down = [b for b in router.state.backends
            if b.base_url == backends[0]][0]
    assert not down.healthy()
    # aggregation reports the down backend as error, not failure
    h = _get(base, "/health")
    assert "error" in h["backends"][backends[0]]
    assert h["backends"][backends[1]]["ok"]


def test_relay_preserves_content_type(cluster):
    """The router must forward the backend's Content-Type: the web
    client at GET / is text/html, and subtitle output from
    /transcribe?format=srt is application/x-subrip (review finding: the
    relay hard-coded application/json)."""
    base, _, _, _ = cluster
    with urllib.request.urlopen(base + "/", timeout=30) as r:
        assert "text/html" in r.headers.get("Content-Type", "")
        assert b"<html" in r.read()[:200].lower()
    audio = (np.random.RandomState(31).randn(16000) * 0.2).astype(
        np.float32)
    req = urllib.request.Request(
        base + "/transcribe?language=en&format=srt",
        data=audio.tobytes(), method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        assert "x-subrip" in r.headers.get("Content-Type", "")


def test_reconcile_keeps_sessions_created_during_sweep(cluster):
    """Sessions placed while the reconcile's /state probes are in flight
    must survive the sweep (review finding: the sweep reaped any
    affinity entry missing from its pre-create snapshot)."""
    base, router, _, _ = cluster
    state = router.state

    # place a session, then simulate the race: run a sweep whose /state
    # probes happened BEFORE the session existed by injecting the
    # pre-snapshot ordering — create the session between the snapshot
    # and the reap by hooking request()
    sid = _post(base, "/sessions", json.dumps(
        {"language": "en", "sample_rate": 16000}).encode())["session"]
    orig_request = state.request
    created = {}

    def racing_request(backend, method, path, body=None, timeout=None):
        status, data = orig_request(backend, method, path, body)
        if method == "GET" and path == "/state" and not created:
            # a new session lands mid-sweep, after this backend's probe
            created["sid"] = _post(base, "/sessions", json.dumps(
                {"language": "en", "sample_rate": 16000}).encode())[
                    "session"]
        return status, data

    state.request = racing_request
    try:
        state.maybe_reconcile(force=True)
    finally:
        state.request = orig_request
    # both sessions still routable through the router
    for s in (sid, created["sid"]):
        out = _post(base, f"/sessions/{s}/start")
        assert "started" in out
        _post(base, f"/sessions/{s}/cancel")


def test_openai_endpoints_route_through(cluster):
    """The OpenAI-compatible one-shots relay like /transcribe, with the
    multipart boundary (Content-Type) forwarded to the backend."""
    base, _, _, _ = cluster
    boundary = "xNwtRouterBoundary42"
    audio = (np.random.RandomState(7).randn(8000) * 0.2).astype("<f4")
    body = (
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="file"; '
        'filename="a.pcm"\r\n'
        "Content-Type: application/octet-stream\r\n\r\n").encode() \
        + audio.tobytes() + (
        f"\r\n--{boundary}\r\n"
        'Content-Disposition: form-data; name="language"\r\n\r\n'
        "en\r\n"
        f"--{boundary}--\r\n").encode()
    req = urllib.request.Request(
        base + "/v1/audio/transcriptions", data=body, method="POST",
        headers={"Content-Type":
                 f"multipart/form-data; boundary={boundary}"})
    with urllib.request.urlopen(req, timeout=120) as r:
        assert "text" in json.loads(r.read())
    # GET /v1/models relays via the generic first-healthy path
    out = _get(base, "/v1/models")
    assert out["object"] == "list"


def test_websocket_tunnels_to_owning_backend(cluster):
    """The full-duplex WS channel must reach the session's OWNING
    backend through the router (affinity), via a real upgrade tunnel —
    the urllib relays strip Upgrade headers and pick round-robin."""
    import numpy as np
    from nobs_whisper_tpu.client import Client

    base, router, backends, _ = cluster
    c = Client(base)
    with c.session(language="en") as s:
        sock = s.websocket()
        try:
            sock.send_json({"verb": "start"})
            reply = None
            for _ in range(50):
                opcode, payload = sock.recv()
                obj = json.loads(payload)
                if "reply" in obj:
                    reply = obj
                    break
            assert reply and reply["reply"] == "start" and reply["started"]
            rng = np.random.RandomState(3)
            sock.send_binary((rng.randn(8000) * 0.2).astype("<f4")
                             .tobytes())
            sock.send_json({"verb": "stop"})
            for _ in range(50):
                opcode, payload = sock.recv()
                obj = json.loads(payload)
                if "reply" in obj:
                    break
            assert obj["reply"] == "stop"
            assert isinstance(obj["transcript"], str)
        finally:
            sock.close()
