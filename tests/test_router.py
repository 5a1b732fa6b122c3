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
