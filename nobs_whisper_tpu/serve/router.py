"""Multi-host serving fan-out: an HTTP front-end over N backend servers.

The reference is single-machine by design ("GPU can only process one at a
time", src-tauri/src/whisper.rs:151); SURVEY §2.3 requires the TPU-native
scale-out story: ICI collectives shard the window batch *within* a host
(parallel/mesh.py + pipeline/batcher.py), and the fan-out *across* hosts
rides the data-center network at the serving layer — each backend process
owns one TPU host and runs the full `serve.server` API; this router
spreads sessions and one-shot transcriptions over them.

Semantics:
- `POST /sessions` picks the healthy backend with the fewest live
  sessions (least-loaded); the session id is returned verbatim and all
  subsequent `/sessions/<sid>/...` verbs — including the SSE event
  stream — are proxied to the owning backend (session affinity: session
  state is host-local, exactly like the reference's in-process AppState,
  src-tauri/src/state.rs:171).
- `POST /transcribe` round-robins over healthy backends.
- `GET /health|/state|/stats` aggregate all backends.
- `GET/POST /config` and model verbs broadcast (every host keeps its own
  disk registry, mirroring the reference's per-machine models dir,
  src-tauri/src/config.rs:100-106).
- A backend that fails a request is marked down and retried after a
  cooldown; in-flight work fails over to the next healthy backend
  (per-chunk error isolation at cluster scope, state.rs:157-159 analog).

Pure stdlib, same as serve.server.
"""

from __future__ import annotations

import json
import logging
import threading
import time
import urllib.error
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional

log = logging.getLogger(__name__)

DOWN_COOLDOWN_S = 5.0
REQUEST_TIMEOUT_S = 600.0   # transcription of a 600 s cap recording
RECONCILE_INTERVAL_S = 60.0


class Backend:
    def __init__(self, base_url: str):
        self.base_url = base_url.rstrip("/")
        self.down_until = 0.0
        self.sessions = 0          # live sessions routed here; guarded by
                                   # RouterState._lock (a single lock keeps
                                   # affinity and the counters consistent)

    def healthy(self) -> bool:
        return time.monotonic() >= self.down_until

    def mark_down(self) -> None:
        self.down_until = time.monotonic() + DOWN_COOLDOWN_S
        log.warning("backend %s marked down for %.0fs", self.base_url,
                    DOWN_COOLDOWN_S)


class RouterState:
    def __init__(self, backends: List[str]):
        if not backends:
            raise ValueError("router needs at least one backend")
        self.backends = [Backend(b) for b in backends]
        self.affinity: Dict[str, Backend] = {}   # session id -> backend
        self._rr = 0
        self._lock = threading.Lock()
        self._last_reconcile = time.monotonic()
        self._reconciling = False

    # ---- selection ----------------------------------------------------
    def healthy_backends(self) -> List[Backend]:
        return [b for b in self.backends if b.healthy()]

    def pick_least_loaded(self) -> Optional[Backend]:
        self.maybe_reconcile()
        with self._lock:
            up = self.healthy_backends()
            return min(up, key=lambda b: b.sessions) if up else None

    def pick_round_robin(self) -> Optional[Backend]:
        with self._lock:
            up = self.healthy_backends()
            if not up:
                return None
            b = up[self._rr % len(up)]
            self._rr += 1
            return b

    # ---- session bookkeeping (all under _lock) -------------------------
    def session_backend(self, sid: str) -> Optional[Backend]:
        with self._lock:
            return self.affinity.get(sid)

    def add_session(self, sid: str, backend: Backend) -> None:
        with self._lock:
            self.affinity[sid] = backend
            backend.sessions += 1

    def drop_session(self, sid: str) -> Optional[Backend]:
        with self._lock:
            b = self.affinity.pop(sid, None)
            if b is not None:
                b.sessions = max(0, b.sessions - 1)
            return b

    def maybe_reconcile(self, force: bool = False) -> None:
        """Reap affinity entries whose session no longer exists on its
        backend. A client that vanishes without DELETE would otherwise
        leak its load-count slot forever and skew least-loaded placement.

        Triggered at most every RECONCILE_INTERVAL_S and runs the HTTP
        sweep in a daemon thread so the request path (pick_least_loaded)
        never blocks on up to 10 s/backend of /state probes.
        ``force=True`` runs synchronously (tests/shutdown)."""
        now = time.monotonic()
        with self._lock:
            if (not force
                    and (now - self._last_reconcile < RECONCILE_INTERVAL_S
                         or self._reconciling)):
                return
            self._last_reconcile = now
            self._reconciling = True
        if force:
            self._reconcile_sweep()
        else:
            threading.Thread(target=self._reconcile_sweep,
                             daemon=True).start()

    def _reconcile_sweep(self) -> None:
        try:
            with self._lock:
                backends = [b for b in self.backends if b.healthy()]
                # sessions created while the sweep's /state probes are in
                # flight are NOT in the probe results; only entries that
                # predate the sweep may be reaped, or a freshly-placed
                # session would be orphaned at the router
                pre = set(self.affinity)
            live: Dict[Backend, set] = {}
            for b in backends:
                try:
                    _, data = self.request(b, "GET", "/state", timeout=10)
                    live[b] = set(json.loads(data))
                except Exception:
                    pass   # unreachable: keep its entries (nothing known)
            with self._lock:
                for sid, b in list(self.affinity.items()):
                    if sid in pre and b in live and sid not in live[b]:
                        del self.affinity[sid]
                for b, sids in live.items():
                    # truth from the backend, plus sessions routed there
                    # after the snapshot (invisible to the probe)
                    placed_after = sum(
                        1 for sid, bb in self.affinity.items()
                        if bb is b and sid not in pre)
                    b.sessions = len(sids) + placed_after
        finally:
            with self._lock:
                self._reconciling = False

    # ---- plain HTTP to a backend ---------------------------------------
    def request(self, backend: Backend, method: str, path: str,
                body: Optional[bytes] = None,
                timeout: float = REQUEST_TIMEOUT_S):
        """Returns (status, body bytes). Marks the backend down on
        connection-level failure and re-raises."""
        status, data, _ = self.request_full(backend, method, path, body,
                                            timeout)
        return status, data

    def request_full(self, backend: Backend, method: str, path: str,
                     body: Optional[bytes] = None,
                     timeout: float = REQUEST_TIMEOUT_S,
                     headers: Optional[dict] = None):
        """Like request() but also returns the response Content-Type, so
        relays can forward non-JSON bodies (the web client's HTML, vtt/srt
        transcripts) untouched. `headers` forwards request headers the
        backend needs to parse the body (the OpenAI endpoints' multipart
        boundary rides Content-Type)."""
        req = urllib.request.Request(
            backend.base_url + path, data=body, method=method,
            headers=headers or {})
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                return (resp.status, resp.read(),
                        resp.headers.get("Content-Type",
                                         "application/json"))
        except urllib.error.HTTPError as e:
            # an HTTP-level error is a healthy backend answering
            return e.code, e.read(), e.headers.get("Content-Type",
                                                   "application/json")
        except (urllib.error.URLError, OSError, TimeoutError):
            backend.mark_down()
            raise


def make_handler(state: RouterState):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):
            log.debug("router: " + fmt, *args)

        def _json(self, obj, code=200):
            payload = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def _error(self, msg, code=502):
            self._json({"error": msg}, code)

        def _body(self) -> bytes:
            n = int(self.headers.get("Content-Length") or 0)
            return self.rfile.read(n) if n else b""

        def _relay(self, backend: Backend, method: str,
                   body: Optional[bytes] = None):
            try:
                status, data, ctype = state.request_full(
                    backend, method, self.path, body)
            except Exception as e:
                return self._error(f"backend {backend.base_url}: {e}")
            self.send_response(status)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _session_backend(self, sid: str) -> Optional[Backend]:
            b = state.session_backend(sid)
            if b is None:
                self._error(f"no session {sid}", 404)
            return b

        # ---- GET -------------------------------------------------------
        def do_GET(self):
            parts = [p for p in self.path.split("?")[0].split("/") if p]
            if parts == ["health"]:
                return self._aggregate("GET", "/health", key="backends")
            if parts in (["state"], ["stats"]):
                return self._aggregate("GET", "/" + parts[0],
                                       key="backends")
            if parts == ["backends"]:
                return self._json([{
                    "url": b.base_url, "healthy": b.healthy(),
                    "sessions": b.sessions} for b in state.backends])
            if len(parts) == 3 and parts[0] == "sessions" \
                    and parts[2] == "events":
                b = self._session_backend(parts[1])
                if b:
                    return self._proxy_sse(b)
                return
            if len(parts) == 3 and parts[0] == "sessions" \
                    and parts[2] == "ws":
                b = self._session_backend(parts[1])
                if b:
                    return self._tunnel_ws(b)
                return
            # config / models / download progress: first healthy backend
            b = state.pick_round_robin()
            if b is None:
                return self._error("no healthy backends")
            return self._relay(b, "GET")

        def _tunnel_ws(self, backend: Backend):
            """Relay a WebSocket upgrade to the session's OWNING backend
            and then pump raw bytes both ways — affinity must hold for
            the full-duplex channel exactly as it does for SSE (the
            urllib relays strip Upgrade headers and pick round-robin,
            which can neither upgrade nor reach the right host)."""
            import socket as socketmod
            from urllib.parse import urlsplit

            u = urlsplit(backend.base_url)
            try:
                upstream = socketmod.create_connection(
                    (u.hostname, u.port or 80), timeout=30)
            except OSError as e:
                return self._error(f"backend {backend.base_url}: {e}",
                                   502)
            try:
                # forward the original request line + headers verbatim
                # (Sec-WebSocket-Key and friends included); rewrite Host
                head = [f"GET {self.path} HTTP/1.1",
                        f"Host: {u.netloc}"]
                for k, v in self.headers.items():
                    if k.lower() != "host":
                        head.append(f"{k}: {v}")
                upstream.sendall(("\r\n".join(head) + "\r\n\r\n")
                                 .encode("latin-1"))
                # read the backend's response head and forward verbatim
                # (101 or an error — either way the client sees exactly
                # what the backend said)
                resp = b""
                while b"\r\n\r\n" not in resp:
                    chunk = upstream.recv(65536)
                    if not chunk:
                        return self._error("backend closed during "
                                           "websocket handshake", 502)
                    resp += chunk
                self.connection.sendall(resp)
                if not resp.startswith(b"HTTP/1.1 101"):
                    return
                # hijacked: pump bytes until either side closes. One
                # direction inline (this handler thread), one in a
                # helper; both sockets shut down when either ends.
                client = self.connection
                self.close_connection = True

                def pump(src, dst):
                    try:
                        while True:
                            data = src.recv(65536)
                            if not data:
                                break
                            dst.sendall(data)
                    except OSError:
                        pass
                    finally:
                        for s in (src, dst):
                            try:
                                s.shutdown(socketmod.SHUT_RDWR)
                            except OSError:
                                pass

                t = threading.Thread(target=pump,
                                     args=(upstream, client),
                                     daemon=True)
                t.start()
                pump(client, upstream)
                t.join(timeout=10)
            finally:
                try:
                    upstream.close()
                except OSError:
                    pass

        def _aggregate(self, method: str, path: str, key: str):
            out = {}
            for b in state.backends:
                if not b.healthy():
                    out[b.base_url] = {"error": "down"}
                    continue
                try:
                    _, data = state.request(b, method, path, timeout=10)
                    out[b.base_url] = json.loads(data)
                except Exception as e:
                    out[b.base_url] = {"error": str(e)}
            self._json({key: out})

        def _proxy_sse(self, backend: Backend):
            """Stream the backend's SSE body through unbuffered."""
            import http.client
            from urllib.parse import urlsplit
            u = urlsplit(backend.base_url)
            conn = http.client.HTTPConnection(
                u.hostname, u.port, timeout=REQUEST_TIMEOUT_S)
            try:
                conn.request("GET", self.path)
                resp = conn.getresponse()
                self.send_response(resp.status)
                self.send_header("Content-Type", "text/event-stream")
                self.send_header("Cache-Control", "no-cache")
                # stream until backend closes; length unknown
                self.send_header("Connection", "close")
                self.end_headers()
                while True:
                    chunk = resp.read1(8192)
                    if not chunk:
                        break
                    self.wfile.write(chunk)
                    self.wfile.flush()
            except (BrokenPipeError, ConnectionResetError):
                pass
            except OSError as e:
                log.warning("SSE proxy to %s failed: %s",
                            backend.base_url, e)
            finally:
                conn.close()

        # ---- POST ------------------------------------------------------
        def do_POST(self):
            parts = [p for p in self.path.split("?")[0].split("/") if p]
            body = self._body()
            if parts == ["sessions"]:
                return self._create_session(body)
            if len(parts) >= 2 and parts[0] == "sessions":
                b = self._session_backend(parts[1])
                if b:
                    self._relay(b, "POST", body)
                return
            if parts == ["transcribe"]:
                return self._transcribe(body)
            if len(parts) == 3 and parts[:2] == ["v1", "audio"]:
                # OpenAI-compatible one-shots: stateless like
                # /transcribe, same round-robin + failover; the
                # multipart boundary lives in Content-Type, forward it
                return self._transcribe(body, headers={
                    "Content-Type":
                        self.headers.get("Content-Type", "")})
            if parts == ["config"] or (
                    len(parts) == 3 and parts[0] == "models"):
                # broadcast: config + model downloads apply on every host
                results = {}
                for b in state.backends:
                    if not b.healthy():
                        results[b.base_url] = {"error": "down"}
                        continue
                    try:
                        _, data = state.request(b, "POST", self.path, body,
                                                timeout=30)
                        results[b.base_url] = json.loads(data)
                    except Exception as e:
                        results[b.base_url] = {"error": str(e)}
                return self._json({"backends": results})
            self._error("not found", 404)

        def _create_session(self, body: bytes):
            b = state.pick_least_loaded()
            if b is None:
                return self._error("no healthy backends")
            try:
                status, data = state.request(b, "POST", "/sessions", body,
                                             timeout=30)
            except Exception as e:
                return self._error(f"backend {b.base_url}: {e}")
            if status == 200:
                sid = json.loads(data)["session"]
                state.add_session(sid, b)
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _transcribe(self, body: bytes, headers: Optional[dict] = None):
            """Round-robin with failover: a connection-level failure on
            one backend retries the remaining healthy ones."""
            tried = set()
            while True:
                b = state.pick_round_robin()
                if b is None or b.base_url in tried:
                    return self._error("no healthy backends")
                tried.add(b.base_url)
                try:
                    status, data, ctype = state.request_full(
                        b, "POST", self.path, body, headers=headers)
                except Exception:
                    continue   # marked down; try the next one
                self.send_response(status)
                # forward the backend's content type: ?format=srt|vtt
                # responses are not JSON
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
                return

        def do_DELETE(self):
            parts = [p for p in self.path.split("?")[0].split("/") if p]
            if len(parts) == 2 and parts[0] == "sessions":
                b = state.session_backend(parts[1])
                if b is None:
                    return self._error(f"no session {parts[1]}", 404)
                # relay FIRST: if the backend is unreachable the session
                # survives there, so the mapping must survive too (the
                # client can retry the DELETE); any HTTP answer — 404
                # included — means the backend resolved it, drop then.
                try:
                    status, data = state.request(b, "DELETE", self.path)
                except Exception as e:
                    return self._error(f"backend {b.base_url}: {e}")
                state.drop_session(parts[1])
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
                return
            b = state.pick_round_robin()
            if b is None:
                return self._error("no healthy backends")
            return self._relay(b, "DELETE")

    return Handler


def serve_router(backends: List[str], host: str = "127.0.0.1",
                 port: int = 8700,
                 background: bool = False) -> ThreadingHTTPServer:
    state = RouterState(backends)
    httpd = ThreadingHTTPServer((host, port), make_handler(state))
    httpd.state = state  # for tests
    if background:
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
    else:
        log.info("routing %d backends on %s:%d", len(backends), host, port)
        httpd.serve_forever()
    return httpd
