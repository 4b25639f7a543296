"""HTTP persist façade — wire-level parity with the reference
persist-service.

The reference exposes its sketch KV over HTTP (``persist-service/
server.go:30-57``: ``PUT /bloomfilter/<key>`` stores the serialized
filter body, ``GET /bloomfilter/<key>`` returns it, 404 when absent)
so that NON-engine clients can fetch persisted filters. The Ray-native
analogs (:class:`~.store.SketchStore`, :class:`~.store.ActorKVStore`)
cover in-cluster use; this module closes the external-client gap:

* :class:`SketchHTTPService` — a threaded stdlib HTTP server fronting
  ANY store backend (file, object store, actor KV). Routes:
  ``PUT/GET/DELETE/HEAD /bloomfilter/<key>`` with the reference's
  status semantics, plus ``GET /keys?prefix=`` (JSON list — an
  extension the reference lacks, used by resumable pipelines).
* :class:`HttpStore` — the client side: the same duck-typed
  ``_StoreSugar`` surface as every other backend, over
  ``urllib.request``. ``open_store("http://host:port")`` dispatches
  here, mirroring the reference's pluggable ``ibackend.go:10-29``.

Scale note: the service is a FAÇADE for external consumers (serving a
handful of merged envelopes), not a data-plane component — bulk
sketch traffic inside a pipeline stays on Ray object-store paths.
"""

from __future__ import annotations

import json
import threading
import urllib.error
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional
from urllib.parse import parse_qs, quote, unquote, urlparse

from .store import _StoreSugar

_PREFIX = "/bloomfilter/"


class SketchHTTPService:
    """Serve a store backend over the reference's HTTP wire protocol.

    ``port=0`` binds an ephemeral port (read it back from ``.port`` /
    ``.url``). ``start()`` runs a daemon thread; ``stop()`` shuts the
    socket down. Also usable as a context manager.
    """

    def __init__(self, store: _StoreSugar, host: str = "127.0.0.1",
                 port: int = 0):
        self.store = store
        svc = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *args):  # quiet: service logs are noise
                pass

            def _key(self) -> Optional[str]:
                path = urlparse(self.path).path
                if not path.startswith(_PREFIX):
                    return None
                key = unquote(path[len(_PREFIX):])
                return key or None

            def _reply(self, code: int, body: bytes = b"",
                       ctype: str = "application/octet-stream"):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                if body and self.command != "HEAD":
                    self.wfile.write(body)

            def _guard(self, fn):
                """Backend errors (disk full, dead actor, Ray shutdown)
                must surface as a 500 status — an escaped exception
                would drop the socket mid-request and lose a queued
                keep-alive request with it. The 500 also closes the
                connection: request state (an undrained body) can't be
                trusted after an arbitrary failure point."""
                try:
                    fn()
                except Exception:
                    try:
                        self._reply(500)
                        self.close_connection = True
                    except Exception:
                        pass  # socket already gone

            def do_PUT(self):
                def run():
                    # drain the body FIRST: an early error reply with
                    # unread body bytes desyncs HTTP/1.1 keep-alive —
                    # the next parser pass reads the body as a request
                    # line and the queued request is lost
                    length = int(self.headers.get("Content-Length", 0))
                    body = self.rfile.read(length)
                    key = self._key()
                    if key is None:
                        return self._reply(404)
                    try:
                        svc.store.put(key, body)
                    except ValueError:  # key escapes root etc.
                        return self._reply(400)
                    self._reply(200)

                self._guard(run)

            def do_GET(self):
                def run():
                    parsed = urlparse(self.path)
                    if parsed.path == "/keys":
                        prefix = parse_qs(parsed.query).get("prefix", [""])[0]
                        out = json.dumps(svc.store.keys(prefix)).encode()
                        return self._reply(200, out, "application/json")
                    key = self._key()
                    if key is None:
                        return self._reply(404)
                    try:
                        data = svc.store.get(key)
                    except (FileNotFoundError, OSError, ValueError):
                        return self._reply(404)
                    self._reply(200, data)

                self._guard(run)

            def do_HEAD(self):
                def run():
                    key = self._key()
                    if key is None or not svc.store.exists(key):
                        return self._reply(404)
                    self._reply(200)

                self._guard(run)

            def do_DELETE(self):
                def run():
                    key = self._key()
                    if key is None:
                        return self._reply(404)
                    svc.store.delete(key)
                    self._reply(200)

                self._guard(run)

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = self._httpd.server_address[:2]
        self._thread: Optional[threading.Thread] = None

    @property
    def url(self) -> str:
        return f"http://{self.host}:{self.port}"

    def start(self) -> "SketchHTTPService":
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None

    def __enter__(self) -> "SketchHTTPService":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()


class HttpStore(_StoreSugar):
    """Client for a :class:`SketchHTTPService` (or the reference
    persist-service itself — same routes/status codes), presenting the
    standard store surface so pipelines are backend-agnostic."""

    def __init__(self, base_url: str):
        self.base = base_url.rstrip("/")

    def _url(self, key: str) -> str:
        # keep path separators (hierarchical keys), escape the rest
        return f"{self.base}{_PREFIX}{quote(key, safe='/')}"

    def put(self, key: Optional[str], value: bytes) -> bool:
        if key is None:  # null-URL no-op parity with SketchStore.put
            return True
        req = urllib.request.Request(self._url(key), data=value, method="PUT")
        with urllib.request.urlopen(req) as r:
            return r.status == 200

    def get(self, key: str) -> bytes:
        try:
            with urllib.request.urlopen(self._url(key)) as r:
                return r.read()
        except urllib.error.HTTPError as e:
            if e.code == 404:
                raise FileNotFoundError(f"no such key over HTTP: {key}") from e
            raise

    def exists(self, key: str) -> bool:
        req = urllib.request.Request(self._url(key), method="HEAD")
        try:
            with urllib.request.urlopen(req) as r:
                return r.status == 200
        except urllib.error.HTTPError as e:
            if e.code == 404:
                return False
            raise

    def delete(self, key: str) -> None:
        req = urllib.request.Request(self._url(key), method="DELETE")
        with urllib.request.urlopen(req):
            pass

    def keys(self, prefix: str = "") -> List[str]:
        q = f"?prefix={quote(prefix)}" if prefix else ""
        with urllib.request.urlopen(f"{self.base}/keys{q}") as r:
            return list(json.loads(r.read().decode()))
