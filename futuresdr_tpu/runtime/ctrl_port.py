"""REST control port.

Parity: ``src/runtime/ctrl_port.rs:96-199`` (axum server on its own
thread) — here the stdlib ``http.server`` on a daemon thread. Routes:

* ``GET /api/fg/`` — list running flowgraph ids
* ``GET /api/fg/{fg}/`` — FlowgraphDescription
* ``GET /api/fg/{fg}/block/{blk}/`` — BlockDescription
* ``GET|POST /api/fg/{fg}/block/{blk}/call/{handler}/`` — handler RPC
  (POST body = Pmt as JSON; GET calls with null)
* ``POST /api/fg/{fg}/snapshot/`` — checkpoint the live graph to a path
  (body ``{"path": "..."}``); resume with ``Runtime.run(restore=...)``
* ``GET /api/fg/{fg}/stats/`` — executor counters (steps, items in/out,
  wall time) from :meth:`FlowgraphHandle.stats` (TPU-side addition; the
  reference exposes perf data via tracing/LTTng instead)

Custom user routes merge via ``add_route`` (parity:
``Runtime::with_custom_routes``, runtime.rs:74).
"""

from __future__ import annotations

import json
import re
import threading
from dataclasses import asdict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Dict, List, Optional, Tuple

from futuresdr_tpu import config
from futuresdr_tpu.types.pmt import Pmt


class ControlPort:
    """HTTP control plane over registered FlowgraphHandles."""

    def __init__(self, bind: Optional[str] = None):
        bind = bind or str(config.get("ctrlport_bind", "127.0.0.1:1337"))
        host, _, port = bind.partition(":")
        self._handles: Dict[int, object] = {}
        self._next_id = 0
        self._custom: List[Tuple[str, re.Pattern, Callable]] = []
        self._lock = threading.Lock()
        cp = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code: int, obj) -> None:
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Access-Control-Allow-Origin", "*")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _send_raw(self, body: bytes, ctype: str) -> None:
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _route(self, method: str) -> None:
                try:
                    body = None
                    if method == "POST":
                        n = int(self.headers.get("Content-Length", 0) or 0)
                        raw = self.rfile.read(n) if n else b"null"
                        body = json.loads(raw or b"null")
                    cp._dispatch(self, method, self.path, body)
                except Exception as exc:  # noqa: BLE001 - HTTP error reply
                    self._send(500, {"error": str(exc)})

            def do_GET(self):  # noqa: N802
                self._route("GET")

            def do_POST(self):  # noqa: N802
                self._route("POST")

        self._server = ThreadingHTTPServer((host, int(port)), Handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()

    # ---- registry --------------------------------------------------------
    def register(self, handle) -> int:
        with self._lock:
            fg_id = self._next_id
            self._next_id += 1
            self._handles[fg_id] = handle
        return fg_id

    def unregister(self, fg_id: int) -> None:
        with self._lock:
            self._handles.pop(fg_id, None)

    def add_route(
        self, method: str, pattern: str, fn: Callable[[dict, object], object]
    ) -> None:
        """Custom route: ``fn(match.groupdict(), body) -> json-able``."""
        self._custom.append((method.upper(), re.compile(pattern), fn))

    def shutdown(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    # ---- dispatch --------------------------------------------------------
    def _dispatch(self, req, method: str, path: str, body) -> None:
        for m, pat, fn in self._custom:
            match = pat.fullmatch(path)
            if m == method and match:
                req._send(200, fn(match.groupdict(), body))
                return

        if method == "GET" and path in ("/api/fg/", "/api/fg"):
            req._send(200, sorted(self._handles.keys()))
            return

        m_fg = re.fullmatch(r"/api/fg/(\d+)/?", path)
        if method == "GET" and m_fg:
            h = self._handles.get(int(m_fg.group(1)))
            if h is None:
                req._send(404, {"error": "no such flowgraph"})
                return
            d = asdict(h.describe())
            d["id"] = int(m_fg.group(1))
            req._send(200, d)
            return

        m_stats = re.fullmatch(r"/api/fg/(\d+)/stats/?", path)
        if method == "GET" and m_stats:
            h = self._handles.get(int(m_stats.group(1)))
            if h is None:
                req._send(404, {"error": "no such flowgraph"})
                return
            if not hasattr(h, "stats"):
                req._send(404, {"error": "handle exposes no stats"})
                return
            req._send(200, h.stats())
            return

        m_blk = re.fullmatch(r"/api/fg/(\d+)/block/(\d+)/?", path)
        if method == "GET" and m_blk:
            h = self._handles.get(int(m_blk.group(1)))
            if h is None:
                req._send(404, {"error": "no such flowgraph"})
                return
            desc = asdict(h.describe())
            blocks = desc["blocks"]
            bid = int(m_blk.group(2))
            if bid >= len(blocks):
                req._send(404, {"error": "no such block"})
                return
            req._send(200, blocks[bid])
            return

        m_snap = re.fullmatch(r"/api/fg/(\d+)/snapshot/?", path)
        if method == "POST" and m_snap:
            h = self._handles.get(int(m_snap.group(1)))
            if h is None:
                req._send(404, {"error": "no such flowgraph"})
                return
            if not hasattr(h, "snapshot"):
                req._send(404, {"error": "handle exposes no snapshot"})
                return
            path_arg = (
                body.get("path")
                if isinstance(body, dict)
                else body if isinstance(body, str) else None
            )
            if not path_arg:
                req._send(400, {"error": 'body must be {"path": "..."}'})
                return
            req._send(200, {"path": h.snapshot(path_arg)})
            return

        m_call = re.fullmatch(
            r"/api/fg/(\d+)/block/(\d+)/call/([\w-]+)/?", path
        )
        if m_call:
            h = self._handles.get(int(m_call.group(1)))
            if h is None:
                req._send(404, {"error": "no such flowgraph"})
                return
            if method == "POST":
                # accept the tagged serde form (pmt.rs serde parity) or any
                # plain JSON value
                try:
                    pmt = Pmt._decode(body)
                except Exception:
                    pmt = Pmt.from_py(body)
            else:
                pmt = Pmt.null()
            result = h.call(int(m_call.group(2)), m_call.group(3), pmt)
            req._send(
                200,
                result._encode() if isinstance(result, Pmt) else result,
            )
            return

        # static frontend fallback (parity: ctrl_port.rs:135-145 serving
        # the prophecy GUI; default = the bundled waterfall viewer)
        if method == "GET" and self._serve_static(req, path):
            return
        req._send(404, {"error": f"no route {method} {path}"})

    def _serve_static(self, req, path: str) -> bool:
        from pathlib import Path

        base = config.get("frontend_path")
        if not base:
            base = Path(__file__).resolve().parent.parent / "gui"
        base = Path(base).resolve()
        rel = path.split("?", 1)[0].lstrip("/") or "index.html"
        target = (base / rel).resolve()
        try:
            inside = target.is_relative_to(base)
        except AttributeError:  # pragma: no cover - py<3.9
            inside = str(target).startswith(str(base) + "/")
        if not inside or not target.is_file():
            return False
        ctype = {
            ".html": "text/html",
            ".js": "text/javascript",
            ".css": "text/css",
            ".json": "application/json",
        }.get(target.suffix, "application/octet-stream")
        req._send_raw(target.read_bytes(), ctype)
        return True


_global: Optional[ControlPort] = None
_global_lock = threading.Lock()


def global_ctrl_port() -> Optional[ControlPort]:
    """Lazily start the process-wide control port if enabled in config."""
    global _global
    with _global_lock:
        if _global is None and config.get("ctrlport_enable", False):
            _global = ControlPort()
        return _global
