"""Typed REST client for the control port.

Parity: ``crates/remote/src/remote.rs:17-100`` (``Remote::flowgraphs()``,
``Flowgraph::blocks()``, ``Block::call/post``) — stdlib urllib, no deps.
"""

from __future__ import annotations

import json
from typing import Any, List, Optional
from urllib.request import Request, urlopen


class RemoteBlock:
    def __init__(self, remote: "Remote", fg_id: int, desc: dict):
        self._remote = remote
        self.fg_id = fg_id
        self.id = desc["id"]
        self.type_name = desc.get("type_name")
        self.instance_name = desc.get("instance_name")
        self.message_inputs = desc.get("message_inputs", [])

    def call(self, handler: str, pmt: Any = None) -> Any:
        """RPC a handler with a JSON-able Pmt value; returns the reply."""
        return self._remote._post(
            f"/api/fg/{self.fg_id}/block/{self.id}/call/{handler}/", pmt
        )

    def post(self, handler: str, pmt: Any = None) -> None:
        self.call(handler, pmt)

    def __repr__(self):
        return f"<RemoteBlock {self.instance_name} ({self.type_name})>"


class RemoteFlowgraph:
    def __init__(self, remote: "Remote", fg_id: int):
        self._remote = remote
        self.id = fg_id

    def describe(self) -> dict:
        return self._remote._get(f"/api/fg/{self.id}/")

    def stats(self) -> dict:
        """Executor counters (steps, items, wall time) for a live graph."""
        return self._remote._get(f"/api/fg/{self.id}/stats/")

    def blocks(self) -> List[RemoteBlock]:
        return [
            RemoteBlock(self._remote, self.id, d)
            for d in self.describe()["blocks"]
        ]

    def block(self, name_or_id) -> Optional[RemoteBlock]:
        for b in self.blocks():
            if b.id == name_or_id or b.instance_name == name_or_id:
                return b
        return None


class Remote:
    """``Remote("http://127.0.0.1:1337")``."""

    def __init__(self, url: str):
        self.url = url.rstrip("/")

    def _get(self, path: str) -> Any:
        with urlopen(self.url + path, timeout=10) as r:
            return json.loads(r.read())

    def _post(self, path: str, body: Any) -> Any:
        req = Request(
            self.url + path,
            data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urlopen(req, timeout=30) as r:
            return json.loads(r.read())

    def flowgraphs(self) -> List[RemoteFlowgraph]:
        return [RemoteFlowgraph(self, i) for i in self._get("/api/fg/")]
