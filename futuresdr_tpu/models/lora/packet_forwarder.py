"""Semtech UDP packet-forwarder client.

Parity: ``examples/lora/src/packet_forwarder_client.rs`` (semtech_udp
crate) — decoded LoRa uplinks are forwarded to a LoRaWAN network server
speaking the Semtech UDP protocol v2 (the de-facto gateway protocol):

* ``PUSH_DATA`` (0x00): version, 2-byte token, gateway MAC, JSON
  ``{"rxpk": [...]}`` with base64 payload — acked by ``PUSH_ACK``.
* ``PULL_DATA`` (0x02): keepalive registering the downlink path —
  acked by ``PULL_ACK``; the server may send ``PULL_RESP`` (0x03) with
  a ``txpk`` JSON, which we ack with ``TX_ACK`` (0x05).

Pure stdlib (socket + json + base64); host-side control plane.
"""

from __future__ import annotations

import base64
import json
import socket
import struct
import time
from typing import Callable, Dict, Optional, Tuple

PROTOCOL_VERSION = 2
PUSH_DATA = 0x00
PUSH_ACK = 0x01
PULL_DATA = 0x02
PULL_RESP = 0x03
PULL_ACK = 0x04
TX_ACK = 0x05


def _parse_mac(mac: str) -> bytes:
    clean = mac.replace(":", "").replace("-", "")
    if len(clean) != 16:
        raise ValueError("gateway MAC must be 8 bytes (16 hex chars)")
    return bytes.fromhex(clean)


def datr_string(sf: int, bw_hz: int) -> str:
    return f"SF{sf}BW{bw_hz // 1000}"


class PacketForwarderClient:
    """Minimal Semtech UDP v2 gateway client
    (packet_forwarder_client.rs:29-94 behavior, synchronous)."""

    def __init__(
        self,
        mac_addr: str,
        server_addr: str,
        timeout: float = 1.0,
        on_downlink: Optional[Callable[[dict], None]] = None,
    ):
        self.mac = _parse_mac(mac_addr)
        host, _, port = server_addr.rpartition(":")
        self.server: Tuple[str, int] = (host or "127.0.0.1", int(port))
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self._timeout = timeout
        self.sock.settimeout(timeout)
        self.on_downlink = on_downlink
        self._token = 0
        self.stats: Dict[str, int] = {
            "push_sent": 0,
            "push_acked": 0,
            "pull_sent": 0,
            "pull_acked": 0,
            "downlinks": 0,
        }

    def _next_token(self) -> int:
        self._token = (self._token + 1) & 0xFFFF
        return self._token

    def _header(self, ident: int, token: int) -> bytes:
        return (
            struct.pack(">BHB", PROTOCOL_VERSION, token, ident) + self.mac
        )

    # ---- uplink ---------------------------------------------------------
    def push_rx(
        self,
        payload: bytes,
        freq_hz: float,
        sf: int,
        bw_hz: int,
        cr: int,
        rssi: int = -60,
        snr: float = 9.0,
        tmst: Optional[int] = None,
    ) -> bool:
        """Forward one received frame as PUSH_DATA; returns ack status."""
        rxpk = {
            "tmst": tmst if tmst is not None else int(time.time() * 1e6) & 0xFFFFFFFF,
            "freq": freq_hz / 1e6,
            "chan": 0,
            "rfch": 0,
            "stat": 1,  # CRC OK (push_data::CRC::OK)
            "modu": "LORA",
            "datr": datr_string(sf, bw_hz),
            "codr": f"4/{4 + cr}",
            "rssi": int(rssi),
            "lsnr": round(float(snr), 1),
            "size": len(payload),
            "data": base64.b64encode(payload).decode(),
        }
        token = self._next_token()
        pkt = self._header(PUSH_DATA, token) + json.dumps(
            {"rxpk": [rxpk]}
        ).encode()
        self.sock.sendto(pkt, self.server)
        self.stats["push_sent"] += 1
        return self._await_ack(PUSH_ACK, token, "push_acked")

    # ---- downlink path --------------------------------------------------
    def pull_data(self) -> bool:
        """Keepalive registering this gateway for downlinks."""
        token = self._next_token()
        self.sock.sendto(self._header(PULL_DATA, token), self.server)
        self.stats["pull_sent"] += 1
        return self._await_ack(PULL_ACK, token, "pull_acked")

    def _await_ack(self, ident: int, token: int, stat: str) -> bool:
        deadline = time.monotonic() + self.sock.gettimeout()
        while time.monotonic() < deadline:
            try:
                data, _ = self.sock.recvfrom(65536)
            except socket.timeout:
                return False
            if len(data) < 4 or data[0] != PROTOCOL_VERSION:
                continue
            rtoken = struct.unpack(">H", data[1:3])[0]
            rid = data[3]
            if rid == ident and rtoken == token:
                self.stats[stat] += 1
                return True
            if rid == PULL_RESP:
                self._handle_pull_resp(data)
        return False

    def _handle_pull_resp(self, data: bytes) -> None:
        try:
            txpk = json.loads(data[4:].decode()).get("txpk")
        except Exception:
            return
        self.stats["downlinks"] += 1
        # acknowledge (TX_ACK carries the PULL_RESP token + our MAC)
        self.sock.sendto(
            self._header(TX_ACK, struct.unpack(">H", data[1:3])[0]),
            self.server,
        )
        if self.on_downlink is not None and txpk is not None:
            self.on_downlink(txpk)

    def poll(self, wait: float = 0.0) -> None:
        """Drain pending datagrams (downlinks between uplinks).

        ``wait`` bounds a blocking wait for the FIRST datagram (a gateway
        loop idling between uplinks wants to sleep in the socket, not
        spin); once one arrives the rest drain non-blocking."""
        first = True
        if wait > 0:
            self.sock.settimeout(wait)
        else:
            self.sock.setblocking(False)
        try:
            while True:
                try:
                    data, _ = self.sock.recvfrom(65536)
                except (BlockingIOError, socket.timeout):
                    break
                if first and wait > 0:
                    first = False
                    self.sock.setblocking(False)
                if len(data) >= 4 and data[3] == PULL_RESP:
                    self._handle_pull_resp(data)
        finally:
            self.sock.settimeout(self._timeout)

    def close(self) -> None:
        self.sock.close()
