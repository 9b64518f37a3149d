"""Semtech UDP packet-forwarder client (packet_forwarder_client.rs
parity) against an in-process fake network server."""

import base64
import json
import socket
import struct
import threading

from futuresdr_tpu.models.lora.packet_forwarder import (
    PROTOCOL_VERSION,
    PULL_ACK,
    PULL_DATA,
    PULL_RESP,
    PUSH_ACK,
    PUSH_DATA,
    TX_ACK,
    PacketForwarderClient,
    datr_string,
)


class FakeServer:
    def __init__(self):
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.sock.bind(("127.0.0.1", 0))
        self.sock.settimeout(5.0)
        self.port = self.sock.getsockname()[1]
        self.received = []
        self.tx_acks = []
        self.send_downlink_on_pull = False

    def serve_n(self, n):
        for _ in range(n):
            data, addr = self.sock.recvfrom(65536)
            ver, token, ident = data[0], struct.unpack(">H", data[1:3])[0], data[3]
            assert ver == PROTOCOL_VERSION
            self.received.append((ident, data[4:12].hex(), data[12:]))
            if ident == PUSH_DATA:
                self.sock.sendto(struct.pack(">BHB", ver, token, PUSH_ACK), addr)
            elif ident == PULL_DATA:
                self.sock.sendto(struct.pack(">BHB", ver, token, PULL_ACK), addr)
                if self.send_downlink_on_pull:
                    txpk = json.dumps({"txpk": {"freq": 869.525, "data": "3q0="}})
                    self.sock.sendto(
                        struct.pack(">BHB", ver, 0x1234, PULL_RESP) + txpk.encode(),
                        addr,
                    )
                    ack, _ = self.sock.recvfrom(65536)
                    self.tx_acks.append(ack)


def test_push_data_roundtrip():
    srv = FakeServer()
    t = threading.Thread(target=srv.serve_n, args=(1,), daemon=True)
    t.start()
    cli = PacketForwarderClient(
        "AA:55:5A:00:00:00:11:22", f"127.0.0.1:{srv.port}"
    )
    ok = cli.push_rx(b"hello lorawan", 869.525e6, sf=7, bw_hz=250_000, cr=1)
    t.join(5)
    assert ok and cli.stats["push_acked"] == 1
    ident, mac, body = srv.received[0]
    assert ident == PUSH_DATA
    assert mac == "aa555a0000001122"
    rxpk = json.loads(body.decode())["rxpk"][0]
    assert base64.b64decode(rxpk["data"]) == b"hello lorawan"
    assert rxpk["datr"] == "SF7BW250" and rxpk["codr"] == "4/5"
    assert rxpk["freq"] == 869.525 and rxpk["stat"] == 1
    cli.close()


def test_pull_data_and_downlink():
    srv = FakeServer()
    srv.send_downlink_on_pull = True
    t = threading.Thread(target=srv.serve_n, args=(1,), daemon=True)
    t.start()
    got = []
    cli = PacketForwarderClient(
        "0102030405060708", f"127.0.0.1:{srv.port}", on_downlink=got.append
    )
    assert cli.pull_data()
    # bounded-blocking drain: under suite load the server thread may not
    # have SENT the PULL_RESP yet when pull_data() returns on the ack
    cli.poll(wait=5.0)
    t.join(5)
    assert cli.stats["pull_acked"] == 1
    assert got and got[0]["freq"] == 869.525
    assert srv.tx_acks and srv.tx_acks[0][3] == TX_ACK
    cli.close()


def test_datr_string():
    assert datr_string(12, 125_000) == "SF12BW125"
