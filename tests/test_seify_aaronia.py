"""seify aaronia_http driver against an in-process fake RTSA-suite server.

Closes the last reference seify driver implementable without physical
hardware (`/root/reference/Cargo.toml:33` feature ``aaronia_http`` — the
Aaronia SPECTRAN's HTTP remote interface is plain HTTP). The fake server
speaks the documented endpoints: ``GET /health``, ``GET /sample`` (JSON
records with interleaved-float ``samples``), ``PUT /control`` (JSON
retunes, logged for assertion)."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from futuresdr_tpu import Flowgraph, Runtime, connect
from futuresdr_tpu.blocks import Head, VectorSink
from futuresdr_tpu.blocks.seify import AaroniaHttpClient, Builder
from futuresdr_tpu.types.pmt import Pmt


class FakeAaroniaServer:
    """Streams ``blocks`` of IQ as successive /sample records, then 410."""

    def __init__(self, blocks):
        self.controls = []  # decoded PUT /control bodies in order
        self._blocks = [np.asarray(b, np.complex64) for b in blocks]
        self._idx = 0
        outer = self

        class H(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                if self.path == "/health":
                    body = b'{"status":"ok"}'
                elif self.path == "/sample":
                    if outer._idx >= len(outer._blocks):
                        self.send_response(410)  # mission stopped
                        self.end_headers()
                        return
                    iq = outer._blocks[outer._idx]
                    outer._idx += 1
                    flat = np.empty(2 * len(iq), np.float32)
                    flat[0::2], flat[1::2] = iq.real, iq.imag
                    body = json.dumps(
                        {
                            "startTime": outer._idx * 0.1,
                            "endTime": (outer._idx + 1) * 0.1,
                            "startFrequency": 99.0e6,
                            "endFrequency": 101.0e6,
                            "sampleFrequency": 2.0e6,
                            "payload": "iq",
                            "samples": flat.tolist(),
                        }
                    ).encode()
                else:
                    self.send_response(404)
                    self.end_headers()
                    return
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_PUT(self):
                if self.path != "/control":
                    self.send_response(404)
                    self.end_headers()
                    return
                n = int(self.headers.get("Content-Length", 0))
                outer.controls.append(json.loads(self.rfile.read(n)))
                self.send_response(200)
                self.send_header("Content-Length", "2")
                self.end_headers()
                self.wfile.write(b"{}")

        self._srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
        self.port = self._srv.server_port
        self._thread = threading.Thread(
            target=self._srv.serve_forever, daemon=True
        )
        self._thread.start()

    @property
    def url(self) -> str:
        return f"http://127.0.0.1:{self.port}"

    def close(self):
        self._srv.shutdown()
        self._srv.server_close()  # release the port: a connect after
        # close must be REFUSED, not accepted-and-ignored by the kernel


def _ramp(n, start=0):
    return (np.arange(start, start + n) + 1j * np.arange(start, start + n)).astype(
        np.complex64
    ) / 1000.0


def test_client_reads_blocks_and_controls():
    srv = FakeAaroniaServer([_ramp(300), _ramp(300, 300), _ramp(100, 600)])
    try:
        cli = AaroniaHttpClient(srv.url)
        cli.put_control(frequency=100e6, sampleRate=2e6)
        got = cli.read(512)  # spans two records with carry
        assert got is not None and len(got) == 512
        np.testing.assert_allclose(got, _ramp(700)[:512])
        tail = cli.read(512)  # 188 remaining, then server EOF (410)
        np.testing.assert_allclose(tail, _ramp(700)[512:])
        assert cli.read(16) is None  # drained + EOF
        assert srv.controls == [{"frequency": 100e6, "sampleRate": 2e6}]
    finally:
        srv.close()


def test_aaronia_source_flowgraph_and_retune():
    srv = FakeAaroniaServer([_ramp(4096, i * 4096) for i in range(5)])
    try:
        src = (
            Builder(f"driver=aaronia_http,url={srv.url}")
            .frequency(100e6)
            .sample_rate(2e6)
            .gain(20.0)
            .build_source()
        )
        # construction pushed the initial config over PUT /control
        assert srv.controls[0] == {
            "frequency": 100e6,
            "sampleRate": 2e6,
            "gain": 20.0,
        }
        src.call_handler("freq", Pmt.from_py(101e6))
        assert srv.controls[-1] == {"frequency": 101e6}
        fg = Flowgraph()
        snk = VectorSink(np.complex64)
        connect(fg, src, Head(8192, np.complex64), snk)
        Runtime(chunk_size=2048).run(fg)
        np.testing.assert_allclose(snk.data(), _ramp(5 * 4096)[:8192])
    finally:
        srv.close()


def test_aaronia_connect_failure_is_diagnosed():
    try:
        AaroniaHttpClient("http://127.0.0.1:9")  # discard port: refused
        assert False, "expected ConnectionError"
    except ConnectionError as e:
        assert "Aaronia" in str(e)


def test_aaronia_agc_gain_is_omitted_not_null():
    """gain=None means hardware AGC: the control body must OMIT the key,
    never send JSON null (a real RTSA server may reject/misparse null)."""
    srv = FakeAaroniaServer([_ramp(64)])
    try:
        Builder(f"driver=aaronia_http,url={srv.url}").frequency(
            100e6
        ).sample_rate(2e6).build_source()  # no .gain(...) → AGC
        assert srv.controls == [{"frequency": 100e6, "sampleRate": 2e6}]
        assert all("gain" not in c for c in srv.controls)
    finally:
        srv.close()


def test_aaronia_midstream_loss_raises_not_eof():
    """A connection loss between records is a FAULT surfaced to the
    caller, not a silent clean EOF with data loss."""
    srv = FakeAaroniaServer([_ramp(256), _ramp(256, 256)])
    cli = AaroniaHttpClient(srv.url)
    first = cli.read(256)
    assert first is not None and len(first) == 256
    srv.close()  # server dies mid-stream
    try:
        cli.read(256)
        assert False, "expected ConnectionError"
    except ConnectionError as e:
        assert "stream lost" in str(e)
