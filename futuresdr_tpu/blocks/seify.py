"""SDR hardware source/sink API with the dummy-driver test pattern.

Parity: ``src/blocks/seify/{source,sink,builder,config}.rs`` — the
reference's hardware abstraction (message ports ``freq``/``gain``/
``sample_rate``/``cmd``, builder with driver args, and a **dummy driver**
used by its test suite, ``tests/seify.rs:18-70``).

On a TPU host there is no SDR USB bus; real capture arrives over the
network or from files (SURVEY.md §2.5 mapping). This module keeps the *API
surface*: ``Builder("driver=dummy")`` yields a source producing synthetic
IQ (tone + noise, retunable via the same message ports), so
reference-style apps and tests port unchanged; a real capture file is
``Builder("driver=file,path=...")``; live RTL-SDR hardware is
``Builder("driver=rtl_tcp,host=...,port=1234")`` — the rtl_tcp wire
protocol with retunes forwarded as live commands; and generic SDR
hardware is ``Builder("driver=soapy,soapy_driver=...")`` through the
SoapySDR Python bindings (RX and TX) — the same library the
reference's seify crate wraps.
"""

from __future__ import annotations

import socket
import struct
from typing import Dict, Optional

import numpy as np

from futuresdr_tpu.runtime.block import Block, PortSpec, message_handler
from futuresdr_tpu.types.pmt import Pmt

# ---------------------------------------------------------------------------
# rtl_tcp network driver
# ---------------------------------------------------------------------------
# The reference's seify crate reaches RTL-SDR dongles over the USB bus
# (driver feature `rtlsdr`, Cargo.toml). On a TPU host the idiomatic bus is
# the network: rtl_tcp (shipped with librtlsdr) exposes the same dongle over
# TCP with a tiny public protocol — 12-byte "RTL0" banner, offset-uint8
# interleaved IQ stream, and 5-byte big-endian control commands. This driver
# keeps seify's message-port surface (freq/gain/sample_rate/cmd) and turns
# each handler into the matching wire command.

_RTL_CMD = {
    "freq": 0x01,
    "sample_rate": 0x02,
    "gain_mode": 0x03,  # 0 = auto, 1 = manual
    "gain": 0x04,  # tenths of dB
    "freq_correction": 0x05,
    "if_gain": 0x06,
    "test_mode": 0x07,
    "agc_mode": 0x08,
    "direct_sampling": 0x09,
    "offset_tuning": 0x0A,
    "gain_index": 0x0D,
    "bias_tee": 0x0E,
}

_RTL_TUNERS = {
    0: "UNKNOWN",
    1: "E4000",
    2: "FC0012",
    3: "FC0013",
    4: "FC2580",
    5: "R820T",
    6: "R828D",
}


class RtlTcpClient:
    """Minimal rtl_tcp protocol client (banner + commands + IQ stream)."""

    def __init__(
        self,
        host: str = "127.0.0.1",
        port: int = 1234,
        timeout: float = 5.0,
    ):
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self.sock.settimeout(timeout)
        hdr = self._recv_exact(12)
        if hdr is None or hdr[:4] != b"RTL0":
            raise ConnectionError(
                f"not an rtl_tcp server at {host}:{port} "
                f"(banner {hdr[:4]!r} != b'RTL0')"
            )
        self.tuner_type, self.tuner_gain_count = struct.unpack(">II", hdr[4:])
        self._carry = bytearray()  # partial-chunk bytes from a recv timeout

    @property
    def tuner_name(self) -> str:
        return _RTL_TUNERS.get(self.tuner_type, "UNKNOWN")

    def _recv_exact(self, n: int) -> Optional[bytes]:
        buf = bytearray()
        while len(buf) < n:
            try:
                chunk = self.sock.recv(n - len(buf))
            except socket.timeout:
                return bytes(buf) if buf else b""
            except ConnectionError:
                # RST mid-read is the same operational event as a FIN:
                # the server is gone — let the caller's reconnect/fault
                # discipline decide, don't leak the raw errno upward
                return None if not buf else bytes(buf)
            if not chunk:  # server closed
                return None if not buf else bytes(buf)
            buf.extend(chunk)
        return bytes(buf)

    def command(self, name: str, param: int) -> None:
        self.sock.sendall(
            struct.pack(">BI", _RTL_CMD[name], int(param) & 0xFFFFFFFF)
        )

    def set_freq(self, hz: float) -> None:
        self.command("freq", round(hz))

    def set_sample_rate(self, hz: float) -> None:
        self.command("sample_rate", round(hz))

    def set_gain(self, db: Optional[float]) -> None:
        """None → hardware AGC; a value → manual gain in dB."""
        if db is None:
            self.command("gain_mode", 0)
            self.command("agc_mode", 1)
        else:
            self.command("gain_mode", 1)
            self.command("gain", round(db * 10.0))

    def read(self, n_samples: int) -> Optional[np.ndarray]:
        """Exactly n complex samples off the wire, or None on server EOF
        (the final chunk before EOF may be short). An empty array means a
        receive timeout — the bytes so far are carried over and the caller
        retries, so mid-stream chunks are never short/zero-padded."""
        from futuresdr_tpu.native import convert_iq

        want = 2 * n_samples - len(self._carry)
        raw = self._recv_exact(want) if want > 0 else b""
        if raw is None and not self._carry:
            return None
        data = bytes(self._carry) + (raw or b"")
        if raw is not None and len(data) < 2 * n_samples:
            # timeout mid-stream: stash and signal retry
            self._carry = bytearray(data)
            return np.zeros(0, np.complex64)
        usable = len(data) - len(data) % 2
        self._carry = bytearray(data[usable:]) if raw is not None else bytearray()
        if usable == 0:
            return None if raw is None else np.zeros(0, np.complex64)
        re, im = convert_iq(np.frombuffer(data[:usable], np.uint8), "cu8")
        return (re + 1j * im).astype(np.complex64)

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass


class AaroniaHttpClient:
    """Aaronia SPECTRAN/RTSA-suite HTTP IQ client (plain HTTP polling).

    Parity: the reference's seify ``aaronia_http`` driver feature
    (``/root/reference/Cargo.toml:33``) — the one reference radio driver
    that needs no physical bus, only the RTSA suite's HTTP server. The
    protocol is the suite's documented remote interface:

    * ``GET {url}/sample`` → one JSON record per call with metadata
      (``startTime``/``endTime``/``startFrequency``/``endFrequency``/
      ``sampleFrequency``) and the IQ payload as an interleaved float
      array under ``samples``.
    * ``PUT {url}/control`` with a JSON body to retune (center
      ``frequency``, ``sampleRate``, ``gain`` keys are forwarded as-is;
      RTSA mission configs may nest these differently — the fake-server
      test pins this client's wire behavior).
    * ``GET {url}/health`` liveness probe at connect.
    """

    def __init__(self, url: str, timeout: float = 5.0):
        import urllib.request

        self.base = url.rstrip("/")
        self.timeout = float(timeout)
        self._open = urllib.request.urlopen
        self._carry = np.zeros(0, np.complex64)
        self._eof = False
        self._timeouts = 0  # consecutive /sample timeouts (bounded at 3)
        try:
            with self._open(
                f"{self.base}/health", timeout=self.timeout
            ) as r:
                r.read()
        except Exception as e:  # noqa: BLE001 - connect-time diagnosis
            raise ConnectionError(
                f"no Aaronia HTTP server at {self.base}: {e}"
            ) from e

    def put_control(self, **fields) -> None:
        import json
        import urllib.request

        # None fields are OMITTED, not sent as JSON null: gain=None means
        # hardware AGC, and the RTSA control endpoint's AGC spelling is
        # the absence of a manual gain, not a null (the rtl_tcp driver
        # maps None to its explicit gain_mode=0 wire command instead)
        fields = {k: v for k, v in fields.items() if v is not None}
        req = urllib.request.Request(
            f"{self.base}/control",
            data=json.dumps(fields).encode(),
            headers={"Content-Type": "application/json"},
            method="PUT",
        )
        with self._open(req, timeout=self.timeout) as r:
            r.read()

    def _fetch_block(self) -> Optional[np.ndarray]:
        """One /sample record → complex64 array (None on server EOF)."""
        import json
        import urllib.error

        try:
            with self._open(
                f"{self.base}/sample", timeout=self.timeout
            ) as r:
                rec = json.loads(r.read().decode())
        except urllib.error.HTTPError as e:
            if e.code in (404, 410):  # stream ended / mission stopped
                return None
            raise
        except (ConnectionError, OSError) as e:
            # A plain TIMEOUT is transient (server busy during a
            # retune/sweep): report "alive but idle" and let the caller
            # retry — the rtl_tcp driver rides through timeouts the same
            # way. Everything else (reset, refused, DNS) is mid-stream
            # network LOSS: a FAULT surfaced through run_loop →
            # handle.join(), never a silent clean EOF with data loss.
            reason = getattr(e, "reason", e)  # URLError wraps the cause
            if isinstance(e, TimeoutError) or isinstance(
                reason, TimeoutError
            ):
                self._timeouts += 1
                if self._timeouts <= 3:
                    return np.zeros(0, np.complex64)
                raise ConnectionError(
                    f"aaronia_http server at {self.base} stopped "
                    f"responding ({self._timeouts} consecutive /sample "
                    f"timeouts)"
                ) from e
            raise ConnectionError(
                f"aaronia_http stream lost at {self.base}/sample: {e}"
            ) from e
        self._timeouts = 0  # the server answered: healthy again
        flat = np.asarray(rec.get("samples", ()), np.float32)
        if flat.size == 0:
            return np.zeros(0, np.complex64)
        return (flat[0::2] + 1j * flat[1::2]).astype(np.complex64)

    def read(self, n_samples: int) -> Optional[np.ndarray]:
        """Up to ``n`` samples; None once the server signals EOF and the
        carry is drained. Short mid-stream chunks are avoided by carrying
        partial records across calls (rtl_tcp driver contract)."""
        while len(self._carry) < n_samples and not self._eof:
            blk = self._fetch_block()
            if blk is None:
                self._eof = True
                break
            if blk.size == 0:
                break  # server alive but idle: hand back what we have
            self._carry = np.concatenate([self._carry, blk])
        if self._eof and len(self._carry) == 0:
            return None
        out, self._carry = (
            self._carry[:n_samples],
            self._carry[n_samples:],
        )
        return out

    def close(self) -> None:
        pass  # stateless polling client


class Config:
    """Bundle of radio settings applied atomically (parity:
    seify/config.rs:11-110 — the ``cmd`` port takes one of these; the
    ``config`` port returns one as a ``Pmt`` map).

    ``chan`` is a hardware channel ID (what ``Config.chan`` reports and
    what ``cmd`` validates), mirroring the reference's
    ``Config { chan }``; the ``config`` QUERY port instead takes a
    0-based index into the configured channel list (source.rs:200-205
    does exactly this ``channels[id]`` indexing)."""

    def __init__(
        self,
        frequency: Optional[float] = None,
        sample_rate: Optional[float] = None,
        gain: Optional[float] = None,
        antenna: Optional[str] = None,
        chan: Optional[int] = None,
    ):
        self.frequency = frequency
        self.sample_rate = sample_rate
        self.gain = gain
        self.antenna = antenna
        self.chan = chan

    def to_pmt(self) -> Pmt:
        d = {
            k: v
            for k, v in (
                ("freq", self.frequency),
                ("sample_rate", self.sample_rate),
                ("gain", self.gain),
                ("antenna", self.antenna),
                ("chan", self.chan),
            )
            if v is not None
        }
        return Pmt.from_py(d)

    @classmethod
    def from_pmt(cls, pmt: Pmt) -> "Config":
        d = pmt.to_py()
        if not isinstance(d, dict):
            raise ValueError("Config pmt must be a map")
        return cls(
            frequency=d.get("freq", d.get("frequency")),
            sample_rate=d.get("sample_rate"),
            gain=d.get("gain"),
            antenna=d.get("antenna"),
            chan=d.get("chan"),
        )


class SoapyClient:
    """SoapySDR-backed radio (parity: the reference's primary hardware
    layer — seify's ``soapy`` feature, Cargo.toml:34 — reached here
    through the SoapySDR Python bindings). Gated on the ``SoapySDR``
    module being installed; every retune handler forwards to the
    matching Soapy call."""

    def __init__(
        self,
        soapy_args: Dict[str, str],
        channel: int,
        sample_rate: float,
        frequency: float,
        gain: Optional[float],
        timeout_s: float = 2.0,
        tx: bool = False,
        start_time_ns: Optional[int] = None,
    ):
        try:
            import SoapySDR  # noqa: PLC0415 - optional hardware dep
        except ImportError as e:
            raise RuntimeError(
                "driver='soapy' needs the SoapySDR Python bindings "
                "(python3-soapysdr / SoapySDR from source) — not "
                "installed in this environment"
            ) from e
        self._sdr = SoapySDR
        self._rx = SoapySDR.SOAPY_SDR_TX if tx else SoapySDR.SOAPY_SDR_RX
        self.channel = int(channel)
        self.dev = SoapySDR.Device(dict(soapy_args))
        self.timeout_us = int(timeout_s * 1e6)
        self._stream = None
        try:
            self.dev.setSampleRate(
                self._rx, self.channel, float(sample_rate)
            )
            self.dev.setFrequency(self._rx, self.channel, float(frequency))
            self.set_gain(gain)
            self._stream = self.dev.setupStream(
                self._rx, SoapySDR.SOAPY_SDR_CF32, [self.channel]
            )
            if start_time_ns is None:
                self.dev.activateStream(self._stream)
            else:
                # hardware-timed activation (parity: builder.rs:118
                # start_time → activate_at, source.rs:263); flag
                # SOAPY_SDR_HAS_TIME = (1 << 1)
                self.dev.activateStream(
                    self._stream,
                    getattr(SoapySDR, "SOAPY_SDR_HAS_TIME", 2),
                    int(start_time_ns),
                )
        except BaseException:
            # release the (possibly exclusive) device claim so a retry
            # with corrected args does not hit 'device busy'
            self.close()
            self.dev = None
            raise
        self.overflows = 0
        self.underflows = 0
        self.max_consecutive_timeouts = 5  # bounds a dead TX stream

    def set_freq(self, hz: float) -> None:
        self.dev.setFrequency(self._rx, self.channel, float(hz))

    def set_sample_rate(self, hz: float) -> None:
        self.dev.setSampleRate(self._rx, self.channel, float(hz))

    def set_gain(self, db: Optional[float]) -> None:
        """None → hardware AGC (when supported); value → manual dB."""
        if db is None:
            if self.dev.hasGainMode(self._rx, self.channel):
                self.dev.setGainMode(self._rx, self.channel, True)
        else:
            self.dev.setGainMode(self._rx, self.channel, False)
            self.dev.setGain(self._rx, self.channel, float(db))

    def valid_antenna(self, name: str) -> bool:
        """True when the device cannot enumerate antennas (no way to
        pre-check) or the name is in its list — used by the cmd
        bundle's validate-before-apply pass."""
        try:
            names = list(self.dev.listAntennas(self._rx, self.channel))
        except Exception:  # noqa: BLE001 - enumeration unsupported
            return True
        return not names or str(name) in names

    def set_antenna(self, name: str) -> None:
        self.dev.setAntenna(self._rx, self.channel, str(name))

    def read(self, n_samples: int) -> Optional[np.ndarray]:
        """Up to n samples; zeros(0) on timeout (caller retries); None
        only on unrecoverable stream errors."""
        buf = np.empty(n_samples, np.complex64)
        sr = self.dev.readStream(
            self._stream, [buf], n_samples, timeoutUs=self.timeout_us
        )
        ret = int(sr.ret)
        if ret > 0:
            return buf[:ret]
        if ret == 0 or ret == self._sdr.SOAPY_SDR_TIMEOUT:
            # 0 elements is a legal 'nothing right now' return on some
            # drivers (remote/audio shims) — retry like a timeout
            return np.zeros(0, np.complex64)
        if ret == self._sdr.SOAPY_SDR_OVERFLOW:
            self.overflows += 1
            return np.zeros(0, np.complex64)
        return None  # other negative codes: stream is dead

    def write(self, samples: np.ndarray) -> None:
        """Blocking TX of the whole chunk (UNDERFLOW is counted and the
        remainder retried; other negative codes are fatal)."""
        buf = np.ascontiguousarray(samples, np.complex64)
        off = 0
        stalls = 0  # consecutive no-progress cycles (dead-stream bound)
        while off < len(buf):
            sr = self.dev.writeStream(
                self._stream,
                [buf[off:]],
                len(buf) - off,
                timeoutUs=self.timeout_us,
            )
            ret = int(sr.ret)
            if ret > 0:
                off += ret
                stalls = 0
            elif ret == 0 or ret in (
                self._sdr.SOAPY_SDR_TIMEOUT,
                getattr(self._sdr, "SOAPY_SDR_UNDERFLOW", -9999),
            ):
                self.underflows += ret == getattr(
                    self._sdr, "SOAPY_SDR_UNDERFLOW", -9999
                )
                stalls += 1
                if stalls > self.max_consecutive_timeouts:
                    # a live TX stream drains continuously; prolonged
                    # no-progress = dead device, surface it instead of
                    # hanging the executor forever (the rtl_tcp
                    # no-data-timeout discipline)
                    raise ConnectionError(
                        f"SoapySDR TX made no progress across "
                        f"{stalls} consecutive write timeouts"
                    )
            else:
                raise ConnectionError(
                    f"SoapySDR writeStream fatal error {ret}"
                )

    def close(self) -> None:
        try:
            if self._stream is not None and self.dev is not None:
                self.dev.deactivateStream(self._stream)
                self.dev.closeStream(self._stream)
        except Exception:  # noqa: BLE001 - shutdown path
            pass
        self._stream = None


_BUILDER_OWNED_KEYS = frozenset(
    # args the Builder/other drivers consume — never forwarded to
    # SoapySDR.Device (a leaked key is silently ignored by some Soapy
    # drivers and misconfigures others)
    {"driver", "host", "port", "path", "fmt", "url", "channel", "channels"}
)


def _soapy_dev_args(extra_args: Optional[Dict[str, str]]) -> Dict[str, str]:
    """Builder args → SoapySDR.Device args: strip the ``soapy_`` prefix,
    re-map ``soapy_driver`` → ``driver``, drop keys other drivers own."""
    out: Dict[str, str] = {}
    for k, v in (extra_args or {}).items():
        if k in _BUILDER_OWNED_KEYS:
            continue
        out[k[len("soapy_") :] if k.startswith("soapy_") else k] = v
    if "soapy_driver" in (extra_args or {}):
        out["driver"] = extra_args["soapy_driver"]
    return out


def _parse_args(args: Optional[str]) -> Dict[str, str]:
    out: Dict[str, str] = {}
    for part in (args or "").split(","):
        if "=" in part:
            k, _, v = part.partition("=")
            out[k.strip()] = v.strip()
    return out


class SeifySource(Block):
    """Hardware-style IQ source (parity: seify/source.rs:52-160).

    Dummy driver: a complex tone at ``tone_offset`` Hz plus AWGN, produced
    host-side at the configured sample rate (unpaced; add
    :class:`~futuresdr_tpu.blocks.Throttle` for wall-clock pacing).

    ``channels`` selects the RX channels (parity: source.rs:63-85 —
    one stream output per configured channel). The dummy driver models a
    coherent multi-channel receiver: every channel sees the same tone
    with independent AWGN. Wire drivers (file/rtl_tcp/udp/aaronia_http)
    carry one stream and reject multi-channel configs."""

    def __init__(
        self,
        driver: str = "dummy",
        frequency: float = 100e6,
        sample_rate: float = 1e6,
        gain: Optional[float] = None,
        path: Optional[str] = None,
        host: Optional[str] = None,
        port: Optional[int] = None,
        fmt: Optional[str] = None,
        url: Optional[str] = None,
        tone_offset: float = 100e3,
        noise_power: float = 1e-4,
        channels=None,
        antenna: Optional[str] = None,
        start_time_ns: Optional[int] = None,
        extra_args: Optional[Dict[str, str]] = None,
        name: Optional[str] = None,
    ):
        super().__init__(name)
        self.driver = driver
        self.frequency = float(frequency)
        self.sample_rate = float(sample_rate)
        # None = hardware AGC (rtl_tcp) / unity amplitude (dummy); a value
        # = manual gain in dB — 0.0 means manual 0 dB, not AGC
        self.gain = None if gain is None else float(gain)
        self.tone_offset = float(tone_offset)
        self.noise_power = float(noise_power)
        self.antenna = None if antenna is None else str(antenna)
        self.is_blocking = True
        self.message_outputs = ["overflows"]
        if channels is None:
            channels = [0]
        elif isinstance(channels, int):
            channels = list(range(channels))
        self.channels = [int(c) for c in channels]
        if not self.channels:
            raise ValueError("channels must be non-empty")
        if len(self.channels) > 1 and driver != "dummy":
            raise ValueError(
                f"driver {driver!r} carries a single IQ stream — "
                "multi-channel needs driver='dummy' (or one source per "
                "channel; soapy's channel= selects which)"
            )
        nch = len(self.channels)
        self.stream_outputs = [
            PortSpec("out" if nch == 1 else f"out{i}", np.complex64)
            for i in range(nch)
        ]
        self.rate_out = (1,) * nch
        self._phases = [0.0] * nch
        self._terminated = False
        self._rngs = [np.random.default_rng(c) for c in self.channels]
        self._file = None
        self._rtl: Optional[RtlTcpClient] = None
        self._udp = None
        self._http: Optional[AaroniaHttpClient] = None
        self._soapy: Optional[SoapyClient] = None
        if driver == "soapy":
            # generic hardware layer (the reference's primary driver);
            # extra Builder args (driver=soapy,soapy_driver=rtlsdr,...)
            # pass through to SoapySDR.Device via _soapy_dev_args
            self._soapy = SoapyClient(
                _soapy_dev_args(extra_args),
                channel=self.channels[0],
                sample_rate=self.sample_rate,
                frequency=self.frequency,
                gain=self.gain,
                start_time_ns=start_time_ns,
            )
            if self.antenna is not None:
                self._soapy.set_antenna(self.antenna)
        elif driver == "aaronia_http":
            base = url or (
                f"http://{host or '127.0.0.1'}:{int(port or 54664)}"
            )
            self._http = AaroniaHttpClient(base)
            self._http.put_control(
                frequency=self.frequency,
                sampleRate=self.sample_rate,
                gain=self.gain,
            )
        elif driver == "file":
            if not path:
                raise ValueError("driver=file needs path=...")
            self._file = np.memmap(path, dtype=np.complex64, mode="r")
            self._pos = 0
        elif driver == "rtl_tcp":
            self._host = host or "127.0.0.1"
            self._port = int(port or 1234)
            self._reconnect_tries = 3
            self._reconnect_wait = 0.2
            self._dead_reconnects = 0  # consecutive rejoins w/o samples
            self._no_data_timeout = 10.0  # dongles stream continuously
            self._rtl_timeout = 5.0  # per-recv socket timeout
            import time as _time

            self._last_data_t = _time.monotonic()
            self._rtl = RtlTcpClient(
                host=self._host, port=self._port, timeout=self._rtl_timeout
            )
            self._rtl.set_sample_rate(self.sample_rate)
            self._rtl.set_freq(self.frequency)
            self._rtl.set_gain(self.gain)
        elif driver == "udp":
            # network-attached streamer (UDP IQ tap): the native C++
            # reader thread drains datagrams into the SPSC ring GIL-free
            # (blocks/net.UdpIqSource machinery); fmt= selects the wire
            # format (cf32/cs16/cs8/cu8). Control ports (freq/gain) are
            # accepted but have no wire back-channel — a UDP tap is
            # receive-only.
            from futuresdr_tpu.blocks.net import UdpIqSource

            self._udp = UdpIqSource(
                bind=host or "127.0.0.1",
                port=int(port or 0),
                fmt=fmt or "cf32",
            )
            # the wrapped block is not in the flowgraph: forward its
            # message posts (overflow events) out of THIS block's ports
            self._udp._post_fn = lambda p, pmt: self.post(p, pmt)
        elif driver != "dummy":
            raise ValueError(
                f"driver {driver!r} not available on this platform — use "
                "'dummy', 'file', 'rtl_tcp', 'udp', 'aaronia_http', "
                "'soapy' (needs the SoapySDR Python bindings), or "
                "network ingest blocks (Tcp/Udp/Zmq)"
            )

    # ---- message handlers (seify/source.rs:126-210 ports) --------------
    @message_handler("freq")
    def _freq(self, pmt: Pmt) -> Pmt:
        self.frequency = float(pmt.as_float())
        if self._rtl is not None:
            self._rtl.set_freq(self.frequency)
        if self._soapy is not None:
            self._soapy.set_freq(self.frequency)
        if self._http is not None:
            self._http.put_control(frequency=self.frequency)
        return Pmt.ok()

    @message_handler("gain")
    def _gain(self, pmt: Pmt) -> Pmt:
        v = pmt.to_py()
        self.gain = None if v is None else float(v)  # None → back to AGC
        if self._rtl is not None:
            self._rtl.set_gain(self.gain)
        if self._soapy is not None:
            self._soapy.set_gain(self.gain)
        if self._http is not None:
            if self.gain is None:
                # the RTSA control schema has no AGC spelling (absence of
                # gain at config time = AGC; there is no null/auto value
                # to send mid-stream) — an explicit warning beats a
                # silent empty PUT that leaves manual gain latched
                from futuresdr_tpu.utils.logging import logger

                logger.warning(
                    "aaronia_http: gain=None (AGC) retune has no wire "
                    "command in the /control schema — device keeps its "
                    "current manual gain"
                )
            else:
                self._http.put_control(gain=self.gain)
        return Pmt.ok()

    @message_handler("sample_rate")
    def _rate(self, pmt: Pmt) -> Pmt:
        self.sample_rate = float(pmt.as_float())
        if self._rtl is not None:
            self._rtl.set_sample_rate(self.sample_rate)
        if self._soapy is not None:
            self._soapy.set_sample_rate(self.sample_rate)
        if self._http is not None:
            self._http.put_control(sampleRate=self.sample_rate)
        return Pmt.ok()

    @message_handler("cmd")
    def _cmd(self, pmt: Pmt) -> Pmt:
        """Apply a :class:`Config` bundle (parity: seify/source.rs cmd
        port, config.rs:62-109 — every field the map carries is
        applied, not a subset). Validation happens BEFORE any field is
        applied, so a rejected bundle leaves the radio untouched
        (Config's atomic-apply contract). ``chan`` is a hardware
        channel ID (the value ``Config.chan`` reports), matching the
        reference's ``Config { chan }`` — NOT the 0-based index the
        ``config`` query port takes."""
        cfg = pmt.to_py()
        if isinstance(cfg, dict):
            if "chan" in cfg and int(cfg["chan"]) not in self.channels:
                raise ValueError(
                    f"chan {cfg['chan']} is not a configured channel "
                    f"{self.channels}"
                )
            for k in ("freq", "frequency", "sample_rate"):
                if k in cfg:
                    float(cfg[k])  # type-check before ANY field applies
            if cfg.get("gain") is not None:
                float(cfg["gain"])
            ant = cfg.get("antenna")
            if (
                ant is not None
                and self._soapy is not None
                and not self._soapy.valid_antenna(str(ant))
            ):
                raise ValueError(
                    f"antenna {ant!r} is not offered by this device"
                )
            for k, v in cfg.items():
                if k in ("freq", "frequency"):
                    self._freq(Pmt.from_py(v))
                elif k == "gain":
                    self._gain(Pmt.from_py(v))
                elif k == "sample_rate":
                    self._rate(Pmt.from_py(v))
                elif k == "antenna":
                    # soapy has a real antenna switch; the other shipped
                    # drivers record it and report via the config query.
                    # Record only AFTER the hardware accepted it.
                    if self._soapy is not None and v is not None:
                        self._soapy.set_antenna(str(v))
                    self.antenna = None if v is None else str(v)
        return Pmt.ok()

    @message_handler("terminate")
    def _terminate(self, pmt: Pmt) -> Pmt:
        """Pmt::Ok → finish the source, ending the flowgraph through the
        normal EOS cascade (parity: seify/source.rs terminate port)."""
        if pmt.to_py() in (None, True, "ok", "Ok"):
            self._terminated = True
        return Pmt.ok()

    @message_handler("config")
    def _config(self, pmt: Pmt) -> Pmt:
        """Channel index → current settings as a Pmt map (parity:
        seify/source.rs:186-205, indexing into the configured channel
        list exactly like ``self.channels[id]`` there)."""
        v = pmt.to_py()
        ch = 0 if v is None else int(v)
        if not 0 <= ch < len(self.channels):
            raise ValueError(
                f"no channel {ch} ({len(self.channels)}-channel source)"
            )
        return Config(
            frequency=self.frequency,
            sample_rate=self.sample_rate,
            gain=self.gain,
            antenna=self.antenna,
            chan=self.channels[ch],
        ).to_pmt()

    @property
    def bound_port(self) -> Optional[int]:
        """The UDP driver's bound port (None for other drivers)."""
        return self._udp.bound_port if self._udp is not None else None

    @message_handler("overflows")
    def _overflows(self, pmt: Pmt) -> Pmt:
        """Query the receive-overflow count as Pmt::U64 (parity:
        seify source.rs:36)."""
        if self._udp is not None:
            return Pmt.u64(self._udp.stats()[2])
        if self._soapy is not None:
            return Pmt.u64(self._soapy.overflows)
        return Pmt.u64(0)

    def host_produce(self, n: int, port: int = 0):
        if self._terminated:
            return None  # terminate port fired: EOS
        if self._soapy is not None:
            chunk = self._soapy.read(n)
            if chunk is None:
                raise ConnectionError(
                    "SoapySDR stream returned a fatal error code"
                )
            return chunk
        if self._udp is not None:
            # overflow events come from the INNER UdpIqSource's single
            # take_overflow_delta (its _post_fn is forwarded to this
            # block's port at construction) — taking the delta here too
            # would race it and permanently under-count posted drops
            return self._udp.host_produce(n, port)
        if self._rtl is not None:
            import time as _time

            chunk = self._rtl.read(n)
            if chunk is not None:
                if len(chunk):
                    self._dead_reconnects = 0  # real data: healthy again
                    self._last_data_t = _time.monotonic()
                    return chunk
                # empty = receive timeout. A real rtl_tcp dongle streams
                # continuously at sample_rate, so prolonged silence on an
                # OPEN socket is a dead server holding the connection
                # (accept-and-hang wrapper) — fall through to the loss
                # path after no_data_timeout instead of idling forever.
                if (
                    _time.monotonic() - self._last_data_t
                    < self._no_data_timeout
                ):
                    return chunk
                chunk = None  # silence timeout: treat as server loss
            # A live radio stream has no natural EOF: the server closing
            # mid-stream is a fault. Try to rejoin (rtl_tcp servers are
            # routinely restarted), then surface the loss through the
            # executor error path -> handle.join() (the reference's
            # BadBlock-class error discipline, tests/bad_block.rs).
            # A server that ACCEPTS connections but never delivers data
            # (dead process behind an accepting wrapper) must not livelock
            # the reconnect loop: bound consecutive no-data reconnects.
            self._dead_reconnects += 1
            if self._dead_reconnects > self._reconnect_tries:
                raise ConnectionError(
                    f"rtl_tcp server at {self._host}:{self._port} accepts "
                    f"connections but delivered no samples across "
                    f"{self._dead_reconnects - 1} consecutive reconnects"
                )
            self._rtl.close()  # release the dead socket before rejoining
            import time as _time

            err: Optional[BaseException] = None
            for _ in range(self._reconnect_tries):
                _time.sleep(self._reconnect_wait)
                try:
                    self._rtl = RtlTcpClient(
                        host=self._host,
                        port=self._port,
                        timeout=self._rtl_timeout,
                    )
                    self._rtl.set_sample_rate(self.sample_rate)
                    self._rtl.set_freq(self.frequency)
                    self._rtl.set_gain(self.gain)
                    # fresh epoch: restart the silence timer, else a
                    # rejoined-but-slow server trips it immediately
                    self._last_data_t = _time.monotonic()
                    return np.zeros(0, np.complex64)  # rejoined: retry
                except OSError as e:
                    err = e
            raise ConnectionError(
                f"rtl_tcp server at {self._host}:{self._port} closed "
                f"mid-stream and reconnect failed after "
                f"{self._reconnect_tries} tries: {err}"
            )
        if self._http is not None:
            return self._http.read(n)
        if self._file is not None:
            end = min(self._pos + n, len(self._file))
            if self._pos >= len(self._file):
                return None
            chunk = np.asarray(self._file[self._pos : end])
            self._pos = end
            return chunk
        amp = 10.0 ** ((self.gain or 0.0) / 20.0)
        w = 2.0 * np.pi * self.tone_offset / self.sample_rate
        ph = self._phases[port] + w * np.arange(n)
        self._phases[port] = float(
            (self._phases[port] + w * n) % (2.0 * np.pi)
        )
        iq = amp * np.exp(1j * ph)
        if self.noise_power > 0:
            rng = self._rngs[port]
            iq = iq + np.sqrt(self.noise_power / 2.0) * (
                rng.standard_normal(n) + 1j * rng.standard_normal(n)
            )
        return iq.astype(np.complex64)

    def on_finish(self) -> None:
        if self._rtl is not None:
            self._rtl.close()
        if self._soapy is not None:
            self._soapy.close()
        if self._udp is not None:
            self._udp.on_finish()

    def host_state(self):
        if (
            self._rtl is not None
            or self._udp is not None
            or self._soapy is not None
        ):
            return None  # live hardware: resume rejoins the live stream
        st = {
            "phases": list(self._phases),
            "rngs": [r.bit_generator.state for r in self._rngs],
        }
        if self._file is not None:
            st["pos"] = self._pos
        return st

    def set_host_state(self, state) -> None:
        if "phase" in state:  # pre-multichannel checkpoint layout
            self._phases[0] = float(state["phase"])
            self._rngs[0].bit_generator.state = state["rng"]
        else:
            self._phases = [float(p) for p in state["phases"]]
            for r, s in zip(self._rngs, state["rngs"]):
                r.bit_generator.state = s
        if self._file is not None and "pos" in state:
            self._pos = int(state["pos"])


class SeifySink(Block):
    """Hardware-style IQ sink (parity: seify/sink.rs) — dummy driver
    counts samples; same message ports as the source."""

    def __init__(
        self,
        driver: str = "dummy",
        frequency: float = 100e6,
        sample_rate: float = 1e6,
        gain: Optional[float] = None,
        antenna: Optional[str] = None,
        start_time_ns: Optional[int] = None,
        extra_args: Optional[Dict[str, str]] = None,
        name: Optional[str] = None,
    ):
        super().__init__(name)
        self.driver = driver
        self.frequency = float(frequency)
        self.sample_rate = float(sample_rate)
        self.gain = None if gain is None else float(gain)
        self.antenna = None if antenna is None else str(antenna)
        self.is_blocking = True
        self.stream_inputs = [PortSpec("in", np.complex64)]
        self.rate_in = (1,)
        self.message_outputs = ["terminate_out"]
        self.n_sent = 0
        self._soapy: Optional[SoapyClient] = None
        if driver == "soapy":
            self._soapy = SoapyClient(
                _soapy_dev_args(extra_args),
                channel=0,
                sample_rate=self.sample_rate,
                frequency=self.frequency,
                gain=self.gain,
                tx=True,
                start_time_ns=start_time_ns,
            )
            if self.antenna is not None:
                self._soapy.set_antenna(self.antenna)
        elif driver != "dummy":
            raise ValueError(
                f"sink driver {driver!r} not available — use 'dummy' or "
                "'soapy' (needs the SoapySDR Python bindings)"
            )

    def on_finish(self) -> None:
        """Pmt::Ok on terminate_out when the input stream finishes
        (parity: seify/sink.rs:36,278 — lets a hardware-in-the-loop
        loopback stop its source). In this lockstep-SDF executor every
        stream advances together, so a sink's input finishing IS the
        graph's EOS — the post lands during the finish drain and
        reaches connected inboxes before run()/wait() return."""
        if self._soapy is not None:
            self._soapy.close()
        self.post("terminate_out", Pmt.ok())

    @message_handler("freq")
    def _freq(self, pmt: Pmt) -> Pmt:
        self.frequency = float(pmt.as_float())
        if self._soapy is not None:
            self._soapy.set_freq(self.frequency)
        return Pmt.ok()

    @message_handler("gain")
    def _gain(self, pmt: Pmt) -> Pmt:
        # same contract as the source handler: None → AGC
        v = pmt.to_py()
        self.gain = None if v is None else float(v)
        if self._soapy is not None:
            self._soapy.set_gain(self.gain)
        return Pmt.ok()

    @message_handler("sample_rate")
    def _rate(self, pmt: Pmt) -> Pmt:
        self.sample_rate = float(pmt.as_float())
        if self._soapy is not None:
            self._soapy.set_sample_rate(self.sample_rate)
        return Pmt.ok()

    @message_handler("cmd")
    def _cmd(self, pmt: Pmt) -> Pmt:
        """Config bundle, same field coverage and validate-then-apply
        atomicity as the source (seify/sink.rs:50 ports: freq, gain,
        sample_rate, cmd, config; single TX channel, so chan must be
        0 when present)."""
        cfg = pmt.to_py()
        if isinstance(cfg, dict):
            if "chan" in cfg and int(cfg["chan"]) != 0:
                raise ValueError(
                    f"chan {cfg['chan']}: single-channel sink (only 0)"
                )
            for k in ("freq", "frequency", "sample_rate"):
                if k in cfg:
                    float(cfg[k])
            if cfg.get("gain") is not None:
                float(cfg["gain"])
            ant = cfg.get("antenna")
            if (
                ant is not None
                and self._soapy is not None
                and not self._soapy.valid_antenna(str(ant))
            ):
                raise ValueError(
                    f"antenna {ant!r} is not offered by this device"
                )
            for k, v in cfg.items():
                if k in ("freq", "frequency"):
                    self._freq(Pmt.from_py(v))
                elif k == "gain":
                    self._gain(Pmt.from_py(v))
                elif k == "sample_rate":
                    self._rate(Pmt.from_py(v))
                elif k == "antenna":
                    if self._soapy is not None and v is not None:
                        self._soapy.set_antenna(str(v))
                    self.antenna = None if v is None else str(v)
        return Pmt.ok()

    @message_handler("config")
    def _config(self, pmt: Pmt) -> Pmt:
        v = pmt.to_py()
        if (0 if v is None else int(v)) != 0:
            raise ValueError("no such channel (single-channel sink)")
        return Config(
            frequency=self.frequency,
            sample_rate=self.sample_rate,
            gain=self.gain,
            antenna=self.antenna,
            chan=0,
        ).to_pmt()

    def host_consume(self, arr: np.ndarray, tags, port: int = 0) -> None:
        if self._soapy is not None:
            self._soapy.write(np.asarray(arr))
        self.n_sent += arr.shape[-1]


class Builder:
    """Fluent builder (parity: seify/builder.rs:169)."""

    def __init__(self, args: Optional[str] = None):
        self._cfg = _parse_args(args)
        self._freq = 100e6
        self._rate = 1e6
        self._gain: Optional[float] = None  # None = AGC
        self._channels = [0]
        self._antenna: Optional[str] = None
        self._start_time_ns: Optional[int] = None
        # channel selection may also ride the args string
        # ("driver=soapy,channel=1" / "channels=0;2")
        if "channel" in self._cfg:
            self._channels = [int(self._cfg["channel"])]
        elif "channels" in self._cfg:
            self._channels = [
                int(c) for c in self._cfg["channels"].split(";")
            ]

    def channel(self, c: int) -> "Builder":
        self._channels = [int(c)]
        return self

    def channels(self, cs) -> "Builder":
        self._channels = [int(c) for c in cs]
        return self

    def frequency(self, f: float) -> "Builder":
        self._freq = float(f)
        return self

    def sample_rate(self, r: float) -> "Builder":
        self._rate = float(r)
        return self

    def gain(self, g: float) -> "Builder":
        self._gain = float(g)
        return self

    def antenna(self, a) -> "Builder":
        """Applied at build time (a real switch on the soapy driver;
        recorded and reported by the config query on the others)."""
        self._antenna = None if a is None else str(a)
        return self

    def start_time(self, ns: int) -> "Builder":
        """Hardware-timed stream activation (parity: builder.rs:118 —
        soapy driver only; the software drivers start immediately)."""
        self._start_time_ns = int(ns)
        return self

    def build_source(self) -> SeifySource:
        return SeifySource(
            driver=self._cfg.get("driver", "dummy"),
            frequency=self._freq,
            sample_rate=self._rate,
            gain=self._gain,
            path=self._cfg.get("path"),
            host=self._cfg.get("host"),
            port=int(self._cfg["port"]) if "port" in self._cfg else None,
            fmt=self._cfg.get("fmt"),
            url=self._cfg.get("url"),
            channels=self._channels,
            antenna=self._antenna,
            start_time_ns=self._start_time_ns,
            extra_args=dict(self._cfg),
        )

    def build_sink(self) -> SeifySink:
        return SeifySink(
            driver=self._cfg.get("driver", "dummy"),
            frequency=self._freq,
            sample_rate=self._rate,
            gain=self._gain,
            antenna=self._antenna,
            start_time_ns=self._start_time_ns,
            extra_args=dict(self._cfg),
        )
