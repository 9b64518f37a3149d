"""SDR hardware source/sink API with the dummy-driver test pattern.

Parity: ``src/blocks/seify/{source,sink,builder,config}.rs`` — the
reference's hardware abstraction (message ports ``freq``/``gain``/
``sample_rate``/``cmd``, builder with driver args, and a **dummy driver**
used by its test suite, ``tests/seify.rs:18-70``).

On a TPU host there is no SDR bus; real capture arrives via file/UDP/TCP/
ZMQ ingest (SURVEY.md §2.5 mapping). This module keeps the *API surface*:
``Builder("driver=dummy")`` yields a source producing synthetic IQ (tone +
noise, retunable via the same message ports), so reference-style apps and
tests port unchanged; pointing it at a real capture is
``Builder("driver=file,path=...")``.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from futuresdr_tpu.runtime.block import Block, PortSpec, message_handler
from futuresdr_tpu.types.pmt import Pmt


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
    :class:`~futuresdr_tpu.blocks.Throttle` for wall-clock pacing)."""

    def __init__(
        self,
        driver: str = "dummy",
        frequency: float = 100e6,
        sample_rate: float = 1e6,
        gain: float = 0.0,
        path: Optional[str] = None,
        tone_offset: float = 100e3,
        noise_power: float = 1e-4,
        name: Optional[str] = None,
    ):
        super().__init__(name)
        self.driver = driver
        self.frequency = float(frequency)
        self.sample_rate = float(sample_rate)
        self.gain = float(gain)
        self.tone_offset = float(tone_offset)
        self.noise_power = float(noise_power)
        self.is_blocking = True
        self.message_outputs = ["overflows"]
        self.stream_outputs = [PortSpec("out", np.complex64)]
        self.rate_out = (1,)
        self._phase = 0.0
        self._rng = np.random.default_rng(0)
        self._file = None
        if driver == "file":
            if not path:
                raise ValueError("driver=file needs path=...")
            self._file = np.memmap(path, dtype=np.complex64, mode="r")
            self._pos = 0
        elif driver != "dummy":
            raise ValueError(
                f"driver {driver!r} not available on this platform — use "
                "'dummy', 'file', or network ingest blocks (Tcp/Udp/Zmq)"
            )

    # ---- message handlers (seify/source.rs:126-210 ports) --------------
    @message_handler("freq")
    def _freq(self, pmt: Pmt) -> Pmt:
        self.frequency = float(pmt.as_float())
        return Pmt.ok()

    @message_handler("gain")
    def _gain(self, pmt: Pmt) -> Pmt:
        self.gain = float(pmt.as_float())
        return Pmt.ok()

    @message_handler("sample_rate")
    def _rate(self, pmt: Pmt) -> Pmt:
        self.sample_rate = float(pmt.as_float())
        return Pmt.ok()

    @message_handler("cmd")
    def _cmd(self, pmt: Pmt) -> Pmt:
        cfg = pmt.to_py()
        if isinstance(cfg, dict):
            for k, v in cfg.items():
                if k in ("freq", "frequency"):
                    self.frequency = float(v)
                elif k == "gain":
                    self.gain = float(v)
                elif k == "sample_rate":
                    self.sample_rate = float(v)
        return Pmt.ok()

    def host_produce(self, n: int, port: int = 0):
        if self._file is not None:
            end = min(self._pos + n, len(self._file))
            if self._pos >= len(self._file):
                return None
            chunk = np.asarray(self._file[self._pos : end])
            self._pos = end
            return chunk
        amp = 10.0 ** (self.gain / 20.0)
        w = 2.0 * np.pi * self.tone_offset / self.sample_rate
        ph = self._phase + w * np.arange(n)
        self._phase = float((self._phase + w * n) % (2.0 * np.pi))
        iq = amp * np.exp(1j * ph)
        if self.noise_power > 0:
            iq = iq + np.sqrt(self.noise_power / 2.0) * (
                self._rng.standard_normal(n)
                + 1j * self._rng.standard_normal(n)
            )
        return iq.astype(np.complex64)


class SeifySink(Block):
    """Hardware-style IQ sink (parity: seify/sink.rs) — dummy driver
    counts samples; same message ports as the source."""

    def __init__(
        self,
        driver: str = "dummy",
        frequency: float = 100e6,
        sample_rate: float = 1e6,
        gain: float = 0.0,
        name: Optional[str] = None,
    ):
        super().__init__(name)
        self.driver = driver
        self.frequency = float(frequency)
        self.sample_rate = float(sample_rate)
        self.gain = float(gain)
        self.is_blocking = True
        self.stream_inputs = [PortSpec("in", np.complex64)]
        self.rate_in = (1,)
        self.n_sent = 0

    @message_handler("freq")
    def _freq(self, pmt: Pmt) -> Pmt:
        self.frequency = float(pmt.as_float())
        return Pmt.ok()

    @message_handler("gain")
    def _gain(self, pmt: Pmt) -> Pmt:
        self.gain = float(pmt.as_float())
        return Pmt.ok()

    def host_consume(self, arr: np.ndarray, tags, port: int = 0) -> None:
        self.n_sent += arr.shape[-1]


class Builder:
    """Fluent builder (parity: seify/builder.rs:169)."""

    def __init__(self, args: Optional[str] = None):
        self._cfg = _parse_args(args)
        self._freq = 100e6
        self._rate = 1e6
        self._gain = 0.0

    def frequency(self, f: float) -> "Builder":
        self._freq = float(f)
        return self

    def sample_rate(self, r: float) -> "Builder":
        self._rate = float(r)
        return self

    def gain(self, g: float) -> "Builder":
        self._gain = float(g)
        return self

    def antenna(self, _a) -> "Builder":
        return self

    def build_source(self) -> SeifySource:
        return SeifySource(
            driver=self._cfg.get("driver", "dummy"),
            frequency=self._freq,
            sample_rate=self._rate,
            gain=self._gain,
            path=self._cfg.get("path"),
        )

    def build_sink(self) -> SeifySink:
        return SeifySink(
            driver=self._cfg.get("driver", "dummy"),
            frequency=self._freq,
            sample_rate=self._rate,
            gain=self._gain,
        )
