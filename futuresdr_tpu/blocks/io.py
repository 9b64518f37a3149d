"""Source/sink blocks at the host boundary + device null endpoints.

Parity: ``src/blocks/{vector_source,vector_sink,null_source,null_sink,
file_source,file_sink,channel_source,channel_sink}.rs`` and the audio
``WavSink`` (``src/blocks/audio/wav_sink.rs``, hound → stdlib ``wave``).
"""

from __future__ import annotations

import queue
import threading
import time
import wave
from pathlib import Path
from typing import List, Optional

import numpy as np

from futuresdr_tpu.ops import cplx
from futuresdr_tpu.runtime.block import Block, PortSpec
from futuresdr_tpu.runtime.tags import ItemTag


class VectorSource(Block):
    """Host source streaming a numpy array (parity: vector_source.rs:81).

    ``tags`` carry absolute stream indices; they are emitted with the chunk
    that covers them."""

    def __init__(
        self,
        data,
        repeat: bool = False,
        tags: Optional[List[ItemTag]] = None,
        name: Optional[str] = None,
    ):
        super().__init__(name)
        self.data = np.asarray(data)
        self.repeat = repeat
        self._tags = sorted(tags or [], key=lambda t: t.index)
        dtype = self.data.dtype
        if dtype == np.complex128:
            self.data = self.data.astype(np.complex64)
            dtype = np.dtype(np.complex64)
        if dtype == np.float64:
            self.data = self.data.astype(np.float32)
            dtype = np.dtype(np.float32)
        self.stream_outputs = [PortSpec("out", dtype)]
        self.rate_out = (1,)
        self._pos = 0
        self._abs = 0  # absolute items emitted (for repeat-mode tags)

    def host_produce(self, n: int, port: int = 0):
        total = self.data.shape[-1]
        if total == 0:
            # empty data + repeat=True would otherwise spin forever below
            return None
        if self._pos >= total and not self.repeat:
            return None
        pieces = []
        tags: List[ItemTag] = []
        got = 0
        while got < n:
            if self._pos >= total:
                if not self.repeat:
                    break
                self._pos = 0
            end = min(self._pos + (n - got), total)
            pieces.append(self.data[..., self._pos : end])
            tags.extend(
                ItemTag(t.index - self._pos + got, t.tag)
                for t in self._tags
                if self._pos <= t.index < end
            )
            got += end - self._pos
            self._pos = end
        chunk = pieces[0] if len(pieces) == 1 else np.concatenate(
            pieces, axis=-1
        )
        self._abs += chunk.shape[-1]
        return (chunk, tags) if tags else chunk

    def host_state(self):
        return {"pos": self._pos, "abs": self._abs}

    def set_host_state(self, state) -> None:
        self._pos = int(state["pos"])
        self._abs = int(state["abs"])


class VectorSink(Block):
    """Host sink accumulating all items + tags (parity: vector_sink.rs:69)."""

    def __init__(self, dtype=np.float32, name: Optional[str] = None):
        super().__init__(name)
        self.stream_inputs = [PortSpec("in", dtype)]
        self.rate_in = (1,)
        self._chunks: List[np.ndarray] = []
        self._tags: List[ItemTag] = []
        self._n = 0

    def host_consume(self, arr: np.ndarray, tags, port: int = 0) -> None:
        self._chunks.append(np.array(arr))
        self._tags.extend(t.shifted(self._n) for t in tags)
        self._n += arr.shape[-1]

    def data(self) -> np.ndarray:
        if not self._chunks:
            return np.zeros((0,), dtype=self.stream_inputs[0].dtype)
        return np.concatenate(self._chunks, axis=-1)

    def tags(self) -> List[ItemTag]:
        return list(self._tags)

    def host_state(self):
        return {"data": self.data(), "tags": list(self._tags), "n": self._n}

    def set_host_state(self, state) -> None:
        d = state["data"]
        self._chunks = [d] if d.shape[-1] else []
        self._tags = list(state["tags"])
        self._n = int(state["n"])


class NullSource(Block):
    """Device source of zeros (parity: null_source.rs:70) — the perf
    harness upstream end. Lives entirely on device: no H2D traffic.

    The fill value is a runtime *param* (not a traced constant) so XLA
    cannot constant-fold the downstream pipeline away — benches measure
    real compute."""

    def __init__(self, dtype=np.complex64, name: Optional[str] = None):
        super().__init__(name)
        self.stream_outputs = [PortSpec("out", dtype)]
        self.rate_out = (1,)
        self._complex = np.dtype(dtype) == np.complex64
        self._n = 0
        self._params["fill"] = np.float32(0.0)

    def make_state(self, in_sizes, out_sizes):
        self._n = out_sizes[0]
        return ()

    def apply(self, state, inputs, params):
        import jax.numpy as jnp

        fill = jnp.full((self._n,), params["fill"], jnp.float32)
        z = cplx.CArray(fill, fill) if self._complex else fill
        return state, [z], {}


class ResidentSource(Block):
    """Device-resident source: emits the SAME pre-uploaded buffer every
    step, with zero per-step device work beyond reading it.

    The buffer rides the executor's params cache (``device_put`` once
    per retune), so unlike :class:`NullSource` — whose fill is
    re-materialized in-program each step (+8 B/sample of HBM write
    traffic on the source path) — this is the TPU analogue of a
    pre-filled ring buffer: the fair upstream end for benchmarking a
    pipeline against a hand-rolled step fed a loop-invariant operand,
    and the "resident" harness the modem benches build by hand. Being
    a runtime param (not a traced constant), XLA cannot constant-fold
    the downstream pipeline away. If ``data`` is shorter/longer than
    the solved chunk it is cycled/trimmed to fit at state-init time."""

    def __init__(self, data, name: Optional[str] = None):
        super().__init__(name)
        data = np.asarray(data)
        # normalize to the device dtypes up front: complex128 must not
        # fall into the real-path branch (it would bypass the CArray
        # re/im split and rely on an implicit downcast at upload), and
        # float64 would silently double upload bytes
        if np.iscomplexobj(data):
            data = np.ascontiguousarray(data, dtype=np.complex64)
            self._complex = True
        elif np.issubdtype(data.dtype, np.floating):
            data = np.ascontiguousarray(data, dtype=np.float32)
            self._complex = False
        elif np.issubdtype(data.dtype, np.integer):
            self._complex = False  # int wire formats pass through as-is
        else:
            raise TypeError(
                f"ResidentSource: unsupported dtype {data.dtype}"
            )
        self._data = data
        self._prepared_n = -1
        self.stream_outputs = [PortSpec("out", data.dtype)]
        self.rate_out = (1,)
        # mesh protocol: the resident buffer spans the FULL chunk and is
        # split across shards on its sample axis
        self.sharded_params = ("re", "im") if self._complex else ("data",)

    def make_state(self, in_sizes, out_sizes):
        n = out_sizes[0]
        if n != self._prepared_n:
            # IDEMPOTENT per chunk size: make_state runs on every
            # run_loop entry (each re-run starts with fresh stream
            # state), and an unconditional version bump here would
            # re-upload the whole buffer through the executor's params
            # cache per entry — 67 MB per bench timing window, measured
            # as a 300x slowdown before this guard
            d = np.resize(self._data, n)  # cycle/trim to solved chunk
            if self._complex:
                self._params["re"] = np.ascontiguousarray(
                    d.real.astype(np.float32)
                )
                self._params["im"] = np.ascontiguousarray(
                    d.imag.astype(np.float32)
                )
            else:
                self._params["data"] = d
            self._params_version += 1
            self._prepared_n = n
        return ()

    def apply(self, state, inputs, params):
        if self._complex:
            return state, [cplx.CArray(params["re"], params["im"])], {}
        return state, [params["data"]], {}


class NullSink(Block):
    """Counting sink (parity: null_sink.rs:81). ``device_reduce`` keeps the
    upstream compute alive but skips the D2H copy — only a scalar checksum
    crosses the boundary, so throughput benches measure device rate."""

    device_reduce = True

    def __init__(self, dtype=np.complex64, name: Optional[str] = None):
        super().__init__(name)
        self.stream_inputs = [PortSpec("in", dtype)]
        self.rate_in = (1,)
        self.n_received = 0

    def host_consume(self, arr, tags, port: int = 0) -> None:
        self.n_received += arr.shape[-1]

    def host_consume_count(self, valid: int) -> None:
        self.n_received += valid


class FileSource(Block):
    """Raw binary file source, ``dtype``-typed items with optional repeat
    (parity: file_source.rs:94)."""

    def __init__(
        self,
        path,
        dtype=np.complex64,
        repeat: bool = False,
        name: Optional[str] = None,
    ):
        super().__init__(name)
        self.path = Path(path)
        self.repeat = repeat
        self.is_blocking = True
        dt = np.dtype(dtype)
        self.stream_outputs = [PortSpec("out", dt)]
        self.rate_out = (1,)
        self._dtype = dt
        self._mm = np.memmap(self.path, dtype=dt, mode="r")
        self._pos = 0

    def host_produce(self, n: int, port: int = 0):
        total = self._mm.shape[0]
        if self._pos >= total:
            if not self.repeat:
                return None
            self._pos = 0
        end = min(self._pos + n, total)
        chunk = np.asarray(self._mm[self._pos : end])
        self._pos = end
        return chunk

    def host_state(self):
        return {"pos": self._pos}

    def set_host_state(self, state) -> None:
        self._pos = int(state["pos"])


class IQFileSource(Block):
    """SDR-capture file source with native format conversion + prefetch.

    Formats: ``cf32`` (interleaved float32 IQ), ``cs16`` (sc16, USRP/RTL),
    ``cs8`` (HackRF). A reader thread streams the file through the native
    SPSC ring (:mod:`futuresdr_tpu.native` — the reference's host-side hot
    path is native too: the double-mapped `vmcircbuffer` ring), converting
    to the planar float pairs the device wants without holding the GIL in
    the executor loop."""

    from futuresdr_tpu.native import IQ_ITEM_BYTES as _ITEM_BYTES  # + cu8

    def __init__(
        self,
        path,
        fmt: str = "cf32",
        repeat: bool = False,
        ring_bytes: int = 1 << 24,
        name: Optional[str] = None,
    ):
        super().__init__(name)
        if fmt not in self._ITEM_BYTES:
            raise ValueError(f"unknown IQ format {fmt!r}")
        self.path = Path(path)
        self.fmt = fmt
        self.repeat = repeat
        self.is_blocking = True
        self.stream_outputs = [PortSpec("out", np.complex64)]
        self.rate_out = (1,)
        self.notifies = True  # the reader thread wakes the executor
        from futuresdr_tpu.native import NativeRing, iq_bytes_to_complex64

        self._to_c64 = iq_bytes_to_complex64
        self._ring_bytes = ring_bytes
        self._ring = NativeRing(ring_bytes)
        self._eof = threading.Event()
        self._stop = threading.Event()
        self._consumed = 0  # bytes delivered to the executor (checkpoint)
        self._resume_at = 0  # first-pass file offset after a restore
        self._thread = threading.Thread(target=self._reader, daemon=True)
        self._thread.start()

    def _reader(self) -> None:
        item = self._ITEM_BYTES[self.fmt]
        first = True
        while not self._stop.is_set():
            with open(self.path, "rb") as f:
                if first and self._resume_at:
                    f.seek(self._resume_at)
                first = False
                while not self._stop.is_set():
                    space = self._ring.writable()
                    if space < item:
                        time.sleep(0.001)
                        continue
                    data = f.read(min(space - space % item, 1 << 20))
                    if not data:
                        break
                    off = 0
                    while off < len(data) and not self._stop.is_set():
                        off += self._ring.write(data[off:])
                    self.notify_data()
            if not self.repeat:
                break
        self._eof.set()
        self.notify_data()

    def host_produce(self, n: int, port: int = 0):
        import numpy as _np

        item = self._ITEM_BYTES[self.fmt]
        want = n * item
        if want > self._ring.capacity:
            raise ValueError(
                f"IQFileSource chunk needs {want} B but ring_bytes is only "
                f"{self._ring.capacity} B; construct with ring_bytes >= the "
                f"compiled chunk size ({n} samples x {item} B)"
            )
        deadline = time.monotonic() + 5.0
        while (
            self._ring.readable() < want
            and not self._eof.is_set()
            and time.monotonic() < deadline
        ):
            time.sleep(0.0005)
        if self._ring.readable() < want and not self._eof.is_set():
            # Deadline expired mid-stream (slow producer, not EOF): return an
            # empty chunk so the executor retries, rather than a short chunk
            # whose zero-padding would corrupt stateful device filter history.
            return _np.zeros(0, _np.complex64)
        avail = self._ring.readable() - self._ring.readable() % item
        raw = self._ring.read(min(want, avail))
        if not raw:
            return None if self._eof.is_set() else _np.zeros(0, _np.complex64)
        self._consumed += len(raw)
        return self._to_c64(raw, self.fmt)

    def host_state(self):
        return {"consumed": self._consumed}

    def set_host_state(self, state) -> None:
        # restart the reader thread at the checkpointed stream position
        # (prefetched-but-undelivered ring bytes are intentionally dropped)
        from futuresdr_tpu.native import NativeRing

        self._stop.set()
        self._thread.join(timeout=10)
        self._consumed = int(state["consumed"])
        size = self.path.stat().st_size
        self._resume_at = (
            self._consumed % size if self.repeat and size else self._consumed
        )
        self._ring = NativeRing(self._ring_bytes)
        self._eof = threading.Event()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._reader, daemon=True)
        self._thread.start()

    def on_finish(self) -> None:
        self._stop.set()


class FileSink(Block):
    """Raw binary file sink (parity: file_sink.rs:96)."""

    def __init__(self, path, dtype=np.float32, name: Optional[str] = None):
        super().__init__(name)
        self.path = Path(path)
        self.is_blocking = True
        dt = np.dtype(dtype)
        self.stream_inputs = [PortSpec("in", dt)]
        self.rate_in = (1,)
        self._dtype = dt
        # opened lazily: a checkpoint restore must see the existing file
        # intact (eager "wb" in __init__ would truncate it before
        # set_host_state could continue it)
        self._f = None
        self.n_written = 0

    def _file(self):
        if self._f is None or self._f.closed:
            # reopen after on_finish (a rerun graph, sweep/soak-style):
            # append if this sink already wrote output, else fresh file
            self._f = open(self.path, "ab" if self.n_written else "wb")
        return self._f

    def host_consume(self, arr: np.ndarray, tags, port: int = 0) -> None:
        self._file().write(
            np.ascontiguousarray(arr.astype(self._dtype)).tobytes()
        )
        self.n_written += arr.shape[-1]

    def host_state(self):
        if self._f is not None and not self._f.closed:
            self._f.flush()
        return {"n_written": self.n_written}

    def set_host_state(self, state) -> None:
        # continue the file from exactly the checkpointed length
        self.n_written = int(state["n_written"])
        want = self.n_written * self._dtype.itemsize
        if self._f is not None:
            self._f.close()
        if want == 0 and not self.path.exists():
            # snapshot was taken before the first chunk arrived (the file
            # is opened lazily) — resume with a fresh lazy open
            self._f = None
            return
        have = self.path.stat().st_size if self.path.exists() else -1
        if have < want:
            raise ValueError(
                f"cannot resume FileSink: {self.path} has {have} B but the "
                f"checkpoint recorded {want} B of output"
            )
        self._f = open(self.path, "r+b")
        self._f.truncate(want)
        self._f.seek(want)

    def on_finish(self) -> None:
        if self._f is not None and not self._f.closed:
            self._f.flush()
            self._f.close()


class WavSink(Block):
    """WAV sink (parity: audio/wav_sink.rs via hound; here the stdlib
    ``wave`` module). Input is f32 in [-1, 1]. ``encoding`` selects
    16-bit PCM (default) or G.711 ``"ulaw"``/``"alaw"`` (formats 7/6,
    via :mod:`futuresdr_tpu.dsp.g711` — the telephony-archive formats
    ``AudioFileSource`` reads back)."""

    def __init__(
        self,
        path,
        sample_rate: int,
        channels: int = 1,
        encoding: str = "pcm16",
        name: Optional[str] = None,
    ):
        super().__init__(name)
        if encoding not in ("pcm16", "ulaw", "alaw"):
            raise ValueError(
                f"encoding must be 'pcm16', 'ulaw' or 'alaw', "
                f"got {encoding!r}"
            )
        self.path = Path(path)
        self.sample_rate = int(sample_rate)
        self.channels = int(channels)
        self.encoding = encoding
        self.is_blocking = True
        self.stream_inputs = [PortSpec("in", np.float32)]
        self.rate_in = (1,)
        self._closed = False
        # open eagerly so a bad path fails at construction, not after the
        # whole run; frames stream incrementally
        if encoding == "pcm16":
            self._w = wave.open(str(self.path), "wb")
            self._w.setnchannels(self.channels)
            self._w.setsampwidth(2)
            self._w.setframerate(self.sample_rate)
        else:
            # stdlib wave writes only PCM; emit the RIFF header by hand
            # and patch the sizes at close
            self._f = open(self.path, "wb")
            import struct

            tag = 7 if encoding == "ulaw" else 6
            fmt = struct.pack(
                "<HHIIHH",
                tag,
                self.channels,
                self.sample_rate,
                self.sample_rate * self.channels,
                self.channels,
                8,
            )
            self._f.write(b"RIFF\x00\x00\x00\x00WAVE")
            self._f.write(b"fmt " + struct.pack("<I", len(fmt)) + fmt)
            self._f.write(b"data\x00\x00\x00\x00")
            self._n_bytes = 0

    def host_consume(self, arr: np.ndarray, tags, port: int = 0) -> None:
        pcm = np.clip(arr * 32767.0, -32768, 32767).astype(np.int16)
        if self.encoding == "pcm16":
            self._w.writeframes(pcm.tobytes())
        else:
            from futuresdr_tpu.dsp import g711

            enc = (
                g711.ulaw_encode(pcm)
                if self.encoding == "ulaw"
                else g711.alaw_encode(pcm)
            )
            self._f.write(enc)
            self._n_bytes += len(enc)

    def on_finish(self) -> None:
        if self._closed:
            return
        self._closed = True
        if self.encoding == "pcm16":
            self._w.close()
            return
        import struct

        f = self._f
        f.seek(4)
        f.write(struct.pack("<I", 4 + 8 + 16 + 8 + self._n_bytes))
        f.seek(0, 2)
        end = f.tell()
        f.seek(end - self._n_bytes - 4)
        f.write(struct.pack("<I", self._n_bytes))
        f.close()


class ChannelSource(Block):
    """Host source fed from a python queue (parity: channel_source.rs:97 —
    futures mpsc → flowgraph). ``push(arr)`` from any thread; ``close()``
    signals EOS."""

    def __init__(self, dtype=np.complex64, maxsize: int = 64, name=None):
        super().__init__(name)
        dt = np.dtype(dtype)
        self.stream_outputs = [PortSpec("out", dt)]
        self.rate_out = (1,)
        self.is_blocking = True
        self.notifies = True  # push()/close() wake the executor
        self._q: "queue.Queue[Optional[np.ndarray]]" = queue.Queue(maxsize)
        self._buf = np.zeros((0,), dtype=dt)
        self._closed = False

    def push(self, arr) -> None:
        self._q.put(np.asarray(arr))
        self.notify_data()

    def close(self) -> None:
        self._q.put(None)
        self.notify_data()

    def host_produce(self, n: int, port: int = 0):
        # non-blocking: push() wakes the executor's event-driven idle
        # wait, so blocking here would only delay delivery of data
        # already in flight
        while self._buf.shape[-1] < n and not self._closed:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is None:
                self._closed = True
                break
            self._buf = np.concatenate([self._buf, item], axis=-1)
        if self._closed:
            if self._buf.shape[-1] == 0:
                return None
            out, self._buf = self._buf[..., :n], self._buf[..., n:]
            return out  # final (possibly short) chunk at EOS
        if self._buf.shape[-1] < n:
            # mid-stream partials would zero-pad into stateful blocks —
            # wait for a full chunk
            return np.zeros((0,), self._buf.dtype)
        out, self._buf = self._buf[..., :n], self._buf[..., n:]
        return out


class ChannelSink(Block):
    """Host sink pushing chunks into a python queue
    (parity: channel_sink.rs:75)."""

    def __init__(self, dtype=np.float32, maxsize: int = 64, name=None):
        super().__init__(name)
        self.stream_inputs = [PortSpec("in", np.dtype(dtype))]
        self.rate_in = (1,)
        self.is_blocking = True
        self.queue: "queue.Queue[Optional[np.ndarray]]" = queue.Queue(maxsize)

    def host_consume(self, arr: np.ndarray, tags, port: int = 0) -> None:
        self.queue.put(np.array(arr))

    def on_finish(self) -> None:
        self.queue.put(None)
