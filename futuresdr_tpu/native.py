"""ctypes bridge to the native host-boundary runtime (native/ringbuf.cpp).

Compiles the shared object on first use with ``g++ -O3`` (cached next to
the source); every entry point has a numpy fallback so the framework works
without a toolchain.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).resolve().parent.parent / "native" / "ringbuf.cpp"
_SO = _SRC.with_suffix(".so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[ctypes.CDLL]:
    if _SO.exists() and _SO.stat().st_mtime >= _SRC.stat().st_mtime:
        return ctypes.CDLL(str(_SO))
    try:
        subprocess.run(
            [
                "g++",
                "-O3",
                "-march=native",
                "-shared",
                "-fPIC",
                "-std=c++17",
                str(_SRC),
                "-o",
                str(_SO),
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return ctypes.CDLL(str(_SO))
    except Exception:
        return None


def lib() -> Optional[ctypes.CDLL]:
    """The native library, or None when unavailable."""
    global _lib, _tried
    with _lock:
        if not _tried:
            _tried = True
            _lib = _build()
            if _lib is not None:
                _declare(_lib)
        return _lib


def _declare(m: ctypes.CDLL) -> None:
    u64, i64 = ctypes.c_uint64, ctypes.c_int64
    p = ctypes.c_void_p
    m.ring_create.restype = p
    m.ring_create.argtypes = [u64]
    m.ring_destroy.argtypes = [p]
    m.ring_capacity.restype = u64
    m.ring_capacity.argtypes = [p]
    m.ring_readable.restype = u64
    m.ring_readable.argtypes = [p]
    m.ring_writable.restype = u64
    m.ring_writable.argtypes = [p]
    m.ring_write.restype = u64
    m.ring_write.argtypes = [p, ctypes.c_char_p, u64]
    m.ring_read.restype = u64
    m.ring_read.argtypes = [p, ctypes.c_char_p, u64]
    for name, t_in in [
        ("cs8_to_planar_f32", ctypes.POINTER(ctypes.c_int8)),
        ("cu8_to_planar_f32", ctypes.POINTER(ctypes.c_uint8)),
        ("cs16_to_planar_f32", ctypes.POINTER(ctypes.c_int16)),
        ("cf32_to_planar_f32", ctypes.POINTER(ctypes.c_float)),
    ]:
        fn = getattr(m, name)
        fn.restype = None
        fn.argtypes = [
            t_in,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            i64,
        ]
    m.planar_f32_to_cf32.restype = None
    m.planar_f32_to_cf32.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        i64,
    ]
    m.planar_f32_to_cs16.restype = None
    m.planar_f32_to_cs16.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int16),
        i64,
    ]
    u8p = ctypes.POINTER(ctypes.c_uint8)
    m.viterbi_r12.restype = None
    m.viterbi_r12.argtypes = [
        ctypes.c_int,
        ctypes.c_uint32,
        ctypes.c_uint32,
        u8p,
        u8p,
        i64,
        u8p,
    ]
    m.viterbi_r12_soft.restype = None
    m.viterbi_r12_soft.argtypes = [
        ctypes.c_int,
        ctypes.c_uint32,
        ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_float),
        i64,
        u8p,
    ]
    m.polar_scl_decode.restype = None
    m.polar_scl_decode.argtypes = [
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        u8p,
        u8p,
        ctypes.POINTER(ctypes.c_double),
    ]
    m.udp_reader_start.restype = p
    m.udp_reader_start.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        p,
        ctypes.c_int,
        ctypes.c_int,
    ]
    m.udp_reader_port.restype = ctypes.c_int
    m.udp_reader_port.argtypes = [p]
    m.udp_reader_stat.restype = u64
    m.udp_reader_stat.argtypes = [p, ctypes.c_int]
    m.udp_reader_stop.restype = None
    m.udp_reader_stop.argtypes = [p]


_IN_DTYPE = {
    "cs8": np.int8,
    "cu8": np.uint8,
    "cs16": np.int16,
    "cf32": np.float32,
}
# wire bytes per complex sample, shared by every IQ ingest block
IQ_ITEM_BYTES = {"cs8": 2, "cu8": 2, "cs16": 4, "cf32": 8}
_SCALE = {
    "cs8": 1.0 / 128.0,
    "cu8": 1.0 / 127.5,
    "cs16": 1.0 / 32768.0,
    "cf32": 1.0,
}
# offset removed before scaling (cu8 is offset-binary, the rtl_tcp wire fmt)
_OFFSET = {"cu8": 127.5}


def convert_iq(raw: np.ndarray, fmt: str):
    """Interleaved IQ (2n scalars of ``fmt``) → planar (re, im) float32.

    Uses the native converter when available, numpy otherwise."""
    n = raw.size // 2
    re = np.empty(n, np.float32)
    im = np.empty(n, np.float32)
    m = lib()
    raw = np.ascontiguousarray(raw)
    if m is not None:
        fn = {
            "cs8": m.cs8_to_planar_f32,
            "cu8": m.cu8_to_planar_f32,
            "cs16": m.cs16_to_planar_f32,
            "cf32": m.cf32_to_planar_f32,
        }[fmt]
        fn(
            raw.ctypes.data_as(fn.argtypes[0]),
            re.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            im.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n,
        )
    else:
        k = _SCALE[fmt]
        off = _OFFSET.get(fmt, 0.0)
        re[:] = (raw[0::2].astype(np.float32) - off) * k
        im[:] = (raw[1::2].astype(np.float32) - off) * k
    return re, im


def iq_bytes_to_complex64(raw: bytes, fmt: str) -> np.ndarray:
    """Interleaved wire bytes of ``fmt`` → complex64 samples — the one
    shared tail of every IQ ingest block (file, UDP, rtl_tcp), so wire
    formats and scaling live in exactly one place."""
    re, im = convert_iq(np.frombuffer(raw, _IN_DTYPE[fmt]), fmt)
    return (re + 1j * im).astype(np.complex64)


def polar_scl_decode(
    llr: np.ndarray, frozen: np.ndarray, list_size: int
) -> Optional[tuple]:
    """Native LLR-based SCL polar decode (Tal–Vardy CoW banks, see
    native/ringbuf.cpp): returns ``(x_paths [L, n] uint8 codeword
    estimates in metric-ascending order, pm [L])``, or None when the
    native library is unavailable."""
    m = lib()
    if m is None:
        return None
    import ctypes as ct

    n = len(frozen)
    order = n.bit_length() - 1
    if (1 << order) != n:
        return None
    llr32 = np.ascontiguousarray(llr, dtype=np.float32)
    fr = np.ascontiguousarray(frozen, dtype=np.uint8)
    x_out = np.empty((list_size, n), dtype=np.uint8)
    pm = np.empty(list_size, dtype=np.float64)
    m.polar_scl_decode(
        order,
        list_size,
        llr32.ctypes.data_as(ct.POINTER(ct.c_float)),
        fr.ctypes.data_as(ct.POINTER(ct.c_uint8)),
        x_out.ctypes.data_as(ct.POINTER(ct.c_uint8)),
        pm.ctypes.data_as(ct.POINTER(ct.c_double)),
    )
    return x_out, pm


def viterbi_r12_soft(
    k: int,
    g0: int,
    g1: int,
    llrs: np.ndarray,
    n_bits: int,
) -> Optional[np.ndarray]:
    """Native rate-1/2 SOFT-decision Viterbi: ``llrs[2·n_bits]`` float
    per channel bit, positive = bit 1, zero = erasure. None when the
    native library is unavailable."""
    m = lib()
    if m is None or k not in (5, 7):
        return None
    import ctypes as ct

    llrs = np.ascontiguousarray(llrs, dtype=np.float32)
    out = np.empty(n_bits, dtype=np.uint8)
    m.viterbi_r12_soft(
        k,
        g0,
        g1,
        llrs.ctypes.data_as(ct.POINTER(ct.c_float)),
        n_bits,
        out.ctypes.data_as(ct.POINTER(ct.c_uint8)),
    )
    return out


def viterbi_r12(
    k: int,
    g0: int,
    g1: int,
    coded: np.ndarray,
    erasures: Optional[np.ndarray],
    n_bits: int,
) -> Optional[np.ndarray]:
    """Native rate-1/2 hard-decision Viterbi (K ∈ {5, 7}); None when the
    native library is unavailable (callers fall back to numpy)."""
    m = lib()
    if m is None or k not in (5, 7):
        return None
    import ctypes as ct

    coded = np.ascontiguousarray(coded, dtype=np.uint8)
    out = np.empty(n_bits, dtype=np.uint8)
    u8p = ct.POINTER(ct.c_uint8)
    era_ptr = None
    if erasures is not None:
        erasures = np.ascontiguousarray(erasures, dtype=np.uint8)
        era_ptr = erasures.ctypes.data_as(u8p)
    m.viterbi_r12(
        k,
        g0,
        g1,
        coded.ctypes.data_as(u8p),
        era_ptr,
        n_bits,
        out.ctypes.data_as(u8p),
    )
    return out


class NativeRing:
    """SPSC byte ring (native when possible, deque-of-bytes fallback)."""

    def __init__(self, capacity: int):
        m = lib()
        self._m = m
        if m is not None:
            self._h = m.ring_create(capacity)
            if not self._h:
                raise MemoryError("ring_create failed")
            self.capacity = m.ring_capacity(self._h)
        else:
            self._h = None
            self._buf = bytearray()
            self._fallback_lock = threading.Lock()
            self.capacity = capacity

    def readable(self) -> int:
        if self._h is not None:
            return self._m.ring_readable(self._h)
        with self._fallback_lock:
            return len(self._buf)

    def writable(self) -> int:
        if self._h is not None:
            return self._m.ring_writable(self._h)
        with self._fallback_lock:
            return max(0, self.capacity - len(self._buf))

    def write(self, data: bytes) -> int:
        if self._h is not None:
            return self._m.ring_write(self._h, data, len(data))
        with self._fallback_lock:
            take = min(len(data), self.capacity - len(self._buf))
            self._buf.extend(data[:take])
            return take

    def read(self, n: int) -> bytes:
        if self._h is not None:
            out = ctypes.create_string_buffer(n)
            got = self._m.ring_read(self._h, out, n)
            return out.raw[:got]
        with self._fallback_lock:
            out = bytes(self._buf[:n])
            del self._buf[: len(out)]
            return out

    def __del__(self):
        if getattr(self, "_h", None) is not None and self._m is not None:
            self._m.ring_destroy(self._h)
            self._h = None


class NativeUdpReader:
    """Native UDP → SPSC-ring ingest thread (no GIL on the hot path).

    A C++ thread drains datagrams straight into ``ring`` — the TPU-native
    form of the reference's ``#[blocking]`` hardware-driver threads
    (``seify/source.rs:53``) for network-attached radios. Whole-datagram
    writes only (a packet that doesn't fit is dropped and counted), so
    sample framing never tears mid-item. Falls back to a Python reader
    thread when the native library is unavailable."""

    def __init__(
        self,
        ring: NativeRing,
        bind: str = "127.0.0.1",
        port: int = 0,
        rcvbuf: int = 1 << 22,
        item_bytes: int = 1,
    ):
        self._m = lib()
        self._ring = ring
        self._thread = None
        self._item = max(1, int(item_bytes))
        if self._m is not None and ring._h is not None:
            self._h = self._m.udp_reader_start(
                bind.encode(), int(port), ring._h, int(rcvbuf), self._item
            )
            if not self._h:
                raise OSError(f"udp_reader_start could not bind {bind}:{port}")
            self.port = int(self._m.udp_reader_port(self._h))
        else:
            import socket as _socket

            self._h = None
            self._sock = _socket.socket(_socket.AF_INET, _socket.SOCK_DGRAM)
            self._sock.bind((bind, port))
            self._sock.settimeout(0.1)
            self.port = self._sock.getsockname()[1]
            self._stats = [0, 0, 0]
            self._stop_ev = threading.Event()
            self._thread = threading.Thread(target=self._py_reader, daemon=True)
            self._thread.start()

    def _py_reader(self) -> None:
        import socket as _socket

        while not self._stop_ev.is_set():
            try:
                data, _ = self._sock.recvfrom(1 << 16)
            except _socket.timeout:
                continue
            except OSError:
                break
            self._stats[0] += 1
            if len(data) % self._item or self._ring.writable() < len(data):
                self._stats[2] += 1  # misaligned or ring full: drop whole
                continue
            self._ring.write(data)
            self._stats[1] += len(data)

    def stats(self):
        """``(datagrams_received, bytes_ringed, datagrams_dropped)``."""
        if self._h is not None:
            return tuple(
                int(self._m.udp_reader_stat(self._h, i)) for i in range(3)
            )
        if getattr(self, "_final_stats", None) is not None:
            return self._final_stats  # native reader already stopped
        return tuple(self._stats)

    def stop(self) -> None:
        if self._h is not None:
            self._final_stats = self.stats()  # keep counters queryable
            self._m.udp_reader_stop(self._h)
            self._h = None
        elif self._thread is not None:
            self._stop_ev.set()
            self._thread.join(timeout=5)
            self._sock.close()
            self._thread = None

    def __del__(self):
        try:
            self.stop()
        except Exception:
            pass
