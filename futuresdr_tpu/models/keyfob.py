"""Car keyfob OOK receiver (parity: examples/keyfob).

The reference chain (main.rs): IQ → resample to 250 kS/s → magnitude →
moving average → threshold → Manchester edge decoder with preamble
``10101111`` and command suffix bytes (decoder.rs:36-51, 75-113).

Device: |x|, moving-average smoothing and thresholding in one jitted pass.
Host: the edge-duration Manchester state machine (half-bit 63–83 samples,
full-bit 131–161 at 250 kS/s, decoder.rs:78-110).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import List, Optional

import jax
import numpy as np

from futuresdr_tpu.models.streaming import StreamingReceiver
from futuresdr_tpu.ops import cplx

RATE = 250_000.0
HALF = range(63, 84)  # half-bit duration window (decoder.rs:78)
FULL = range(131, 162)
PREAMBLE = "10101111"
COMMANDS = {
    "11010101": "Close",
    "11100011": "Open",
    "10111001": "Trunk",
}
HALF_N = 73  # nominal half-bit samples


@lru_cache(maxsize=None)
def _envelope_fn(n: int, kmax: int):
    """Envelope → threshold → EDGE EXTRACTION on device: only the edge
    positions and pre-edge levels cross D2H (one packed leaf, ~26 KB)
    instead of the full thresholded stream (~n bytes + a round-trip per
    leaf through tunneled backends). The TRUE edge count rides in slot
    0 so a chattering envelope (deep fading, interferers around the
    threshold) triggers an adaptive re-run instead of silently
    truncating edges the host walk would have decoded."""
    import jax.numpy as jnp

    def fn(xc):
        from futuresdr_tpu.ops.fir import moving_sum
        from futuresdr_tpu.ops.packing import pack_int_f32

        mag = xc.abs()
        sm = moving_sum(mag, 16) * (1.0 / 16.0)
        thr = 0.5 * jnp.max(sm)
        lv = (sm > thr).astype(jnp.int8)
        edge = lv[1:] != lv[:-1]
        n_edges = jnp.sum(edge.astype(jnp.int32))
        idx = jnp.nonzero(edge, size=kmax, fill_value=-1)[0].astype(
            jnp.int32
        )
        before = jnp.where(idx >= 0, lv[jnp.maximum(idx, 0)], 0)
        packed = jnp.concatenate(
            [
                jnp.asarray(n_edges, jnp.float32).reshape(1),
                pack_int_f32(idx),
                before.astype(jnp.float32),
            ]
        )
        return packed

    return jax.jit(fn)


def _default_kmax(n: int) -> int:
    return max(256, (n // HALF_N) * 3)


@dataclass
class KeyfobFrame:
    bits: str
    command: Optional[str]


def _decode_edges(
    edges: np.ndarray, level_before_arr: np.ndarray
) -> List[KeyfobFrame]:
    """decoder.rs state machine over device-extracted edges
    (positions + the level BEFORE each transition)."""
    frames: List[KeyfobFrame] = []
    out: List[str] = []
    half_pending = False

    def flush():
        nonlocal half_pending
        s = "".join(out)
        out.clear()
        half_pending = False
        off = s.find(PREAMBLE)
        if off < 0:
            return
        s = s[off:]
        if len(s) >= 8:
            cmd = next(
                (name for suf, name in COMMANDS.items() if s.endswith(suf)),
                None,
            )
            frames.append(KeyfobFrame(bits=s, command=cmd))

    prev = None
    for e, level_before in zip(edges, level_before_arr):
        level_before = int(level_before)  # 1→0 falling if 1
        if prev is not None:
            diff = int(e - prev)
            bit = "1" if level_before == 1 else "0"
            if diff in HALF:
                if not half_pending:
                    half_pending = True
                else:
                    half_pending = False
                    out.append(bit)
            elif diff in FULL:
                half_pending = False
                out.append(bit)
            else:
                flush()
        prev = e
    flush()
    return frames


class KeyfobReceiver(StreamingReceiver):
    """process/process_stream come from :class:`StreamingReceiver` —
    the device envelope program dispatches per chunk without a host
    sync; the fetch + edge walk land in ``_collect``."""

    def __init__(self):
        self.frames: List[KeyfobFrame] = []

    def _dispatch(self, iq):
        x = np.asarray(iq, np.complex64)
        pad = (-len(x)) % 16384
        if pad:
            x = np.concatenate([x, np.zeros(pad, np.complex64)])
        xc = cplx.from_numpy(x)
        return xc, _envelope_fn(len(x), _default_kmax(len(x)))(xc)

    def _collect(self, dev) -> List[KeyfobFrame]:
        from futuresdr_tpu.ops.packing import unpack_int_f32

        xc, packed_d = dev
        n = int(xc.shape[-1])
        kmax = _default_kmax(n)
        while True:
            packed = np.asarray(packed_d)
            n_edges = int(packed[0])
            if n_edges <= kmax or kmax >= n:
                break
            # edge overflow (chattering envelope): adaptive re-run at
            # the next pow2 budget — loss-free, like the LoRa/WLAN
            # candidate retries
            kmax = min(n, 1 << (n_edges - 1).bit_length())
            packed_d = _envelope_fn(n, kmax)(xc)
        idx = unpack_int_f32(packed[1 : 1 + kmax])
        before = packed[1 + kmax :]
        sel = idx >= 0  # -1 = nonzero() fill sentinel
        out = _decode_edges(idx[sel], before[sel])
        self.frames.extend(out)
        return out


def synthesize(bits: str, pad: int = 2000) -> np.ndarray:
    """Manchester-OOK a bit string at 250 kS/s (bit '1' = high→low)."""
    wave = [np.zeros(pad, np.float32)]
    for b in bits:
        hi = np.ones(HALF_N, np.float32)
        lo = np.zeros(HALF_N, np.float32)
        wave.extend([hi, lo] if b == "1" else [lo, hi])
    # final edge back to idle low
    wave.append(np.zeros(pad, np.float32))
    env = np.concatenate(wave)
    return (env * np.exp(2j * np.pi * 0.01 * np.arange(len(env)))).astype(
        np.complex64
    )
