"""CW (Morse) beacon — text → keyed tone (parity: examples/cw).

Run:  python examples/cw.py "CQ CQ DE TPU" out.wav
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from futuresdr_tpu import Flowgraph, Runtime  # noqa: E402
from futuresdr_tpu.blocks import Combine, SignalSource, VectorSource, WavSink  # noqa: E402

MORSE = {
    "A": ".-", "B": "-...", "C": "-.-.", "D": "-..", "E": ".", "F": "..-.",
    "G": "--.", "H": "....", "I": "..", "J": ".---", "K": "-.-", "L": ".-..",
    "M": "--", "N": "-.", "O": "---", "P": ".--.", "Q": "--.-", "R": ".-.",
    "S": "...", "T": "-", "U": "..-", "V": "...-", "W": ".--", "X": "-..-",
    "Y": "-.--", "Z": "--..", "0": "-----", "1": ".----", "2": "..---",
    "3": "...--", "4": "....-", "5": ".....", "6": "-....", "7": "--...",
    "8": "---..", "9": "----.", " ": " ",
}


def keying_envelope(
    text: str, sample_rate: float, wpm: float = 20.0, ramp: int = 64
) -> np.ndarray:
    """Text → on/off keying envelope (PARIS timing: dit = 1.2/wpm s)."""
    dit = int(round(1.2 / wpm * sample_rate))
    out = []
    on, off = np.ones(dit, np.float32), np.zeros(dit, np.float32)
    for ch in text.upper():
        code = MORSE.get(ch)
        if code is None:
            continue
        if code == " ":
            out.extend([off] * 4)  # word gap = 7 dits (3 already added)
            continue
        for sym in code:
            out.append(on if sym == "." else np.ones(3 * dit, np.float32))
            out.append(off)
        out.extend([off] * 2)  # letter gap = 3 dits total
    env = np.concatenate(out) if out else np.zeros(0, np.float32)
    # raised-cosine key clicks removal
    if ramp > 1 and len(env) > 2 * ramp:
        win = 0.5 * (1 - np.cos(np.pi * np.arange(ramp) / ramp))
        edges = np.flatnonzero(np.diff(env))
        for e in edges:
            if env[e] < env[e + 1]:  # rising
                env[e + 1 : e + 1 + ramp] = win[: len(env[e + 1 : e + 1 + ramp])]
            else:  # falling
                seg = env[e + 1 : e + 1 + ramp]
                env[e + 1 : e + 1 + ramp] = win[::-1][: len(seg)]
    return env


def build_cw(text: str, sample_rate: float = 8000.0, tone: float = 600.0):
    fg = Flowgraph()
    env = keying_envelope(text, sample_rate)
    key = VectorSource(env)
    osc = SignalSource(tone, sample_rate, kind="sin")
    mix = Combine(lambda a, b: a * b, np.float32)
    fg.stream(key, mix, dst_port=0)
    fg.stream(osc, mix, dst_port=1)
    return fg, mix, len(env)


def main() -> None:
    text = sys.argv[1] if len(sys.argv) > 1 else "CQ CQ DE TPU"
    out = sys.argv[2] if len(sys.argv) > 2 else "cw_out.wav"
    fs = 8000.0
    fg, tail, n = build_cw(text, fs)
    fg.stream(tail, WavSink(out, int(fs)))
    Runtime(chunk_size=4096).run(fg)
    print(f"wrote {out} ({n / fs:.1f} s)")


if __name__ == "__main__":
    main()
