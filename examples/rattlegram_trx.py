"""Rattlegram-style acoustic modem TX → noisy channel → RX.

Parity: the ``examples/rattlegram`` app flow (encode a short text into a
48 kHz OFDM audio burst; decode it back with the CRC-aided polar list
decoder). Writes the burst to a WAV for listening.

Run:  python examples/rattlegram_trx.py "your message" [out.wav]
"""

from __future__ import annotations

import sys
import wave
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from futuresdr_tpu.models.rattlegram import (  # noqa: E402
    RattlegramReceiver,
    encode_frame,
)


def main() -> None:
    text = sys.argv[1] if len(sys.argv) > 1 else "hello acoustic world"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/rattlegram.wav"

    audio = encode_frame(text.encode())
    with wave.open(out, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(48_000)
        w.writeframes(
            (np.clip(audio, -1, 1) * 32767).astype(np.int16).tobytes()
        )
    print(f"{len(text)} chars -> {len(audio)} samples @ 48 kHz -> {out}")

    rng = np.random.default_rng(0)
    noisy = audio + 0.3 * rng.standard_normal(len(audio)).astype(np.float32)
    sig = np.concatenate(
        [np.zeros(4000, np.float32), noisy, np.zeros(4000, np.float32)]
    )
    frames = RattlegramReceiver(list_size=8).process(sig)
    for f in frames:
        print(
            f"decoded @ {f.start}: {f.payload.decode(errors='replace')!r} "
            f"(crc {'ok' if f.crc_ok else 'BAD'})"
        )
    if not frames:
        print("no frames decoded")


if __name__ == "__main__":
    main()
