"""M17 4FSK TX → noisy channel → RX.

Parity: ``examples/m17/src/bin/{tx,rx}.rs`` — an LSF (callsigns, Golay
FEC) plus stream frames at 48 kHz baseband; decodes back with the soft
K=5 Viterbi.

Run:  python examples/m17_trx.py DSTCALL SRCCALL "payload text"
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from futuresdr_tpu.models.m17.phy import (  # noqa: E402
    M17Receiver,
    make_lsf,
    modulate_transmission,
)


def main() -> None:
    dst = sys.argv[1] if len(sys.argv) > 1 else "N0CALL"
    src = sys.argv[2] if len(sys.argv) > 2 else "W1AW"
    text = sys.argv[3] if len(sys.argv) > 3 else "hello m17"
    data = text.encode()
    payloads = [
        data[i : i + 16].ljust(16, b"\x00")
        for i in range(0, max(len(data), 1), 16)
    ]
    lsf = make_lsf(dst, src)
    iq = modulate_transmission(lsf, payloads)
    print(f"{len(payloads)} stream frame(s) -> {len(iq)} samples @ 48 kHz")

    rng = np.random.default_rng(0)
    prms = np.sqrt(np.mean(np.abs(iq) ** 2))
    sigma = prms * 10 ** (-9 / 20) / np.sqrt(2)  # 9 dB SNR
    noisy = (
        iq
        + sigma
        * (rng.standard_normal(len(iq)) + 1j * rng.standard_normal(len(iq)))
    ).astype(np.complex64)

    for f in M17Receiver().process(noisy):
        print(
            f"frame {f.frame_number & 0x7FFF}: {f.dst} <- {f.src}: "
            f"{f.payload.rstrip(bytes(1)).decode(errors='replace')!r} "
            f"(lsf crc {'ok' if f.lsf_crc_ok else 'BAD'})"
        )


if __name__ == "__main__":
    main()
