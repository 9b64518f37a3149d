"""ZigBee / IEEE 802.15.4 O-QPSK TX → noisy channel → RX.

Parity: ``examples/zigbee/src/bin/trx.rs`` — a text payload becomes a
PHY frame (preamble, SFD, length, PSDU+FCS), chip-spread O-QPSK IQ at
4 MS/s, and decodes back through the chip correlator.

Run:  python examples/zigbee_trx.py "your message"
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from futuresdr_tpu.models.zigbee.zigbee import (  # noqa: E402
    ZigbeeReceiver,
    make_phy_frame,
    modulate,
)


def main() -> None:
    text = sys.argv[1] if len(sys.argv) > 1 else "zigbee says hi"
    frame = make_phy_frame(text.encode())
    iq = np.asarray(modulate(frame), np.complex64)
    print(f"{len(text)} chars -> {len(frame)} PHY bytes -> {len(iq)} IQ samples")

    rng = np.random.default_rng(0)
    prms = np.sqrt(np.mean(np.abs(iq) ** 2))
    sigma = prms * 10 ** (-6 / 20) / np.sqrt(2)  # 6 dB SNR
    sig = np.concatenate(
        [np.zeros(4000, np.complex64), iq, np.zeros(4000, np.complex64)]
    )
    sig += sigma * (
        rng.standard_normal(len(sig)) + 1j * rng.standard_normal(len(sig))
    ).astype(np.complex64)

    for f in ZigbeeReceiver().process(sig):
        print(
            f"decoded @ {f.start}: {f.payload.decode(errors='replace')!r} "
            f"(fcs {'ok' if f.crc_ok else 'BAD'})"
        )


if __name__ == "__main__":
    main()
