"""Multi-channel Meshtastic receiver over one wideband capture.

Parity: ``examples/lora/src/bin/rx_meshtastic_all_channels.rs`` — the EU
channel plan: one 1 MS/s stream centered at 869.3 MHz covers three LoRa
channels (BW250 @ 869.525, BW125 @ 869.5875, BW62 @ 869.4925); each is
extracted with a frequency-translating decimating FIR (``XlatingFir``)
and scanned by one LoRa receiver per spreading factor, all inside one
flowgraph. Decoded MeshPackets decrypt through the channel list.

Run:  python examples/meshtastic_all_channels.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from futuresdr_tpu import Flowgraph, Runtime  # noqa: E402
from futuresdr_tpu.blocks import FramedReceiverSink, VectorSource, XlatingFir  # noqa: E402
from futuresdr_tpu.dsp import firdes, windows  # noqa: E402
from futuresdr_tpu.models.lora import (  # noqa: E402
    LoraConfig,
    LoraReceiver,
    MeshtasticChannel,
    MeshtasticChannels,
    modulate_frame,
)
from futuresdr_tpu.models.lora.meshtastic import MESHTASTIC_SYNC_WORD  # noqa: E402

FS = 1_000_000
CENTER = 869_300_000
# EU plan (rx_meshtastic_all_channels.rs:62-91): (bw, freq, [(sf, ldro)])
PLAN = [
    (250_000, 869_525_000, [(7, False), (8, False), (9, False), (10, False), (11, False)]),
    (125_000, 869_587_500, [(11, True), (12, True)]),
    (62_500, 869_492_500, [(12, True)]),
]


def upsample_to_wide(iq_bw: np.ndarray, bw: int, freq: int) -> np.ndarray:
    """Band-limited upsample BW→FS and mix to the channel offset."""
    u = FS // bw
    spec = np.fft.fft(iq_bw)
    n = len(iq_bw)
    wide = np.zeros(n * u, np.complex128)
    wide[: n // 2] = spec[: n // 2]
    wide[-(n - n // 2) :] = spec[n // 2 :]
    x = np.fft.ifft(wide) * u
    t = np.arange(len(x))
    return (x * np.exp(2j * np.pi * (freq - CENTER) * t / FS)).astype(
        np.complex64
    )


def main() -> None:
    chan = MeshtasticChannel("LongFast", "AQ==")
    # three frames on three channels, different SFs
    tx = [
        (250_000, 869_525_000, 7, False, "short fast says hi"),
        (125_000, 869_587_500, 11, True, "long moderate here"),
        (62_500, 869_492_500, 12, True, "very long slow checking in"),
    ]
    rng = np.random.default_rng(0)
    sigs = []
    for bw, freq, sf, ldro, text in tx:
        cfg = LoraConfig(
            sf=sf, cr=1 if not ldro else 4, sync_word=MESHTASTIC_SYNC_WORD, ldro=ldro
        )
        frame = chan.encode(text, sender=0x3A48290E, packet_id=sf)
        sigs.append(upsample_to_wide(modulate_frame(cfg, frame), bw, freq))
    gap = 100_000
    total = sum(len(s_) for s_ in sigs) + gap * (len(sigs) + 1)
    wide = 0.001 * (
        rng.standard_normal(total) + 1j * rng.standard_normal(total)
    ).astype(np.complex64)
    pos = gap
    for sig in sigs:
        wide[pos : pos + len(sig)] += sig
        pos += len(sig) + gap
    print(f"wideband: {len(wide)} samples @ {FS/1e6:.0f} MS/s, 3 frames")

    # one flowgraph: wideband source fans out to 8 channel×SF receivers
    fg = Flowgraph()
    src = VectorSource(wide)
    sinks = []
    for bw, freq, sfs in PLAN:
        decim = FS // bw
        # pass the FULL channel (chirps reach ±BW/2; a narrower cutoff
        # distorts the band edges the CSS demod depends on)
        taps = firdes.lowpass(0.5 / decim, windows.hamming(8 * decim + 1)).astype(
            np.float32
        )
        xl = XlatingFir(taps, decim, center_freq=freq - CENTER, sample_rate=FS)
        fg.stream(src, xl)
        for sf, ldro in sfs:
            cfg = LoraConfig(
                sf=sf, cr=1 if not ldro else 4,
                sync_word=MESHTASTIC_SYNC_WORD, ldro=ldro,
            )
            # a straddling frame must fit inside one window: budget 128
            # symbols of 2^sf samples (preamble + header + a CR4/8 LDRO
            # payload runs ~100 symbols; 90 was measured too small)
            overlap = 128 << sf
            snk = FramedReceiverSink(
                LoraReceiver(cfg),
                overlap=overlap,
                process_size=max(1 << 17, overlap),
                # a re-detection in the next window can anchor to any
                # of the remaining preamble chirps — dedup within the
                # whole preamble span
                dedup_tolerance=(cfg.preamble_len + 5) << sf,
                name=f"rx_bw{bw//1000}_sf{sf}",
            )
            fg.stream(xl, snk)
            sinks.append((bw, sf, snk))
    Runtime().run(fg)

    chans = MeshtasticChannels()
    n_msgs = 0
    for bw, sf, snk in sinks:
        for f in snk.frames:
            if not f.crc_ok:
                continue
            msg = chans.decode(f.payload)
            if msg:
                n_msgs += 1
                print(
                    f"  BW{bw//1000} SF{sf}: [{msg['channel']}] "
                    f"{msg.get('text')!r} (snr {f.snr:.1f} dB)"
                )
    print(f"{n_msgs} messages decoded across the band")


if __name__ == "__main__":
    main()
