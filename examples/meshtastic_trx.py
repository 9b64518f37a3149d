"""Meshtastic TX → channel → RX loopback (parity:
``examples/lora/src/bin/tx_meshtastic.rs`` + ``rx_meshtastic.rs``, minus
the SDR hardware ends).

Usage::

    python examples/meshtastic_trx.py "hello mesh" [PRESET]

Encodes the text on the default LongFast channel, modulates a LoRa frame
with the Meshtastic sync word (0x2B), passes it through an AWGN channel,
then demodulates, decrypts, and prints the message.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from futuresdr_tpu.models.lora import (  # noqa: E402
    MESHTASTIC_PRESETS,
    LoraReceiver,
    MeshtasticChannel,
    MeshtasticChannels,
    modulate_frame,
)


def main() -> None:
    text = sys.argv[1] if len(sys.argv) > 1 else "hello meshtastic"
    preset_name = sys.argv[2] if len(sys.argv) > 2 else "SHORT_FAST_EU"
    preset = MESHTASTIC_PRESETS[preset_name]
    cfg = preset.phy()
    print(
        f"preset {preset_name}: SF{preset.sf} BW{preset.bw//1000}k "
        f"CR4/{4+preset.cr} @ {preset.freq/1e6:.4f} MHz "
        f"ldro={'on' if preset.ldro else 'off'}"
    )

    chan = MeshtasticChannel("LongFast", "AQ==")
    frame = chan.encode(text, sender=0x3A48290E, packet_id=1)
    iq = modulate_frame(cfg, frame)
    print(f"frame: {len(frame)} bytes -> {len(iq)} baseband samples")

    rng = np.random.default_rng(0)
    noise = 0.05 * (
        rng.standard_normal(len(iq) + 8 * cfg.n)
        + 1j * rng.standard_normal(len(iq) + 8 * cfg.n)
    ).astype(np.complex64)
    sig = noise.copy()
    sig[4 * cfg.n : 4 * cfg.n + len(iq)] += iq

    rx = LoraReceiver(cfg)
    frames = rx.process(sig)
    chans = MeshtasticChannels()
    for f in frames:
        msg = chans.decode(f.payload)
        if msg is None:
            print(f"frame @ {f.start}: undecodable (wrong key?)")
        else:
            print(
                f"[{msg['channel']}] {msg.get('text', msg['payload'])!r} "
                f"from {msg['sender']:#010x} (snr {f.snr:.1f} dB, "
                f"crc {'ok' if f.crc_ok else 'BAD'})"
            )
    if not frames:
        print("no frames detected")


if __name__ == "__main__":
    main()
