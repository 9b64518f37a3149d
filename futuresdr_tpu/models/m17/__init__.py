"""M17 4FSK digital voice/data modem (parity: examples/m17)."""

from futuresdr_tpu.models.m17.phy import (
    M17Frame,
    M17Receiver,
    decode_callsign,
    encode_callsign,
    make_lsf,
    modulate_transmission,
)

__all__ = [
    "M17Frame",
    "M17Receiver",
    "decode_callsign",
    "encode_callsign",
    "make_lsf",
    "modulate_transmission",
]
