"""Rattlegram-style OFDM acoustic modem (parity target: examples/rattlegram
— COFDMTV lineage): polar-coded DQPSK OFDM over 48 kHz audio. The waveform
architecture matches the reference (symbol/guard geometry, MLS sync, 256
carriers, order-11 polar code); byte-exact interop is future work."""

from futuresdr_tpu.models.rattlegram.phy import (
    RattlegramFrame,
    RattlegramReceiver,
    encode_frame,
)
from futuresdr_tpu.models.rattlegram.polar import (
    frozen_mask,
    polar_decode_sc,
    polar_decode_scl,
    polar_encode_systematic,
)
from futuresdr_tpu.models.rattlegram.bch import Bch

__all__ = [
    "RattlegramFrame",
    "RattlegramReceiver",
    "encode_frame",
    "frozen_mask",
    "polar_decode_sc",
    "polar_decode_scl",
    "polar_encode_systematic",
    "Bch",
]
