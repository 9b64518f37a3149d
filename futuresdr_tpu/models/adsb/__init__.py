"""ADS-B (Mode S / 1090ES) receiver (parity: examples/adsb)."""

from futuresdr_tpu.models.adsb.adsb import (
    AdsbFrame,
    AdsbReceiver,
    synthesize_frame,
    encode_df17,
)

__all__ = ["AdsbFrame", "AdsbReceiver", "synthesize_frame", "encode_df17"]
