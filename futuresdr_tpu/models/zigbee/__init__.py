"""ZigBee / IEEE 802.15.4 O-QPSK modem (parity: examples/zigbee)."""

from futuresdr_tpu.models.zigbee.zigbee import (
    ZigbeeFrame,
    ZigbeeReceiver,
    make_phy_frame,
    modulate,
)

__all__ = ["ZigbeeFrame", "ZigbeeReceiver", "make_phy_frame", "modulate"]
