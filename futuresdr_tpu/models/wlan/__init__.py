"""802.11a/g OFDM modem (the reference's flagship app, examples/wlan)."""

from futuresdr_tpu.models.wlan.consts import MCS, FrameParam, Mcs
from futuresdr_tpu.models.wlan.rx import (
    RxFrame,
    WlanReceiver,
    prepare_device_iq,
)
from futuresdr_tpu.models.wlan.tx import encode_frame, make_mac_frame
from futuresdr_tpu.models.wlan.mac import (
    WlanMac,
    mac_data_frame,
    parse_mac_frame,
)

__all__ = [
    "MCS",
    "FrameParam",
    "Mcs",
    "RxFrame",
    "WlanReceiver",
    "prepare_device_iq",
    "encode_frame",
    "make_mac_frame",
    "WlanMac",
    "mac_data_frame",
    "parse_mac_frame",
]
