"""LoRa CSS modem (parity: examples/lora — EPFL gr-lora_sdr lineage)."""

from futuresdr_tpu.models.lora.phy import (
    LoraConfig,
    LoraReceiver,
    modulate_frame,
)
from futuresdr_tpu.models.lora.packet_forwarder import (
    PacketForwarderClient,
)
from futuresdr_tpu.models.lora.meshtastic import (
    PRESETS as MESHTASTIC_PRESETS,
    MeshtasticChannel,
    MeshtasticChannels,
)

__all__ = [
    "LoraConfig",
    "LoraReceiver",
    "modulate_frame",
    "MESHTASTIC_PRESETS",
    "MeshtasticChannel",
    "PacketForwarderClient",
    "MeshtasticChannels",
]
