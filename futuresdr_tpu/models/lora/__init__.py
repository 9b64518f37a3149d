"""LoRa CSS modem (parity: examples/lora — EPFL gr-lora_sdr lineage)."""

from futuresdr_tpu.models.lora.phy import (
    LoraConfig,
    LoraReceiver,
    modulate_frame,
)

__all__ = ["LoraConfig", "LoraReceiver", "modulate_frame"]
