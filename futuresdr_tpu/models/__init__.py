"""Flagship signal-processing pipelines (the reference's examples/ tier,
built as reusable graph/step constructors)."""

from futuresdr_tpu.models.pfb_fm_bank import (
    BankConfig,
    make_bank_step,
    make_sharded_bank_step,
)

__all__ = ["BankConfig", "make_bank_step", "make_sharded_bank_step"]
from futuresdr_tpu.models import lora, wlan  # noqa: F401
