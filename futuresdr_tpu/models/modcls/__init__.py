"""ML modulation classification (parity: examples/burn — the reference's
ML-tensor integration example, rebuilt on flax/optax)."""

from futuresdr_tpu.models.modcls.modcls import (
    CLASSES,
    ModClassifier,
    make_dataset,
)

__all__ = ["CLASSES", "ModClassifier", "make_dataset"]
