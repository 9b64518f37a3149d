"""Logging (parity: src/runtime/logging.rs — tracing_subscriber with the
``FUTURESDR_LOG`` env filter; here stdlib logging with
``FUTURESDR_TPU_LOG``)."""

from __future__ import annotations

import logging
import os

logger = logging.getLogger("futuresdr_tpu")
_initialized = False


def init_logging(level: str | None = None) -> None:
    """Idempotent setup; level from arg → env FUTURESDR_TPU_LOG →
    config ``log_level``."""
    global _initialized
    if _initialized:
        return
    if level is None:
        level = os.environ.get("FUTURESDR_TPU_LOG")
    if level is None:
        from futuresdr_tpu import config

        level = str(config.get("log_level", "info"))
    handler = logging.StreamHandler()
    handler.setFormatter(
        logging.Formatter(
            "%(asctime)s %(levelname).1s %(name)s %(message)s",
            datefmt="%H:%M:%S",
        )
    )
    logger.addHandler(handler)
    logger.setLevel(getattr(logging, level.upper(), logging.INFO))
    _initialized = True
