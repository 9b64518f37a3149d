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
    if level is None:
        level = os.environ.get("FUTURESDR_TPU_LOG")
    if level is None:
        from futuresdr_tpu import config

        level = str(config.get("log_level", "info"))
    if _initialized:
        # already wired: still honor an explicit re-level request
        logger.setLevel(getattr(logging, level.upper(), logging.INFO))
        return
    handler = logging.StreamHandler()
    handler.setFormatter(
        logging.Formatter(
            "%(asctime)s %(levelname).1s %(name)s %(message)s",
            datefmt="%H:%M:%S",
        )
    )
    logger.addHandler(handler)
    # the framework logger owns its handler: without this, an app that
    # also configured the ROOT logger would print every record twice
    logger.propagate = False
    logger.setLevel(getattr(logging, level.upper(), logging.INFO))
    _initialized = True
