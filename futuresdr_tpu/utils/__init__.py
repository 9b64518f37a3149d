"""Utilities: logging + profiling (aux subsystem parity, SURVEY.md §5)."""

from futuresdr_tpu.utils.logging import init_logging, logger
from futuresdr_tpu.utils.profiling import trace

__all__ = ["init_logging", "logger", "trace"]
