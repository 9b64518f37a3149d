"""Logging configuration demo (parity: examples/logging/logging.rs).

The reference builds a custom tracing subscriber with a ``FOO_LOG`` env
filter and DEBUG default, then times a 20-message MessageSource graph.
Here: ``init_logging`` honors ``FUTURESDR_TPU_LOG`` (the reference's
``FUTURESDR_LOG``), and the app logs through the same logger the
framework uses.

Run:  FUTURESDR_TPU_LOG=debug python examples/logging_demo.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from futuresdr_tpu import Flowgraph, Runtime  # noqa: E402
from futuresdr_tpu.blocks import MessageSink, MessageSource  # noqa: E402
from futuresdr_tpu.utils.logging import init_logging, logger  # noqa: E402


def main() -> None:
    os.environ.setdefault("FUTURESDR_TPU_LOG", "debug")  # logging.rs:18
    init_logging()

    fg = Flowgraph()
    src = MessageSource("hello", interval=0.1, count=20)
    snk = MessageSink()
    fg.message(src, "out", snk, "in")

    t0 = time.perf_counter()
    logger.info("starting flowgraph")
    Runtime().run(fg)
    logger.info(
        "flowgraph took %.2fs (%d messages)",
        time.perf_counter() - t0,
        len(snk.received),
    )


if __name__ == "__main__":
    main()
