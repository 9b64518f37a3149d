"""Smallest possible flowgraph (parity: examples/minimal.rs).

NullSource → Head(1234) → NullSink: the whole pipeline lives on device;
Head's cap finishes the run after exactly 1234 items.

Run:  python examples/minimal.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from futuresdr_tpu import Flowgraph, Runtime, connect  # noqa: E402
from futuresdr_tpu.blocks import Head, NullSink, NullSource  # noqa: E402


def main() -> None:
    fg = Flowgraph()
    src = NullSource(dtype=np.uint8)
    head = Head(1234, dtype=np.uint8)
    snk = NullSink(dtype=np.uint8)
    connect(fg, src, head, snk)
    Runtime(chunk_size=512).run(fg)
    print("done: 1234 items through the sink")


if __name__ == "__main__":
    main()
