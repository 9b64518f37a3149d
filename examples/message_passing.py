"""Message-plane hello world (parity: examples/message-passing.rs).

MessageSource emits a Pmt every 100 ms, 20 times; MessageCopy forwards;
MessageSink counts. The stream plane stays empty — this exercises the
Pmt fan-out path alone.

Run:  python examples/message_passing.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from futuresdr_tpu import Flowgraph, Runtime  # noqa: E402
from futuresdr_tpu.blocks import (  # noqa: E402
    MessageCopy,
    MessageSink,
    MessageSource,
)


def main() -> None:
    fg = Flowgraph()
    src = MessageSource("foo", interval=0.1, count=20)
    cp = MessageCopy()
    snk = MessageSink()
    fg.message(src, "out", cp, "in")
    fg.message(cp, "out", snk, "in")
    Runtime().run(fg)
    print(f"received {len(snk.received)} messages")


if __name__ == "__main__":
    main()
