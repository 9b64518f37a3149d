"""Message-port throughput (parity: perf/msg — Pmt handler dispatch rate).

Run:  python perf/msg_bench.py [--n 200000]
Prints CSV: path,msgs,elapsed_s,msgs_per_s
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from futuresdr_tpu import Flowgraph, Runtime, connect  # noqa: E402
from futuresdr_tpu.blocks import (  # noqa: E402
    Head,
    MessageCopy,
    MessageSink,
    NullSink,
    NullSource,
)
from futuresdr_tpu.types.pmt import Pmt  # noqa: E402


def bench_direct(n: int) -> float:
    """Block-to-block fan-out chain (in-graph post path)."""
    fg = Flowgraph()
    a, b, c = MessageCopy(), MessageCopy(), MessageSink()
    for blk in (a, b, c):
        fg.add(blk)
    fg.message(a, "out", b, "in")
    fg.message(b, "out", c, "in")
    connect(fg, NullSource(np.complex64), Head(1, np.complex64), NullSink(np.complex64))
    from futuresdr_tpu.runtime.executor import Executor

    ex = Executor(fg, chunk_size=1024)  # wires _post_fn
    pmt = Pmt.from_py(123)
    t0 = time.perf_counter()
    for _ in range(n):
        a.call_handler("in", pmt)
    dt = time.perf_counter() - t0
    assert len(c.received) == n
    return dt


def bench_handle_post(n: int) -> float:
    """FlowgraphHandle.post → executor queue → handler."""
    fg = Flowgraph()
    snk = MessageSink()
    fg.add(snk)
    connect(
        fg,
        NullSource(np.complex64),
        Head(1 << 30, np.complex64),
        NullSink(np.complex64),
    )
    h = Runtime(chunk_size=65536).start(fg)
    t0 = time.perf_counter()
    for _ in range(n):
        h.post(snk, "in", 1)
    while len(snk.received) < n:
        time.sleep(0.005)
    dt = time.perf_counter() - t0
    h.stop()
    h.wait(timeout=30)
    return dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    args = ap.parse_args()
    print("path,msgs,elapsed_s,msgs_per_s")
    dt = bench_direct(args.n)
    print(f"in_graph_chain,{args.n},{dt:.3f},{args.n / dt:.0f}", flush=True)
    n2 = max(1000, args.n // 20)
    dt = bench_handle_post(n2)
    print(f"handle_post,{n2},{dt:.3f},{n2 / dt:.0f}", flush=True)


if __name__ == "__main__":
    main()
