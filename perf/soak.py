"""Long-run soak: throughput stability + host memory over minutes.

Production streams run for hours; a leak in the executor loop (growing
tag lists, jit-cache churn, unreleased device buffers) or a slow
throughput sag would not show up in the second-long benches. This warms
(compiles) first, then runs a flowgraph continuously for ``--minutes``
and reports per-minute throughput plus current RSS. Exit code 1 if
throughput sags >30% from the first to the last minute, or RSS grows
beyond ``--rss-limit-mb`` plus a 2.5 KB-per-step allowance for the dev
tunnel backend's measured per-call retention (the gate targets OUR
executor, not the backend).

Run:  python perf/soak.py [--minutes 10] [--kind device|fetch]
"""

from __future__ import annotations

import argparse
import json
import resource
import sys
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from futuresdr_tpu import Flowgraph, connect  # noqa: E402
from futuresdr_tpu.blocks import (  # noqa: E402
    Fir,
    NullSink,
    NullSource,
    FileSink,
)
from futuresdr_tpu.runtime.executor import (  # noqa: E402
    Executor,
    _enable_compile_cache,
)


def _rss_mb() -> float:
    """Current RSS (not ru_maxrss, which is a high-water mark and would
    count transient compile spikes as permanent growth)."""
    try:
        with open("/proc/self/statm") as f:
            pages = int(f.read().split()[1])
        return pages * resource.getpagesize() / (1024.0 * 1024.0)
    except OSError:  # non-Linux fallback: peak RSS
        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=10.0)
    ap.add_argument("--chunk", type=int, default=1 << 20)
    ap.add_argument(
        "--kind",
        choices=["device", "fetch"],
        default="device",
        help="device: no-D2H NullSink soak; fetch: FileSink(/dev/null) "
        "exercises the per-step D2H delivery path",
    )
    ap.add_argument(
        "--cpu",
        action="store_true",
        help="force CPU in-process (env vars are ignored on containers "
        "that pin a TPU backend at interpreter start)",
    )
    ap.add_argument(
        "--rss-limit-mb",
        type=float,
        default=600.0,
        help="fail if host RSS grows more than this over the run. The "
        "dev tunnel backend retains ~1.5-2 KB per dispatched call "
        "(measured; independent of our executor), so the ceiling is per "
        "backend, not universal",
    )
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    _enable_compile_cache()
    rng = np.random.default_rng(0)
    fg = Flowgraph()
    chain = [NullSource(np.complex64)]
    for _ in range(2):
        chain.append(Fir(rng.standard_normal(64).astype(np.float32)))
    if args.kind == "device":
        chain.append(NullSink(np.complex64))
    else:
        chain.append(FileSink("/dev/null", np.complex64))
    connect(fg, *chain)

    # warm (compile) BEFORE the clock starts: TPU compile latency is
    # 2-250 s and would otherwise eat the soak window and pollute the
    # first-minute rate the sag gate compares against
    ex = Executor(fg, chunk_size=args.chunk, max_steps=2)
    ex.running = True
    ex.run_loop()
    warm_items = sum(ex.items_delivered.values())

    rss0 = _rss_mb()
    ex.max_steps = None
    t0 = time.monotonic()
    t_end = t0 + args.minutes * 60.0  # the ONE shutdown deadline
    minutes = []
    done = threading.Event()

    def watcher():
        # per-minute samples + the stop request, one deadline
        last_items, last_t = warm_items, t0
        while not done.wait(min(60.0, max(0.0, t_end - time.monotonic()))):
            now = time.monotonic()
            items = sum(ex.items_delivered.values())
            minutes.append(
                {
                    "min": len(minutes) + 1,
                    "gsps": (items - last_items) / (now - last_t) / 1e9,
                    "rss_mb": round(_rss_mb(), 1),
                }
            )
            print(f"# {minutes[-1]}", file=sys.stderr, flush=True)
            last_items, last_t = items, now
            if now >= t_end:
                ex.request_stop()
                return
        if time.monotonic() >= t_end:
            ex.request_stop()

    watching = threading.Thread(target=watcher, daemon=True)
    watching.start()
    ex.run_loop()
    done.set()
    dt = time.monotonic() - t0
    total = sum(ex.items_delivered.values()) - warm_items
    rss1 = _rss_mb()

    first = minutes[0]["gsps"] if minutes else total / dt / 1e9
    last = minutes[-1]["gsps"] if minutes else first
    sag = max(0.0, 1.0 - last / max(first, 1e-12))
    # the dev tunnel retains ~1.5-2 KB host RSS per dispatched call
    # (measured, below our layer); long runs get that allowance on top of
    # the absolute limit so the gate tests OUR executor, not the backend
    allowance = args.rss_limit_mb + 2.5 * ex.steps_run / 1024.0
    ok = sag < 0.30 and (rss1 - rss0) < allowance
    print(
        json.dumps(
            {
                "metric": "soak",
                "kind": args.kind,
                "minutes": round(dt / 60.0, 2),
                "steps": ex.steps_run,
                "gsps_mean": round(total / dt / 1e9, 4),
                "gsps_first_min": round(first, 4),
                "gsps_last_min": round(last, 4),
                "sag_pct": round(100 * sag, 1),
                "rss_start_mb": round(rss0, 1),
                "rss_end_mb": round(rss1, 1),
                "ok": ok,
            }
        )
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
