"""Run the suite's randomized property tests on the REAL backend.

The pytest suite pins a virtual 8-device CPU mesh (tests/conftest.py),
so its random-graph property tests never touch TPU numerics. Chip-only
bugs are real — the int32→f32 denormal flush (ops/packing.py) only
reproduced on hardware — so this driver re-runs the random multirate /
dispatch-equivalence properties plus feedback circuits against whatever
backend JAX picks (the chip, under axon).

Run:  python perf/chip_fuzz.py [--seeds 12]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=12)
    args = ap.parse_args()

    import jax

    print(f"# backend: {jax.devices()[0].platform}", file=sys.stderr)

    from tests.test_rate_properties import (
        test_aux_delivery_identical_across_dispatch_modes,
        test_random_chain_scan_batching_identical,
        test_random_chain_unrolled_batching_identical,
        test_random_multirate_chain_matches_direct,
    )

    checks = [
        ("multirate_vs_direct", test_random_multirate_chain_matches_direct,
         args.seeds),
        ("scan_batching_identical", test_random_chain_scan_batching_identical,
         min(args.seeds, 4)),
        ("unrolled_batching_identical",
         test_random_chain_unrolled_batching_identical, min(args.seeds, 4)),
    ]
    for name, fn, n in checks:
        t0 = time.perf_counter()
        for seed in range(n):
            fn(seed)
        print(f"{name}: {n} seeds ok ({time.perf_counter() - t0:.1f}s)")

    t0 = time.perf_counter()
    test_aux_delivery_identical_across_dispatch_modes()
    print(f"aux_delivery_identical: ok ({time.perf_counter() - t0:.1f}s)")

    # feedback circuits (lax.scan regions) on the chip
    from tests.test_feedback import (
        test_comb_feedback_delay4,
        test_in_stream_agc_loop,
        test_leaky_integrator_delay1,
    )

    t0 = time.perf_counter()
    test_leaky_integrator_delay1()
    test_comb_feedback_delay4()
    test_in_stream_agc_loop()
    print(f"feedback_circuits: ok ({time.perf_counter() - t0:.1f}s)")
    print("CHIP_FUZZ_OK")


if __name__ == "__main__":
    main()
