"""Property tests for the SDF compiler's chunk/latency math.

Random chains of rate-changing blocks must produce exactly what composing
the underlying ops over the whole stream produces (modulo the documented
leading-transient trim). This guards the rational-rate solver, the
128-aligned multiplier, per-edge latency accumulation, and valid-count
propagation in one sweep.
"""

import numpy as np
import pytest

from futuresdr_tpu import Flowgraph, Runtime, connect
from futuresdr_tpu.blocks import Apply, Delay, Fir, VectorSink, VectorSource


def _reference_chain(x, specs):
    """Apply the chain semantics directly on the full stream.

    A Delay below a transient-producing stage degrades to a pure shift
    (documented in Delay.absorb_latency), so it inserts zeros only while
    no filter has run yet."""
    y = x.astype(np.complex64)
    transient_seen = False
    for kind, arg in specs:
        if kind == "fir":
            y = np.convolve(y, arg, mode="valid")
            transient_seen = True
        elif kind == "decim":
            taps, q = arg
            full = np.convolve(y, taps, mode="valid")
            import math

            m0 = math.ceil((len(taps) - 1) / q)
            y = full[m0 * q - (len(taps) - 1) :: q]
            transient_seen = True
        elif kind == "scale":
            y = y * arg
        elif kind == "delay":
            if not transient_seen:
                y = np.concatenate([np.zeros(arg, y.dtype), y])
    return y


@pytest.mark.parametrize("seed", range(12))
def test_random_multirate_chain_matches_direct(seed):
    rng = np.random.default_rng(seed)
    n = 60_000
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64
    )

    specs = []
    blocks = []
    n_stages = rng.integers(2, 5)
    for _ in range(n_stages):
        kind = rng.choice(["fir", "decim", "scale", "delay"])
        if kind == "fir":
            taps = rng.standard_normal(int(rng.integers(3, 48))).astype(
                np.float32
            )
            specs.append(("fir", taps))
            blocks.append(Fir(taps))
        elif kind == "decim":
            q = int(rng.choice([2, 3, 4]))
            taps = rng.standard_normal(int(rng.integers(4, 32))).astype(
                np.float32
            )
            specs.append(("decim", (taps, q)))
            blocks.append(Fir.decimating(taps, q))
        elif kind == "scale":
            k = float(rng.standard_normal())
            specs.append(("scale", k))
            blocks.append(Apply(lambda v, k=k: v * k))
        else:
            d = int(rng.integers(1, 200))
            specs.append(("delay", d))
            blocks.append(Delay(d))

    fg = Flowgraph()
    snk = VectorSink(np.complex64)
    connect(fg, VectorSource(x), *blocks, snk)
    chunk = int(rng.choice([1000, 4096, 8192, 30000]))
    Runtime(chunk_size=chunk).run(fg)
    got = snk.data()
    ref = _reference_chain(x, specs)

    m = min(len(got), len(ref))
    assert m > 0.5 * len(ref), f"only {m} of {len(ref)} items delivered"
    err = np.max(np.abs(got[:m] - ref[:m]))
    scale = np.max(np.abs(ref[:m])) + 1e-9
    assert err / scale < 1e-4, f"seed {seed}: rel err {err / scale}"


@pytest.mark.parametrize("seed", range(4))
def test_random_chain_scan_batching_identical(seed):
    """steps_per_call=K must be bit-identical to single-step execution
    on random multirate chains (valid counts, latency trim, tags)."""
    from futuresdr_tpu import config

    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(40_000, 120_000))
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64
    )

    def build():
        fg = Flowgraph()
        src = VectorSource(x)
        taps = rng.standard_normal(int(rng.integers(5, 33))).astype(
            np.float32
        )
        f = Fir(taps)
        a = Apply(lambda v: v * 0.5)
        snk = VectorSink(dtype=np.complex64)
        connect(fg, src, f, a, snk)
        return fg, snk

    state = rng.bit_generator.state
    fg1, s1 = build()
    Runtime(chunk_size=8192).run(fg1)
    rng.bit_generator.state = state  # same taps second time
    fg2, s2 = build()
    config.set("steps_per_call", 3)
    try:
        Runtime(chunk_size=8192).run(fg2)
    finally:
        config.set("steps_per_call", "auto")
    np.testing.assert_array_equal(s1.data(), s2.data())


def test_aux_delivery_identical_across_dispatch_modes():
    """Per-chunk aux (ApplyIntoIter variable counts) must arrive in the
    same order with the same values whether chunks are dispatched one at
    a time, as a stacked lax.scan batch, or through the unrolled K-step
    (which re-stacks aux from K separate step calls)."""
    import jax.numpy as jnp

    from futuresdr_tpu import config
    from futuresdr_tpu.blocks import ApplyIntoIter

    n = 50_000
    x = (np.arange(n) % 97).astype(np.float32)

    def fn(v):
        y = jnp.repeat(v[:, None], 3, axis=1)
        counts = (v.astype(np.int32) % 3) + 1  # data-dependent 1..3
        return y, counts

    def run(steps_per_call, unroll_min):
        fg = Flowgraph()
        b = ApplyIntoIter(fn, 3, np.float32, variable=True)
        snk = VectorSink(np.float32)
        connect(fg, VectorSource(x), b, snk)
        seen = []
        orig = b.on_aux
        b.on_aux = lambda a: (seen.append(np.asarray(a["counts"])), orig(a))[1]
        config.set("steps_per_call", steps_per_call)
        config.set("scan_unroll_min_chunk", unroll_min)
        try:
            Runtime(chunk_size=8192).run(fg)
        finally:
            config.set("steps_per_call", "auto")
            config.set("scan_unroll_min_chunk", 1 << 19)
        return snk.data(), np.concatenate(seen)

    d1, c1 = run(1, 1 << 19)
    d_scan, c_scan = run(3, 1 << 19)  # stacked-operand scan
    d_unr, c_unr = run(3, 0)  # unrolled separate-operand path
    np.testing.assert_array_equal(d1, d_scan)
    np.testing.assert_array_equal(d1, d_unr)
    np.testing.assert_array_equal(c1, c_scan)
    np.testing.assert_array_equal(c1, c_unr)


@pytest.mark.parametrize("seed", range(2))
def test_random_chain_unrolled_batching_identical(seed):
    """The UNROLLED K-step dispatch (host-fed batches above
    scan_unroll_min_chunk — static indexing instead of lax.scan's
    dynamic slicing) must also be bit-identical to single-step runs,
    including the partial tail batch at EOS."""
    from futuresdr_tpu import config

    rng = np.random.default_rng(300 + seed)
    n = int(rng.integers(40_000, 120_000))
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64
    )

    def build():
        fg = Flowgraph()
        src = VectorSource(x)
        taps = rng.standard_normal(int(rng.integers(5, 33))).astype(
            np.float32
        )
        f = Fir(taps)
        a = Apply(lambda v: v * 0.5)
        snk = VectorSink(dtype=np.complex64)
        connect(fg, src, f, a, snk)
        return fg, snk

    state = rng.bit_generator.state
    fg1, s1 = build()
    Runtime(chunk_size=8192).run(fg1)
    rng.bit_generator.state = state  # same taps second time
    fg2, s2 = build()
    config.set("steps_per_call", 3)
    config.set("scan_unroll_min_chunk", 0)  # force the unrolled path
    try:
        Runtime(chunk_size=8192).run(fg2)
    finally:
        config.set("steps_per_call", "auto")
        config.set("scan_unroll_min_chunk", 1 << 19)
    np.testing.assert_array_equal(s1.data(), s2.data())
