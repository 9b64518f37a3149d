"""Stream feedback circuits (``close_circuit`` → lax.scan regions).

Parity: ``src/runtime/flowgraph.rs:433`` (``close_circuit`` / the ``<``
operator) and ``src/runtime/buffer/circuit.rs`` — the reference circulates
owned buffers around a cycle; here the cycle compiles to a ``lax.scan``
section inside the fused step with the feedback edge as a z^-D delay line
carried in state.
"""

import numpy as np
import pytest

from futuresdr_tpu import Flowgraph, Runtime
from futuresdr_tpu.blocks import (
    Apply,
    Combine,
    VectorSink,
    VectorSource,
)
from futuresdr_tpu.runtime.compiler import RateError, compile_flowgraph


def run(fg, chunk=256, **kw):
    return Runtime(chunk_size=chunk).run(fg, **kw)


def _leaky_ref(x, a, delay=1):
    """y[n] = x[n] + a*y[n-delay] reference implementation."""
    y = np.zeros(len(x), np.float64)
    for n in range(len(x)):
        prev = y[n - delay] if n >= delay else 0.0
        y[n] = x[n] + a * prev
    return y.astype(np.float32)


def _build_loop(x, a, delay):
    """src → (+) → sink, with (+)'s second input fed back via gain a."""
    fg = Flowgraph()
    src = VectorSource(x)
    add = Combine(lambda p, q: p + q, a_dtype=np.float32)
    gain = Apply(lambda v: np.float32(a) * v, in_dtype=np.float32)
    snk = VectorSink(np.float32)
    fg.add(src), fg.add(add), fg.add(gain), fg.add(snk)
    fg.stream(src, add, dst_port=0)
    fg.stream(add, gain)
    fg.close_circuit(gain, add, dst_port=1, delay=delay)
    fg.stream(add, snk)
    return fg, snk


def test_leaky_integrator_delay1():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(1000).astype(np.float32)
    a = 0.9
    fg, snk = _build_loop(x, a, delay=1)
    run(fg, chunk=128)
    np.testing.assert_allclose(snk.data(), _leaky_ref(x, a), rtol=2e-4, atol=1e-6)


def test_comb_feedback_delay4():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(600).astype(np.float32)
    a = -0.5
    fg, snk = _build_loop(x, a, delay=4)
    run(fg, chunk=64)
    np.testing.assert_allclose(snk.data(), _leaky_ref(x, a, 4), rtol=2e-4, atol=1e-6)


def test_chunk_level_feedback_no_scan():
    """delay == chunk items degenerates to chunk feedback (n_iters == 1)."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal(512).astype(np.float32)
    a = 0.25
    fg, snk = _build_loop(x, a, delay=64)
    cfg = compile_flowgraph(fg, chunk_size=64)
    assert len(cfg.regions) == 1
    assert cfg.regions[0].n_iters == 1
    run(fg, chunk=64)
    np.testing.assert_allclose(snk.data(), _leaky_ref(x, a, 64), rtol=2e-4, atol=1e-6)


def test_scan_region_metadata():
    x = np.zeros(256, np.float32)
    fg, _ = _build_loop(x, 0.5, delay=1)
    cfg = compile_flowgraph(fg, chunk_size=64)
    assert len(cfg.regions) == 1
    r = cfg.regions[0]
    assert r.granularity == 1
    assert r.n_iters == 64
    assert len(r.members) == 2  # add + gain


def test_three_loop_transitive_merge():
    """A loop spanning two previously-disjoint loops must fuse all three
    into ONE scan region (the merge is transitive), and the nested
    recurrence must match the sample-level reference."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal(512).astype(np.float32)
    b1, b2 = 0.5, 0.4

    fg = Flowgraph()
    src = VectorSource(x)
    a0 = Combine(lambda p, q: p + q, a_dtype=np.float32)
    a1 = Combine(lambda p, q: p + q, a_dtype=np.float32)
    g1 = Apply(lambda v: np.float32(b1) * v, in_dtype=np.float32)
    a2 = Combine(lambda p, q: p + q, a_dtype=np.float32)
    g2 = Apply(lambda v: np.float32(b2) * v, in_dtype=np.float32)
    snk = VectorSink(np.float32)
    for b in (src, a0, a1, g1, a2, g2, snk):
        fg.add(b)
    fg.stream(src, a0, dst_port=0)
    fg.stream(a0, a1, dst_port=0)
    fg.stream(a1, g1)
    fg.stream(g1, a2, dst_port=0)
    fg.stream(a2, g2)
    fg.stream(g2, snk)
    # loop order matters for the regression: two disjoint inner loops
    # first, then the outer loop that overlaps both
    fg.close_circuit(g1, a1, dst_port=1, delay=1)
    fg.close_circuit(g2, a2, dst_port=1, delay=1)
    fg.close_circuit(g2, a0, dst_port=1, delay=2)

    cfg = compile_flowgraph(fg, chunk_size=64)
    assert len(cfg.regions) == 1
    assert len(cfg.regions[0].fb_edges) == 3
    assert len(cfg.regions[0].members) == 5  # a0 a1 g1 a2 g2

    run(fg, chunk=64)

    # sample-level reference of the nested recurrence
    n = len(x)
    g1r = np.zeros(n + 1, np.float64)
    g2r = np.zeros(n + 2, np.float64)
    out = np.zeros(n, np.float64)
    for i in range(n):
        v0 = x[i] + g2r[i]  # g2 delayed by 2 (index i = sample i-2)
        v1 = v0 + g1r[i]  # g1 delayed by 1
        g1r[i + 1] = b1 * v1
        v2 = g1r[i + 1] + g2r[i + 1]  # g2 delayed by 1
        g2r[i + 2] = b2 * v2
        out[i] = g2r[i + 2]
    np.testing.assert_allclose(
        snk.data(), out.astype(np.float32), rtol=2e-4, atol=1e-6
    )


def test_delay_free_cycle_rejected():
    fg = Flowgraph()
    a = Apply(lambda v: v, in_dtype=np.float32)
    b = Apply(lambda v: v, in_dtype=np.float32)
    fg.add(a), fg.add(b)
    fg.stream(a, b)
    fg.stream(b, a)  # plain forward edge closes the cycle: algebraic loop
    with pytest.raises(RateError, match="delay-free"):
        compile_flowgraph(fg, chunk_size=64)


def test_open_circuit_rejected():
    """close_circuit without a forward return path is an error."""
    fg = Flowgraph()
    src = VectorSource(np.zeros(64, np.float32))
    a = Apply(lambda v: v, in_dtype=np.float32)
    add = Combine(lambda p, q: p + q, a_dtype=np.float32)
    snk = VectorSink(np.float32)
    for blk in (src, a, add, snk):
        fg.add(blk)
    fg.stream(src, add, dst_port=0)
    fg.stream(add, snk)
    fg.stream(src, a)  # `a` feeds the loop edge but is not fed by add
    with pytest.raises(RateError, match="does not close a cycle"):
        fg2 = fg
        fg2.close_circuit(a, add, dst_port=1, delay=1)
        compile_flowgraph(fg2, chunk_size=64)


def test_in_stream_agc_loop():
    """The canonical user: per-sample AGC as a real stream cycle.

    y[n] = x[n] * g[n];  g[n+1] = clip(g[n] + rate*(ref − |y[n]|)).
    The gain block holds g as block state; the feedback edge delivers
    g[n+1] to the multiplier one sample later.
    """
    import jax.numpy as jnp

    from futuresdr_tpu.runtime.block import Block, PortSpec

    rate, ref = 0.05, 1.0

    class GainUpdate(Block):
        def __init__(self):
            super().__init__()
            self.stream_inputs = [PortSpec("y", np.float32)]
            self.stream_outputs = [PortSpec("g", np.float32)]
            self.rate_in = (1,)
            self.rate_out = (1,)

        def make_state(self, in_sizes, out_sizes):
            return jnp.float32(1.0)

        def apply(self, state, inputs, params):
            # granularity-1 region: exactly one item per call
            y = inputs[0][0]
            g = jnp.clip(state + rate * (ref - jnp.abs(y)), 0.0, 100.0)
            return g, [g[None]], {}

    amp = np.concatenate(
        [np.full(300, 4.0), np.full(300, 0.25)]
    ).astype(np.float32)
    rng = np.random.default_rng(3)
    phase = np.sign(rng.standard_normal(600)).astype(np.float32)
    x = amp * phase

    fg = Flowgraph()
    src = VectorSource(x)
    mul = Combine(lambda v, g: v * g, a_dtype=np.float32)
    upd = GainUpdate()
    snk = VectorSink(np.float32)
    for blk in (src, mul, upd, snk):
        fg.add(blk)
    fg.stream(src, mul, dst_port=0)
    fg.stream(mul, upd)
    fg.close_circuit(upd, mul, dst_port=1, delay=1)
    fg.stream(mul, snk)
    # initial gain 1.0 on the first sample
    e = [e for e in fg.stream_edges if e.feedback][0]
    fg.feedback_init[e] = 1.0
    run(fg, chunk=100)

    y = snk.data()
    # serial reference
    g = 1.0
    y_ref = np.zeros_like(x)
    for n in range(len(x)):
        y_ref[n] = x[n] * g
        g = float(np.clip(g + rate * (ref - abs(y_ref[n])), 0.0, 100.0))
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-5)
    # and it actually controls gain: converged output magnitude ≈ ref
    assert abs(np.mean(np.abs(y[200:300])) - ref) < 0.15
    assert abs(np.mean(np.abs(y[500:])) - ref) < 0.15


def test_feedback_region_rate_change_rejected():
    from futuresdr_tpu.blocks import Fir

    fg = Flowgraph()
    src = VectorSource(np.zeros(256, np.float32))
    add = Combine(lambda p, q: p + q, a_dtype=np.float32)
    dec = Fir.decimating(np.ones(4, np.float32) / 4, 2, dtype=np.float32)
    up = Apply(lambda v: np.repeat(v, 2), in_dtype=np.float32)
    up.rate_in = (1,)
    up.rate_out = (2,)
    snk = VectorSink(np.float32)
    for blk in (src, add, dec, up, snk):
        fg.add(blk)
    fg.stream(src, add, dst_port=0)
    fg.stream(add, dec)
    fg.stream(dec, up)
    fg.close_circuit(up, add, dst_port=1, delay=1)
    fg.stream(add, snk)
    with pytest.raises(RateError, match="common rate"):
        compile_flowgraph(fg, chunk_size=64)


def test_region_external_producer_after_first_member():
    """A region member whose only input is the feedback edge has
    in-degree 0 and can topo-sort BEFORE the producer of another
    member's external input; the region must still compile (the order
    is condensed so regions evaluate after all external producers).
    Regression: this graph raised KeyError at trace time."""
    x = np.arange(64, dtype=np.float32)
    fg = Flowgraph()
    src = VectorSource(x)
    xb = Apply(lambda v: v + 1.0, in_dtype=np.float32)
    a = Apply(lambda v: np.float32(0.5) * v, in_dtype=np.float32)
    add = Combine(lambda p, q: p + q, a_dtype=np.float32)
    snk = VectorSink(np.float32)
    for blk in (src, xb, a, add, snk):
        fg.add(blk)
    fg.stream(src, xb)
    fg.stream(a, add, dst_port=0)
    fg.stream(xb, add, dst_port=1)
    fg.close_circuit(add, a, delay=1)
    fg.stream(add, snk)
    run(fg, chunk=32)
    ref = np.zeros(64, np.float64)
    for n in range(64):
        ref[n] = (x[n] + 1.0) + 0.5 * (ref[n - 1] if n else 0.0)
    np.testing.assert_allclose(
        snk.data(), ref.astype(np.float32), rtol=1e-5, atol=1e-6
    )


def test_comb_feedback_delay6_nondivisor_granularity():
    """delay=6 with 128-item chunks: granularity is now 4 (largest
    divisor of the chunk <= delay; gcd gave 2). Any G <= D is exact —
    each iteration reads the oldest G of the D-deep buffer, which are
    precisely the D-delayed values for its G outputs."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal(1000).astype(np.float32)
    a = 0.8
    fg, snk = _build_loop(x, a, delay=6)
    run(fg, chunk=128)
    np.testing.assert_allclose(
        snk.data(), _leaky_ref(x, a, delay=6), rtol=2e-4, atol=1e-6
    )
