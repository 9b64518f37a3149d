"""Mueller-Müller clock recovery (ops/mm.py + blocks ClockRecoveryMM).

Golden reference: a direct Python transcription of the recurrence in
``/root/reference/examples/zigbee/src/clock_recovery_mm.rs`` (behavioral
spec, not code reuse).
"""

import math

import numpy as np

from futuresdr_tpu import Flowgraph, Runtime
from futuresdr_tpu.blocks import ClockRecoveryMM, VectorSink, VectorSource


def mm_ref(x, omega, gain_omega, mu, gain_mu, omega_relative_limit):
    """The reference work() loop, run once over the whole input."""
    omega_mid = omega
    omega_limit = omega * omega_relative_limit
    look_ahead = int(math.ceil(omega + omega_limit + gain_mu))
    sgn = lambda v: 1.0 if v > 0 else -1.0  # noqa: E731
    ii, last, out = 0, 0.0, []
    omega = np.float32(omega)
    mu = np.float32(mu)
    x = np.asarray(x, np.float32)
    while ii + look_ahead < len(x):
        y = np.float32(x[ii] + mu * (x[ii + 1] - x[ii]))
        out.append(y)
        e = np.float32(sgn(last) * y - sgn(y) * last)
        last = y
        omega = np.float32(omega + np.float32(gain_omega) * e)
        omega = np.float32(
            omega_mid
            + np.clip(omega - omega_mid, -omega_limit, omega_limit)
        )
        mu = np.float32(mu + omega + np.float32(gain_mu) * e)
        adv = np.float32(np.floor(mu))
        ii += int(adv)
        mu = np.float32(mu - adv)
    return np.asarray(out, np.float32)


def _nrz(bits, sps):
    """±1 NRZ at sps samples/symbol."""
    return np.repeat(2.0 * bits - 1.0, sps).astype(np.float32)


ARGS = dict(
    omega=2.0, gain_omega=0.0001, mu=0.5, gain_mu=0.03,
    omega_relative_limit=0.002,
)


def test_kernel_matches_reference_loop():
    from futuresdr_tpu.ops.mm import mm_init, mm_process

    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 400)
    x = _nrz(bits, 2) + 0.05 * rng.standard_normal(800).astype(np.float32)

    ref = mm_ref(x, **ARGS)

    look_ahead = int(
        math.ceil(ARGS["omega"] * (1 + ARGS["omega_relative_limit"]) + ARGS["gain_mu"])
    )
    st = mm_init(ARGS["omega"])
    st = st._replace(mu=np.float32(ARGS["mu"]))
    st, out, valid = mm_process(
        st,
        x,
        n_out=len(x),
        look_ahead=look_ahead,
        omega_mid=ARGS["omega"],
        omega_limit=ARGS["omega"] * ARGS["omega_relative_limit"],
        gain_omega=ARGS["gain_omega"],
        gain_mu=ARGS["gain_mu"],
    )
    got = np.asarray(out)[np.asarray(valid)]
    assert len(got) == len(ref)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_block_chunked_equals_one_shot():
    """Chunked flowgraph run == one continuous reference run."""
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, 3000)
    x = _nrz(bits, 2) + 0.02 * rng.standard_normal(6000).astype(np.float32)

    ref = mm_ref(x, **ARGS)

    fg = Flowgraph()
    snk = VectorSink(np.float32)
    src = VectorSource(x)
    mm = ClockRecoveryMM(**ARGS)
    fg.add(src), fg.add(mm), fg.add(snk)
    fg.stream(src, mm)
    fg.stream(mm, snk)
    Runtime(chunk_size=512).run(fg)

    got = snk.data()
    got = got[got != 0.0]  # drop masked slots (NRZ±noise is never 0.0)
    # the chunked tail may withhold the last few symbols until EOS pad
    m = min(len(got), len(ref))
    assert m > len(ref) - 4
    np.testing.assert_allclose(got[:m], ref[:m], rtol=1e-4, atol=1e-5)


def test_tracks_sample_rate_offset():
    """The real job: lock to a clock 1% off nominal and slice the right
    symbols (half-sine pulses give the detector a timing gradient)."""
    rng = np.random.default_rng(2)
    bits = rng.integers(0, 2, 2000)
    sps_true = 4.04  # 1% SRO vs nominal omega=4
    n = int(len(bits) * sps_true) - 2
    k = np.arange(n)
    sym = np.floor(k / sps_true).astype(int)
    phase = k / sps_true - sym
    x = ((2.0 * bits[sym] - 1.0) * np.sin(np.pi * phase)).astype(np.float32)

    from futuresdr_tpu.ops.mm import mm_init, mm_process

    st = mm_init(4.0)
    st, out, valid = mm_process(
        st,
        x,
        n_out=len(x) // 3,
        look_ahead=5,
        omega_mid=4.0,
        omega_limit=4.0 * 0.02,
        gain_omega=0.01,
        gain_mu=0.2,
    )
    got = np.asarray(out)[np.asarray(valid)]
    # omega must have converged near the true rate
    assert abs(float(st.omega) - sps_true) < 0.02
    # and post-lock decisions must match the bit stream (align search ±4)
    dec = (got[200:] > 0).astype(int)
    best = 0.0
    for s in range(-4, 5):
        ref_bits = bits[200 + s : 200 + s + len(dec)]
        m = min(len(ref_bits), len(dec))
        best = max(best, np.mean(dec[:m] == ref_bits[:m]))
    assert best > 0.99


def test_mm_absorbs_upstream_latency():
    """Upstream transient latency must NOT front-trim the compacted symbol
    stream: ClockRecoveryMM absorbs it (a trim would drop a real symbol
    and shift the mm_valid window past a zero slot)."""
    from futuresdr_tpu.blocks import QuadratureDemod
    from futuresdr_tpu.runtime.compiler import compile_flowgraph

    fg = Flowgraph()
    src = VectorSource(np.zeros(1 << 12, np.complex64))
    demod = QuadratureDemod(gain=1.0)  # latency_out = (1,)
    mm = ClockRecoveryMM(
        omega=2.0, gain_omega=1e-4, mu=0.5, gain_mu=0.03,
        omega_relative_limit=0.01,
    )
    snk = VectorSink(np.float32)
    for b in (src, demod, mm, snk):
        fg.add(b)
    fg.stream(src, demod)
    fg.stream(demod, mm)
    fg.stream(mm, snk)
    cfg = compile_flowgraph(fg, chunk_size=1 << 11)
    (snk_id,) = [i for i, b in enumerate(fg.blocks) if b is snk]
    assert cfg.sink_latency[snk_id] == [0]
