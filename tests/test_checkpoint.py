"""Checkpoint/resume: snapshot a flowgraph mid-stream, resume bit-exact.

Beyond reference parity: FutureSDR has no checkpointing (SURVEY.md §5 —
its closest mechanism is reading state back from a *finished* graph).
Here a snapshot captures every block's device carry (filter history,
feedback scans) plus host positions/accumulations, and a resumed run
must produce output identical to one that never stopped.
"""

import threading

import numpy as np
import pytest

from futuresdr_tpu import Flowgraph, Runtime, connect
from futuresdr_tpu.blocks import (
    Agc,
    Fir,
    Head,
    SignalSource,
    Throttle,
    VectorSink,
    VectorSource,
)
from futuresdr_tpu.runtime.executor import Executor


def _taps(n=31, seed=0):
    return np.random.default_rng(seed).standard_normal(n).astype(np.float32)


def _graph(x):
    fg = Flowgraph()
    snk = VectorSink(np.complex64)
    connect(fg, VectorSource(x), Fir(_taps()), snk)
    return fg, snk


def _iq(n, seed=1):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64
    )


def test_resume_matches_uninterrupted(tmp_path):
    """Stateful FIR chain: run 3 steps, snapshot, resume in a fresh
    process-equivalent graph; concatenated output is bit-exact."""
    x = _iq(8 * 4096)
    ckpt = tmp_path / "fg.ckpt"

    # uninterrupted reference
    fg_ref, snk_ref = _graph(x)
    Runtime(chunk_size=4096).run(fg_ref)
    ref = snk_ref.data()

    # first half: 3 steps then snapshot the stopped executor
    fg1, snk1 = _graph(x)
    ex1 = Executor(fg1, chunk_size=4096, max_steps=3)
    ex1.running = True
    ex1.run_loop()
    ex1.snapshot(ckpt)
    part1 = snk1.data()
    assert 0 < len(part1) < len(ref)

    # second half: structurally identical fresh graph, restore, run to EOS
    fg2, snk2 = _graph(x)
    Runtime(chunk_size=4096).run(fg2, restore=str(ckpt))
    out = snk2.data()
    np.testing.assert_array_equal(out, ref)
    # the restored sink contains part1 exactly as a prefix
    np.testing.assert_array_equal(out[: len(part1)], part1)


def test_live_snapshot_on_running_graph(tmp_path):
    """handle.snapshot() on a throttled live graph is consistent: resume
    reproduces the uninterrupted stream bit-exactly."""
    n = 1 << 16
    ckpt = tmp_path / "live.ckpt"

    def graph():
        fg = Flowgraph()
        snk = VectorSink(np.float32)
        connect(
            fg,
            SignalSource(1e3, 48e3, kind="sin"),
            Head(n, np.float32),
            Throttle(400_000, dtype=np.float32),
            Agc(dtype=np.float32),
            snk,
        )
        return fg, snk

    fg_ref, snk_ref = graph()
    Runtime(chunk_size=4096).run(fg_ref)
    ref = snk_ref.data()

    fg1, snk1 = graph()
    handle = Runtime(chunk_size=4096).start(fg1)
    # let a few steps land, then checkpoint mid-flight and stop
    deadline = threading.Event()
    deadline.wait(0.15)
    path = handle.snapshot(ckpt)
    handle.stop()
    handle.wait(timeout=30)
    part1 = snk1.data()

    fg2, snk2 = graph()
    Runtime(chunk_size=4096).run(fg2, restore=path)
    out = snk2.data()
    assert len(part1) <= len(out) == len(ref) == n
    np.testing.assert_array_equal(out, ref)


def test_filesink_resume_fresh_process(tmp_path):
    """FileSink resume must preserve the already-written output: a fresh
    graph (new FileSink object, as after a process restart) continues the
    file instead of truncating it."""
    from futuresdr_tpu.blocks import FileSink

    x = _iq(6 * 4096, seed=9)
    out = tmp_path / "out.bin"
    ckpt = tmp_path / "fs.ckpt"

    def graph():
        fg = Flowgraph()
        connect(fg, VectorSource(x), Fir(_taps()), FileSink(out, np.complex64))
        return fg

    # uninterrupted reference
    ref_out = tmp_path / "ref.bin"
    fg_ref = Flowgraph()
    connect(fg_ref, VectorSource(x), Fir(_taps()), FileSink(ref_out, np.complex64))
    Runtime(chunk_size=4096).run(fg_ref)
    ref = np.fromfile(ref_out, np.complex64)

    ex1 = Executor(graph(), chunk_size=4096, max_steps=2)
    ex1.running = True
    ex1.run_loop()
    ex1.snapshot(ckpt)
    n_part = np.fromfile(out, np.complex64).shape[0]
    assert 0 < n_part < len(ref)

    # fresh process equivalent: brand-new FileSink on the same path
    Runtime(chunk_size=4096).run(graph(), restore=str(ckpt))
    got = np.fromfile(out, np.complex64)
    np.testing.assert_array_equal(got, ref)


def test_filesink_resume_rejects_missing_output(tmp_path):
    from futuresdr_tpu.blocks import FileSink

    snk = FileSink(tmp_path / "gone.bin", np.float32)
    with pytest.raises(ValueError, match="cannot resume FileSink"):
        snk.set_host_state({"n_written": 100})


def test_iq_file_source_resume(tmp_path):
    """IQFileSource (reader thread + native ring) resumes at the exact
    delivered position."""
    from futuresdr_tpu.blocks import IQFileSource

    x = _iq(5 * 4096, seed=3)
    cap = tmp_path / "cap.cf32"
    x.view(np.float32).tofile(cap)
    ckpt = tmp_path / "iq.ckpt"

    def graph():
        fg = Flowgraph()
        snk = VectorSink(np.complex64)
        connect(fg, IQFileSource(cap, fmt="cf32"), Fir(_taps()), snk)
        return fg, snk

    fg_ref, snk_ref = graph()
    Runtime(chunk_size=4096).run(fg_ref)
    ref = snk_ref.data()

    fg1, snk1 = graph()
    ex1 = Executor(fg1, chunk_size=4096, max_steps=2)
    ex1.running = True
    ex1.run_loop()
    ex1.snapshot(ckpt)

    fg2, snk2 = graph()
    Runtime(chunk_size=4096).run(fg2, restore=str(ckpt))
    np.testing.assert_array_equal(snk2.data(), ref)


def test_restore_rejects_different_graph(tmp_path):
    x = _iq(4 * 4096)
    fg1, _ = _graph(x)
    ex1 = Executor(fg1, chunk_size=4096, max_steps=2)
    ex1.running = True
    ex1.run_loop()
    ckpt = tmp_path / "a.ckpt"
    ex1.snapshot(ckpt)

    fg2 = Flowgraph()
    connect(
        fg2,
        VectorSource(x),
        Fir(_taps()),
        Fir(_taps(15)),  # extra block: different structure
        VectorSink(np.complex64),
    )
    with pytest.raises(Exception, match="structurally different"):
        Runtime(chunk_size=4096).run(fg2, restore=str(ckpt))


def test_resume_feedback_loop(tmp_path):
    """Checkpoint carries lax.scan feedback state (close_circuit loops):
    a leaky integrator resumed mid-stream equals the uninterrupted run."""
    from futuresdr_tpu.blocks import Apply, Combine

    rng = np.random.default_rng(4)
    x = rng.standard_normal(2048).astype(np.float32)
    a = 0.9

    def build():
        fg = Flowgraph()
        src = VectorSource(x)
        add = Combine(lambda u, v: u + v, np.float32, np.float32, np.float32)
        gain = Apply(lambda v: a * v, np.float32, np.float32)
        snk = VectorSink(np.float32)
        for b in (src, add, gain, snk):
            fg.add(b)
        fg.stream(src, add, dst_port=0)
        fg.stream(add, gain)
        fg.close_circuit(gain, add, dst_port=1, delay=1)
        fg.stream(add, snk)
        return fg, snk

    fg_ref, snk_ref = build()
    Runtime(chunk_size=256).run(fg_ref)
    ref = snk_ref.data()

    fg1, snk1 = build()
    ex1 = Executor(fg1, chunk_size=256, max_steps=3)
    ex1.running = True
    ex1.run_loop()
    ckpt = tmp_path / "loop.ckpt"
    ex1.snapshot(ckpt)

    fg2, snk2 = build()
    Runtime(chunk_size=256).run(fg2, restore=str(ckpt))
    np.testing.assert_array_equal(snk2.data(), ref)


def test_snapshot_before_run_raises():
    fg, _ = _graph(_iq(4096))
    ex = Executor(fg, chunk_size=4096)
    with pytest.raises(RuntimeError, match="has not run"):
        ex.snapshot("/tmp/never.ckpt")


def test_filesink_resume_before_first_write(tmp_path):
    """A snapshot taken before the (lazily-opened) FileSink wrote anything
    must restore cleanly: n_written == 0 with no file on disk resumes with
    a fresh lazy open instead of raising."""
    from futuresdr_tpu.blocks import FileSink

    out = tmp_path / "out.bin"
    snk = FileSink(out, dtype=np.float32)
    assert not out.exists()
    st = snk.host_state()
    assert st == {"n_written": 0}

    snk2 = FileSink(out, dtype=np.float32)
    snk2.set_host_state(st)  # raised ValueError before the fix
    snk2.host_consume(np.arange(8, dtype=np.float32), [])
    snk2.on_finish()
    assert np.array_equal(
        np.fromfile(out, np.float32), np.arange(8, dtype=np.float32)
    )


def test_multichannel_seify_resume_bit_exact(tmp_path):
    """The multi-channel dummy source's host state (per-channel NCO
    phases + rng streams) snapshots and resumes bit-exactly on both
    channels."""
    from futuresdr_tpu.blocks import Head
    from futuresdr_tpu.blocks.seify import Builder

    ckpt = tmp_path / "mc.ckpt"

    def graph():
        src = (
            Builder("driver=dummy")
            .sample_rate(1e6)
            .channels([0, 1])
            .build_source()
        )
        fg = Flowgraph()
        sinks = []
        for p in range(2):
            h = Head(8 * 4096, np.complex64)
            s = VectorSink(np.complex64)
            for b in (h, s):
                fg.add(b)
            fg.add(src)
            fg.stream(src, h, p, 0)
            fg.stream(h, s)
            sinks.append(s)
        return fg, sinks

    fg_ref, sinks_ref = graph()
    Runtime(chunk_size=4096).run(fg_ref)
    refs = [s.data() for s in sinks_ref]

    fg1, sinks1 = graph()
    ex1 = Executor(fg1, chunk_size=4096, max_steps=3)
    ex1.running = True
    ex1.run_loop()
    ex1.snapshot(ckpt)
    parts = [s.data() for s in sinks1]
    assert all(0 < len(p) < len(r) for p, r in zip(parts, refs))

    fg2, sinks2 = graph()
    Runtime(chunk_size=4096).run(fg2, restore=str(ckpt))
    for s, ref in zip(sinks2, refs):
        np.testing.assert_array_equal(s.data(), ref)


def test_retuned_params_survive_checkpoint(tmp_path):
    """A live param retune (FreqShift NCO increment) is checkpoint
    state: restore into a graph built with the ORIGINAL frequency must
    resume at the RETUNED one (pre-fix, params silently reverted to the
    constructor values)."""
    from futuresdr_tpu.blocks import FreqShift
    from futuresdr_tpu.ops.rotator import freq_to_fxp

    x = _iq(8 * 4096)
    ckpt = tmp_path / "params.ckpt"

    def graph(freq):
        fg = Flowgraph()
        fs = FreqShift(freq, 1e6)
        snk = VectorSink(np.complex64)
        connect(fg, VectorSource(x.copy()), fs, snk)
        return fg, fs, snk

    # uninterrupted reference: 5 kHz for 2 chunks, then 9 kHz
    fg_r, fs_r, snk_r = graph(5e3)
    exr = Executor(fg_r, chunk_size=4096, max_steps=2)
    exr.running = True
    exr.run_loop()
    fs_r.set_param("dphi", freq_to_fxp(9e3 / 1e6))
    exr.snapshot(ckpt)

    fg2, fs2, snk2 = graph(5e3)  # original frequency
    Runtime(chunk_size=4096).run(fg2, restore=str(ckpt))
    assert int(fs2._params["dphi"]) == int(freq_to_fxp(9e3 / 1e6))
    # the resumed stream really runs at 9 kHz: check the mixed tone
    tail = np.asarray(snk2.data())[3 * 4096 : 5 * 4096]
    base = x[3 * 4096 : 5 * 4096]
    # y = x * e^{j2pi f t} -> y/x isolates the NCO
    rot = tail / base
    ph = np.unwrap(np.angle(rot))
    f_est = np.polyfit(np.arange(len(ph)), ph, 1)[0] * 1e6 / (2 * np.pi)
    assert abs(f_est - 9e3) < 50.0

    # params-structure mismatch (retunable flag changed) is rejected
    from futuresdr_tpu.runtime.checkpoint import load_checkpoint

    fg3, fs3, snk3 = graph(5e3)
    fs3._params.pop("dphi")
    with pytest.raises(ValueError):
        Runtime(chunk_size=4096).run(fg3, restore=str(ckpt))


def test_params_flag_mismatch_caught_both_directions(tmp_path):
    """A retunable-flag change between save and restore is rejected in
    BOTH directions (empty-vs-nonempty param sets are structural)."""
    from futuresdr_tpu.blocks import Fir
    from futuresdr_tpu.dsp import firdes, windows

    x = _iq(4 * 4096)
    taps = firdes.lowpass(0.2, windows.hamming(21))
    ckpt = tmp_path / "flag.ckpt"

    def graph(retunable):
        fg = Flowgraph()
        snk = VectorSink(np.complex64)
        connect(
            fg,
            VectorSource(x.copy()),
            Fir(taps, retunable=retunable),
            snk,
        )
        return fg

    fg1 = graph(False)  # saved WITHOUT params
    ex = Executor(fg1, chunk_size=4096, max_steps=2)
    ex.running = True
    ex.run_loop()
    ex.snapshot(ckpt)

    fg2 = graph(True)  # restored WITH params: must be rejected
    with pytest.raises(ValueError, match="checkpoint params"):
        Runtime(chunk_size=4096).run(fg2, restore=str(ckpt))


@pytest.mark.parametrize("seed", range(6))
def test_random_chain_snapshot_resume_fuzz(seed, tmp_path):
    """Property: for random stateful chains (FIR histories, NCO accums,
    delays, moving averages) snapshot-at-a-random-step + resume equals
    the uninterrupted run bit-for-bit — including a random param retune
    applied just before the snapshot (params ride the checkpoint)."""
    from futuresdr_tpu.blocks import Delay, Fir, FreqShift, MovingAvg

    rng = np.random.default_rng(400 + seed)
    x = _iq(8 * 4096, seed=500 + seed)
    ckpt = tmp_path / f"fuzz{seed}.ckpt"

    def build():
        fg = Flowgraph()
        up = VectorSource(x.copy())
        fg.add(up)
        shifts = []
        for _ in range(int(rng.integers(2, 5))):
            kind = rng.integers(0, 4)
            if kind == 0:
                t = rng.standard_normal(int(rng.integers(5, 33))).astype(
                    np.float32
                )
                b = Fir(t)
            elif kind == 1:
                b = FreqShift(float(rng.uniform(-2e5, 2e5)), 1e6)
                shifts.append(b)
            elif kind == 2:
                b = Delay(int(rng.integers(1, 300)))
            else:
                d = MovingAvg(int(rng.integers(2, 9)), dtype=np.complex64)
                b = d
            fg.stream(up, b)
            up = b
        snk = VectorSink(np.complex64)
        fg.stream(up, snk)
        return fg, shifts, snk

    state = rng.bit_generator.state
    fg_ref, _, snk_ref = build()
    rng.bit_generator.state = state
    fg1, shifts1, snk1 = build()
    rng.bit_generator.state = state
    fg2, shifts2, snk2 = build()

    cut = int(rng.integers(1, 6))

    # uninterrupted reference: one clean run
    Runtime(chunk_size=4096).run(fg_ref)
    ref = snk_ref.data()

    ex1 = Executor(fg1, chunk_size=4096, max_steps=cut)
    ex1.running = True
    ex1.run_loop()
    ex1.snapshot(ckpt)

    Runtime(chunk_size=4096).run(fg2, restore=str(ckpt))
    out = snk2.data()
    assert out.shape == ref.shape
    np.testing.assert_array_equal(out, ref)
    # params rode the checkpoint (same constructor values here; the
    # retune-survival case has its own dedicated test above)
    for a, b in zip(shifts1, shifts2):
        assert int(a._params["dphi"]) == int(b._params["dphi"])
