"""Compiler fusion pass: PfbChannelizer → M×QuadratureDemod → M×Fir
canonicalizes onto the fused Pallas bank kernel (runtime/fusion.py).

The reference gives composed blocks the runtime's full speed by
construction (examples/fm-receiver/src/main.rs:84-130); here the fusion
pass is what guarantees the block/flowgraph product surface runs the
bench-headline kernel. These tests pin the rewrite mechanics and the
numeric equivalence vs the unfused block path on the CPU mesh.
"""

import numpy as np
import pytest

from futuresdr_tpu import config
from futuresdr_tpu.blocks import (
    Fir,
    NullSink,
    NullSource,
    PfbChannelizer,
    PfbFmBank,
    QuadratureDemod,
    VectorSink,
    VectorSource,
)
from futuresdr_tpu.dsp import firdes, windows
from futuresdr_tpu.runtime.executor import Executor, Runtime
from futuresdr_tpu.runtime.flowgraph import Flowgraph

M = 8
D = 4
GAIN = 0.7
ATAPS = firdes.lowpass(0.4 / D, windows.hamming(16)).astype(np.float64)


def _iq(n_items, seed):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(n_items) + 1j * rng.standard_normal(n_items)
    return (x * 0.5).astype(np.complex64)


def _bank_graph(sink_cls, n_items=4096, seed=0):
    """VectorSource → PfbChannelizer(M) → M×(QuadratureDemod→Fir) →
    M×sink — the composed form of the flagship bank."""
    x = _iq(n_items, seed)
    fg = Flowgraph()
    src = VectorSource(x)
    chan = PfbChannelizer(M)
    fg.stream(src, chan)
    sinks = []
    for k in range(M):
        d = QuadratureDemod(GAIN, name=f"qd{k}")
        f = Fir.decimating(ATAPS, D, dtype=np.float32, name=f"fir{k}")
        snk = sink_cls(np.float32, name=f"snk{k}")
        fg.stream(chan, d, src_port=k)
        fg.stream(d, f)
        fg.stream(f, snk)
        sinks.append(snk)
    return fg, sinks


@pytest.fixture(autouse=True)
def _bf16_chain():
    """Match the unfused path's channelizer math to the fused kernel's
    (f32 branch FIR + bf16 DFT) so equivalence is tight, not SNR-ish."""
    config.set("channelizer_fft", "dft_bf16")
    config.set("fir_dtype", "float32")
    yield
    config.set("channelizer_fft", "mixed_radix")


def test_fusion_rewrites_graph_and_matches_unfused():
    fg_f, sinks_f = _bank_graph(VectorSink)
    fg_u, sinks_u = _bank_graph(VectorSink)

    ex = Executor(fg_f, chunk_size=1024)
    assert ex.cfg.fusion_log, "fusion pass did not fire"
    names = [type(b).__name__ for b in fg_f.blocks]
    assert "PfbFmBank" in names
    assert "QuadratureDemod" not in names and "Fir" not in names
    # split variant: per-channel sinks survive
    assert sum(n == "VectorSink" for n in names) == M
    ex.running = True
    ex.run_loop()
    ex.running = False
    if ex.error:
        raise ex.error

    config.set("fusion", False)
    try:
        ex_u = Executor(fg_u, chunk_size=1024)
        assert not ex_u.cfg.fusion_log
        assert any(type(b).__name__ == "Fir" for b in fg_u.blocks)
        ex_u.running = True
        ex_u.run_loop()
        ex_u.running = False
        if ex_u.error:
            raise ex_u.error
    finally:
        config.set("fusion", True)

    for k in range(M):
        a, b = sinks_f[k].data(), sinks_u[k].data()
        assert a.shape == b.shape, f"ch{k}: {a.shape} vs {b.shape}"
        assert a.shape[-1] > 0
        np.testing.assert_allclose(
            a, b, atol=1e-4, err_msg=f"channel {k} diverges"
        )


def test_fusion_matches_across_chunk_sizes():
    """Chunked state carry through the fused block == one big chunk."""
    out = {}
    for cs in (512, 2048):
        fg, sinks = _bank_graph(VectorSink, n_items=2048, seed=3)
        Runtime(chunk_size=cs).run(fg)
        out[cs] = np.stack([s.data() for s in sinks])
    np.testing.assert_allclose(out[512], out[2048], atol=1e-5)


def test_fusion_sink_coalesce_nullsinks():
    fg = Flowgraph()
    src = NullSource(np.complex64)
    chan = PfbChannelizer(M)
    fg.stream(src, chan)
    for k in range(M):
        d = QuadratureDemod(GAIN, name=f"qd{k}")
        f = Fir.decimating(ATAPS, D, dtype=np.float32, name=f"fir{k}")
        fg.stream(chan, d, src_port=k)
        fg.stream(d, f)
        fg.stream(f, NullSink(np.float32, name=f"ns{k}"))
    ex = Executor(fg, chunk_size=1024, max_steps=3)
    assert any("bank+sinks" in line for line in ex.cfg.fusion_log)
    assert len(fg.blocks) == 3  # source, fused bank, one coalesced sink
    ex.running = True
    ex.run_loop()
    ex.running = False
    if ex.error:
        raise ex.error
    snk = next(b for b in fg.blocks if type(b).__name__ == "NullSink")
    assert snk.n_received > 0  # columns of [M, n] audio counted


def test_fusion_vetoes_on_mismatched_params():
    fg = Flowgraph()
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(2048) * 0.5).astype(np.complex64)
    src = VectorSource(x)
    chan = PfbChannelizer(M)
    fg.stream(src, chan)
    for k in range(M):
        d = QuadratureDemod(GAIN if k else GAIN * 2, name=f"qd{k}")
        f = Fir.decimating(ATAPS, D, dtype=np.float32, name=f"fir{k}")
        fg.stream(chan, d, src_port=k)
        fg.stream(d, f)
        fg.stream(f, VectorSink(np.float32, name=f"snk{k}"))
    ex = Executor(fg, chunk_size=1024)
    assert not ex.cfg.fusion_log  # gain mismatch on ch0 vetoes the rewrite
    assert any(type(b).__name__ == "Fir" for b in fg.blocks)


def test_direct_pfb_fm_bank_block_matches_unfused():
    """PfbFmBank used directly (bank port) == the unfused chain."""
    fg = Flowgraph()
    src = VectorSource(_iq(4096, 0))  # same stream as _bank_graph(seed=0)
    bank = PfbFmBank(M, gain=GAIN, audio_taps=ATAPS, audio_decim=D)
    snk = VectorSink(np.float32)
    fg.stream(src, bank)
    fg.stream(bank, snk)
    Runtime(chunk_size=1024).run(fg)
    rows = snk.data()  # [M, n]
    assert rows.shape[0] == M

    fg_u, sinks_u = _bank_graph(VectorSink)
    config.set("fusion", False)
    try:
        Runtime(chunk_size=1024).run(fg_u)
    finally:
        config.set("fusion", True)
    for k in range(M):
        b = sinks_u[k].data()
        np.testing.assert_allclose(rows[k, : b.shape[-1]], b, atol=1e-4)


def test_audio_conv_branch_matches_dense():
    """PfbFmBank's two audio-FIR formulations (dense banded-W matmul
    below DENSE_AUDIO_W_MAX_BYTES, blocked-Toeplitz conv above — the
    dense form is O(R²/D) and unusable at bulk-decode chunks) must
    produce the same samples."""
    from futuresdr_tpu.blocks import pfb as pfb_mod

    def run_once():
        fg = Flowgraph()
        src = VectorSource(_iq(4096, 3))
        bank = PfbFmBank(M, gain=GAIN, audio_taps=ATAPS, audio_decim=D)
        snk = VectorSink(np.float32)
        fg.stream(src, bank)
        fg.stream(bank, snk)
        Runtime(chunk_size=1024).run(fg)
        return snk.data()

    dense = run_once()
    saved = pfb_mod.DENSE_AUDIO_W_MAX_BYTES
    pfb_mod.DENSE_AUDIO_W_MAX_BYTES = 0  # force the conv branch
    try:
        conv = run_once()
    finally:
        pfb_mod.DENSE_AUDIO_W_MAX_BYTES = saved
    np.testing.assert_allclose(conv, dense, atol=2e-6)


def test_fusion_scan_batching_matches_k1():
    """steps_per_call>1 (lax.scan over K chunks — the 2x dispatch
    amortization measured on chip at 4.2M-sample chunks) must be
    numerically identical to per-chunk dispatch through the fused graph."""
    out = {}
    for K in (1, 3):
        config.set("steps_per_call", K)
        config.set("scan_max_chunk", 1 << 24)
        try:
            fg, sinks = _bank_graph(VectorSink, n_items=6144, seed=5)
            Runtime(chunk_size=1024).run(fg)
            out[K] = np.stack([s.data() for s in sinks])
        finally:
            config.set("steps_per_call", "auto")
    assert out[1].shape == out[3].shape
    np.testing.assert_allclose(out[1], out[3], atol=1e-6)


def test_fusion_preserves_tag_rescaling():
    """Tags on the wideband stream must reach per-channel sinks at the
    same (rescaled) indices whether or not the chain was fused: the
    composed rescale is M·D→1 through PfbChannelizer→Fir, and PfbFmBank
    declares exactly that rate signature."""
    from futuresdr_tpu.runtime.tags import ItemTag
    from futuresdr_tpu.types.pmt import Pmt

    tags = [
        ItemTag(0, Pmt.from_py("start")),
        ItemTag(M * D * 17, Pmt.from_py("mid")),
        ItemTag(M * D * 61 + 5, Pmt.from_py("odd")),
    ]

    def run(fusion_on):
        x = _iq(4096, 2)
        fg = Flowgraph()
        src = VectorSource(x, tags=list(tags))
        chan = PfbChannelizer(M)
        fg.stream(src, chan)
        sinks = []
        for k in range(M):
            d = QuadratureDemod(GAIN, name=f"qd{k}")
            f = Fir.decimating(ATAPS, D, dtype=np.float32, name=f"fir{k}")
            snk = VectorSink(np.float32, name=f"snk{k}")
            fg.stream(chan, d, src_port=k)
            fg.stream(d, f)
            fg.stream(f, snk)
            sinks.append(snk)
        config.set("fusion", fusion_on)
        try:
            Runtime(chunk_size=1024).run(fg)
        finally:
            config.set("fusion", True)
        return [
            [(t.index, t.tag.to_py()) for t in s.tags()] for s in sinks
        ]

    fused, unfused = run(True), run(False)
    assert fused == unfused
    assert any(fused[k] for k in range(M))  # tags actually arrived
