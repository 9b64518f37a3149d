"""Per-block device-cost attribution (VERDICT r2 item 6).

The live capture needs a real TPU (CPU backends emit no per-op plane), so
these tests split the pipeline: (a) the graph compiler must stamp every
block's ``jax.named_scope`` into the lowered program (checked on CPU),
and (b) the xplane reader must attribute a REAL chip-captured trace
(``tests/data/min_graph.xplane.pb``, recorded from a
VectorSource→scale_a→fir_a→NullSink flowgraph on v5e) back to its blocks.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from futuresdr_tpu import Flowgraph
from futuresdr_tpu.blocks import Apply, Fir, VectorSink, VectorSource
from futuresdr_tpu.runtime.compiler import compile_flowgraph
from futuresdr_tpu.utils.xplane import (
    block_time_ps,
    latest_xplane,
    read_op_events,
)

from pathlib import Path

FIXTURE_DIR = str(Path(__file__).resolve().parent / "data")


def _min_graph():
    fg = Flowgraph()
    src = VectorSource(np.arange(1024, dtype=np.float32))
    a1 = Apply(
        lambda x: jnp.tanh(x) * 2.0, in_dtype=np.float32, name="scale_a"
    )
    f1 = Fir(
        np.hanning(16).astype(np.float32), dtype=np.float32, name="fir_a"
    )
    snk = VectorSink()
    fg.stream(src, a1)
    fg.stream(a1, f1)
    fg.stream(f1, snk)
    return fg


def test_named_scopes_reach_lowered_program():
    """Every block's instance name must appear as a scope path component
    in the step's lowering (this is what the chip profiler's tf_op stat
    is built from)."""
    fg = _min_graph()
    cfg = compile_flowgraph(fg, chunk_size=256, jit=False)
    states = cfg.init_states()
    params = cfg.gather_params()
    srcs = {
        cfg.pkey(bid, 0): jnp.zeros(256, jnp.float32)
        for bid in cfg.host_source_ids
    }
    txt = jax.jit(cfg._eval).lower(states, params, srcs).as_text(
        debug_info=True
    )
    assert "jit(_eval)/scale_a/tanh" in txt
    assert "/fir_a/" in txt


def test_xplane_reader_parses_chip_fixture():
    evs = read_op_events(latest_xplane(FIXTURE_DIR))
    assert any(e.line == "XLA Ops" for e in evs)
    tf_ops = {e.tf_op for e in evs if e.tf_op}
    assert any("/fir_a/" in t for t in tf_ops), sorted(tf_ops)[:5]
    assert any("/scale_a/" in t for t in tf_ops)
    # durations are picoseconds; the fir matmul dominates
    total = sum(e.duration_ps for e in evs if e.line == "XLA Ops")
    assert total > 1e6  # > 1 µs of device time captured


def test_block_time_grouping_matches_fixture():
    acc = block_time_ps(FIXTURE_DIR, ["scale_a", "fir_a", "absent"])
    assert set(acc) == {"scale_a", "fir_a", "(unattributed)"}
    # the 64-tap FIR Toeplitz matmul costs more than the tanh map
    assert acc["fir_a"] > acc["scale_a"] > 0
    assert acc.get("absent") is None
    # unattributed (copies, infeed) stays a small minority of the step
    assert acc["(unattributed)"] < 0.2 * sum(acc.values())


def test_profile_blocks_raises_without_device_ops(tmp_path):
    """CPU traces carry no per-op plane: profile_blocks must fail loudly,
    not return an empty/garbage attribution."""
    from futuresdr_tpu.runtime.executor import Executor

    ex = Executor(_min_graph(), chunk_size=256)
    with pytest.raises((RuntimeError, FileNotFoundError)):
        ex.profile_blocks(duration_s=0.05, trace_dir=str(tmp_path))
