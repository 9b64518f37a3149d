"""futuresdr_tpu — a TPU-native SDR flowgraph framework.

A from-scratch re-design of the capabilities of FutureSDR (an async SDR
runtime for heterogeneous architectures) for TPU hardware:

* Blocks are pure functions ``(state, inputs, params) -> (state, outputs)``
  with a declared rational *rate signature* (GNU-Radio style) instead of
  imperative ``work()`` calls (reference: ``src/runtime/kernel.rs:54-90``).
* A flowgraph compiles to **one fused XLA program** per time chunk, executed
  by a thin host loop — replacing the reference's async actor scheduler and
  double-mapped ring buffers (``src/runtime/scheduler/smol.rs``,
  ``src/runtime/buffer/circular.rs``).
* Hot DSP kernels (FIR, polyphase filter banks, FFT) run on the MXU via
  XLA convs / Pallas kernels, replacing futuredsp's scalar tap loops
  (``crates/futuredsp/src/fir.rs:31-96``).
* Multi-chip scaling shards channels and time blocks over a
  ``jax.sharding.Mesh``; overlap-save filter halos travel via ``ppermute``
  (see :mod:`futuresdr_tpu.parallel`).
"""

__version__ = "0.1.0"

from futuresdr_tpu.types.pmt import Pmt
from futuresdr_tpu.types.ids import BlockId, PortId, FlowgraphId
from futuresdr_tpu.runtime.block import Block, BlockSpec, PortSpec
from futuresdr_tpu.runtime.flowgraph import Flowgraph, connect, to_dot
from futuresdr_tpu.runtime.executor import Runtime, FlowgraphHandle
from futuresdr_tpu.runtime.mocker import Mocker
from futuresdr_tpu import config

__all__ = [
    "Pmt",
    "BlockId",
    "PortId",
    "FlowgraphId",
    "Block",
    "BlockSpec",
    "PortSpec",
    "Flowgraph",
    "connect",
    "to_dot",
    "Runtime",
    "FlowgraphHandle",
    "Mocker",
    "config",
]
