"""Mocker: run one block without a runtime (parity: src/runtime/mocker.rs:30-119).

Feed input vectors, call the block's chunk transform directly, inspect
outputs and posted messages — the unit-test harness every block test uses
(``tests/mocker.rs:11-60`` pattern). Because blocks are pure functions here,
this is just: build chunks, call ``apply``, carry state across ``run()``
calls (split-call continuity is the reference's headline Mocker test).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from futuresdr_tpu.ops import cplx
from futuresdr_tpu.runtime.block import Block
from futuresdr_tpu.runtime.tags import ItemTag
from futuresdr_tpu.types.pmt import Pmt


class Mocker:
    def __init__(self, block: Block):
        self.block = block
        self._inputs: Dict[int, np.ndarray] = {}
        self._in_tags: Dict[int, List[ItemTag]] = {}
        self._outputs: Dict[int, List[np.ndarray]] = {
            p: [] for p in range(len(block.stream_outputs))
        }
        self._out_tags: Dict[int, List[ItemTag]] = {
            p: [] for p in range(len(block.stream_outputs))
        }
        self._messages: List[Tuple[str, Pmt]] = []
        self._state: Any = None
        self._state_ready = False
        self._out_offsets: Dict[int, int] = {
            p: 0 for p in range(len(block.stream_outputs))
        }
        block._post_fn = lambda port, pmt: self._messages.append((port, pmt))

    # ---- input staging ---------------------------------------------------
    def input(self, port: int, data, tags: Optional[List[ItemTag]] = None):
        self._inputs[port] = np.asarray(data)
        self._in_tags[port] = list(tags or [])
        return self

    init_input = input  # reference naming alias (mocker.rs init())

    # ---- run -------------------------------------------------------------
    def run(self):
        b = self.block
        n_in = len(b.stream_inputs)
        if set(self._inputs.keys()) != set(range(n_in)):
            raise ValueError(f"need inputs for all {n_in} ports")
        # work units implied by the staged input lengths
        if n_in:
            units = min(
                self._inputs[p].shape[-1] // b.rate_in[p] for p in range(n_in)
            )
        else:
            units = 1
        in_sizes = [units * r for r in b.rate_in]
        out_sizes = [units * r for r in b.rate_out]
        if not self._state_ready:
            self._state = b.make_state(in_sizes, out_sizes)
            self._state_ready = True
        inputs = [
            cplx.from_numpy(self._inputs[p][..., : in_sizes[p]])
            for p in range(n_in)
        ]
        state, outs, aux = b.apply(self._state, inputs, b.params())
        self._state = state
        if aux:
            b.on_aux({k: np.asarray(v) for k, v in aux.items()})
        for p, o in enumerate(outs):
            arr = cplx.to_numpy(o)
            self._outputs[p].append(arr)
        # tag propagation (same policy the executor applies)
        from futuresdr_tpu.runtime.tags import TagPropagation, rescale_tags

        in_tags = [self._in_tags.get(p, []) for p in range(n_in)]
        if b.tag_propagation == TagPropagation.PROPAGATE and n_in:
            for p in range(len(outs)):
                ts: List[ItemTag] = []
                for q in range(n_in):
                    ts.extend(
                        rescale_tags(in_tags[q], in_sizes[q], out_sizes[p])
                    )
                ts.sort(key=lambda t: t.index)
                self._out_tags[p].extend(
                    t.shifted(self._out_offsets[p]) for t in ts
                )
        elif b.tag_propagation == TagPropagation.CUSTOM:
            out_t = b.propagate_tags(in_tags, in_sizes, out_sizes)
            for p in range(len(outs)):
                self._out_tags[p].extend(
                    t.shifted(self._out_offsets[p]) for t in out_t[p]
                )
        for p in range(len(outs)):
            self._out_offsets[p] += out_sizes[p]
        self._inputs.clear()
        self._in_tags.clear()
        return self

    # ---- message injection ----------------------------------------------
    def post(self, handler: str, pmt) -> Pmt:
        pmt = pmt if isinstance(pmt, Pmt) else Pmt.from_py(pmt)
        return self.block.call_handler(handler, pmt)

    # ---- inspection ------------------------------------------------------
    def output(self, port: int = 0) -> np.ndarray:
        chunks = self._outputs.get(port, [])
        if not chunks:
            return np.zeros((0,))
        return np.concatenate(chunks, axis=-1)

    def output_tags(self, port: int = 0) -> List[ItemTag]:
        return list(self._out_tags.get(port, []))

    @property
    def messages(self) -> List[Tuple[str, Pmt]]:
        return list(self._messages)
