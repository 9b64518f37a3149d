"""Functional blocks: user-closure maps over streams.

Parity: ``src/blocks/apply.rs:39-133`` (Apply — the canonical 1:1 map with
tag propagation), ``combine.rs``, ``split.rs``, ``filter.rs``, ``source.rs``,
``sink.rs``, ``finite_source.rs``. The user closure here is a **traceable
jnp function over whole chunks** (CArray for complex ports) instead of a
per-item scalar closure — the vectorized form XLA fuses into the step.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Optional

import numpy as np

from futuresdr_tpu.runtime.block import Block, PortSpec


class Apply(Block):
    """1:1 chunk map ``y = fn(x)`` (parity: apply.rs:39-133).

    ``fn`` receives the whole input chunk (CArray if the input dtype is
    complex) and must return an equally-long chunk.
    """

    def __init__(
        self,
        fn: Callable[[Any], Any],
        in_dtype=np.complex64,
        out_dtype=None,
        name: Optional[str] = None,
    ):
        super().__init__(name)
        self.fn = fn
        self.stream_inputs = [PortSpec("in", in_dtype)]
        self.stream_outputs = [PortSpec("out", out_dtype or in_dtype)]
        self.rate_in = (1,)
        self.rate_out = (1,)

    def apply(self, state, inputs, params):
        return state, [self.fn(inputs[0])], {}


class Combine(Block):
    """2→1 chunk zip ``y = fn(a, b)`` (parity: combine.rs)."""

    def __init__(
        self,
        fn: Callable[[Any, Any], Any],
        a_dtype=np.complex64,
        b_dtype=None,
        out_dtype=None,
        name: Optional[str] = None,
    ):
        super().__init__(name)
        self.fn = fn
        self.stream_inputs = [
            PortSpec("in0", a_dtype),
            PortSpec("in1", b_dtype or a_dtype),
        ]
        self.stream_outputs = [PortSpec("out", out_dtype or a_dtype)]
        self.rate_in = (1, 1)
        self.rate_out = (1,)

    def apply(self, state, inputs, params):
        return state, [self.fn(inputs[0], inputs[1])], {}


class Split(Block):
    """1→2 chunk map ``(a, b) = fn(x)`` (parity: split.rs)."""

    def __init__(
        self,
        fn: Callable[[Any], Any],
        in_dtype=np.complex64,
        out_dtypes=None,
        name: Optional[str] = None,
    ):
        super().__init__(name)
        self.fn = fn
        out_dtypes = out_dtypes or (in_dtype, in_dtype)
        self.stream_inputs = [PortSpec("in", in_dtype)]
        self.stream_outputs = [
            PortSpec("out0", out_dtypes[0]),
            PortSpec("out1", out_dtypes[1]),
        ]
        self.rate_in = (1,)
        self.rate_out = (1, 1)

    def apply(self, state, inputs, params):
        a, b = self.fn(inputs[0])
        return state, [a, b], {}


class Filter(Block):
    """Predicate-keep block (parity: filter.rs).

    Data-dependent output length is the core impedance mismatch with XLA
    static shapes (SURVEY.md §7 hard part #1). TPU-native form: the chunk
    stays full-length on device; items failing ``pred`` are zeroed and a
    per-chunk ``count`` aux reports how many passed. A host sink that needs
    compaction uses :meth:`host_compact` (mask surfaces via aux).
    """

    def __init__(
        self,
        pred: Callable[[Any], Any],
        in_dtype=np.complex64,
        name: Optional[str] = None,
    ):
        super().__init__(name)
        self.pred = pred
        self.stream_inputs = [PortSpec("in", in_dtype)]
        self.stream_outputs = [PortSpec("out", in_dtype)]
        self.rate_in = (1,)
        self.rate_out = (1,)

    def apply(self, state, inputs, params):
        import jax.numpy as jnp

        from futuresdr_tpu.ops import cplx

        x = inputs[0]
        mask = self.pred(x)
        y = cplx.apply1(lambda t: jnp.where(mask, t, jnp.zeros_like(t)), x)
        return state, [y], {"mask": mask}

    @staticmethod
    def host_compact(chunk: np.ndarray, mask: np.ndarray) -> np.ndarray:
        """Drop the zeroed slots on host: the chunk + its aux ``mask``
        → only the items that passed ``pred``, in stream order."""
        return np.asarray(chunk)[..., np.asarray(mask, bool)]


class ApplyNM(Block):
    """N:M windowed map (parity: applynm.rs — ``&[A; N] → &[B; M]``).

    ``fn`` receives the chunk reshaped to ``[k, N]`` windows and must
    return ``[k, M]`` (vectorized over windows, the XLA-friendly form of
    the reference's per-window closure)."""

    def __init__(
        self,
        fn: Callable[[Any], Any],
        n: int,
        m: int,
        in_dtype=np.complex64,
        out_dtype=None,
        name: Optional[str] = None,
    ):
        super().__init__(name)
        self.fn = fn
        self.n, self.m = int(n), int(m)
        self.stream_inputs = [PortSpec("in", in_dtype)]
        self.stream_outputs = [PortSpec("out", out_dtype or in_dtype)]
        self.rate_in = (self.n,)
        self.rate_out = (self.m,)

    def apply(self, state, inputs, params):
        from futuresdr_tpu.ops import cplx

        x = inputs[0]
        k = x.shape[-1] // self.n
        win = x.reshape(k, self.n)
        y = self.fn(win)
        return state, [y.reshape(k * self.m)], {}


class ApplyIntoIter(Block):
    """1:N expansion (parity: applyintoiter.rs — per-item iterator).

    XLA needs static rates, so the per-item expansion CAPACITY ``n`` is
    declared up front (covers the reference's dominant use: fixed
    repetition/symbol-to-chips expansion). ``fn`` maps the chunk ``[k]``
    → ``[k, n]`` vectorized.

    Variable expansion (``variable=True``): ``fn`` returns ``([k, n],
    counts[k])`` where ``counts[i] ≤ n`` is item ``i``'s true output
    length. Slots past each count are zeroed on device and the counts
    surface as the ``"counts"`` aux (the same valid-count pattern as
    :class:`Filter`); a host consumer recovers the exact reference
    stream with :meth:`host_compact` instead of eating worst-case
    padding."""

    def __init__(
        self,
        fn: Callable[[Any], Any],
        n: int,
        in_dtype=np.float32,
        out_dtype=None,
        variable: bool = False,
        name: Optional[str] = None,
    ):
        super().__init__(name)
        self.fn = fn
        self.n = int(n)
        self.variable = bool(variable)
        self.stream_inputs = [PortSpec("in", in_dtype)]
        self.stream_outputs = [PortSpec("out", out_dtype or in_dtype)]
        self.rate_in = (1,)
        self.rate_out = (self.n,)

    def apply(self, state, inputs, params):
        x = inputs[0]
        k = x.shape[-1]
        if not self.variable:
            y = self.fn(x)  # [k, n]
            return state, [y.reshape(k * self.n)], {}
        import jax.numpy as jnp

        from futuresdr_tpu.ops import cplx

        y, counts = self.fn(x)  # [k, n], [k]
        mask = jnp.arange(self.n)[None, :] < counts[:, None]
        y = cplx.apply1(lambda t: jnp.where(mask, t, jnp.zeros_like(t)), y)
        flat = cplx.apply1(lambda t: t.reshape(k * self.n), y)
        return state, [flat], {"counts": counts}

    @staticmethod
    def host_compact(chunk: np.ndarray, counts: np.ndarray) -> np.ndarray:
        """Drop the per-item padding on host: the flattened ``[k·n]``
        chunk + its ``counts`` aux → the concatenation of each item's
        true outputs (exact applyintoiter.rs stream semantics)."""
        counts = np.asarray(counts)
        k = len(counts)
        a = np.asarray(chunk).reshape(k, -1) if k else np.asarray(chunk)
        n = a.shape[-1] if k else 0
        mask = np.arange(n)[None, :] < counts[:, None]
        return a[mask]


class Source(Block):
    """Host source from a python callable producing one item per call
    (parity: source.rs — ``Source::new(|| item)``). For bulk/vectorized
    generation prefer :class:`~futuresdr_tpu.blocks.io.VectorSource` or a
    device source."""

    def __init__(self, fn: Callable[[], Any], dtype=np.float32, name=None):
        super().__init__(name)
        self.fn = fn
        self.stream_outputs = [PortSpec("out", dtype)]
        self.rate_out = (1,)
        self._dtype = np.dtype(dtype)

    def host_produce(self, n: int, port: int = 0):
        return np.array([self.fn() for _ in range(n)], dtype=self._dtype)


class FiniteSource(Block):
    """Host source draining a python iterable; EOS when exhausted
    (parity: finite_source.rs)."""

    def __init__(self, it: Iterable, dtype=np.float32, name=None):
        super().__init__(name)
        self._it = iter(it)
        self.stream_outputs = [PortSpec("out", dtype)]
        self.rate_out = (1,)
        self._dtype = np.dtype(dtype)
        self._eos = False

    def host_produce(self, n: int, port: int = 0):
        if self._eos:
            return None
        out = []
        for _ in range(n):
            try:
                out.append(next(self._it))
            except StopIteration:
                self._eos = True
                break
        if not out and self._eos:
            return None
        return np.array(out, dtype=self._dtype)


class Sink(Block):
    """Host sink calling a python function per item chunk
    (parity: sink.rs — vectorized: ``fn`` gets the whole valid chunk)."""

    def __init__(self, fn: Callable[[np.ndarray], None], dtype=np.float32, name=None):
        super().__init__(name)
        self.fn = fn
        self.stream_inputs = [PortSpec("in", dtype)]
        self.rate_in = (1,)

    def host_consume(self, arr: np.ndarray, tags, port: int = 0) -> None:
        self.fn(arr)
