"""Mesh execution for composed flowgraphs — time-sharding as a compiler
tier, not a per-model hand construction.

This gives every composed graph the runtime's full multi-device machinery
automatically, the way the reference hands every block its scheduler/buffer
machinery (``src/runtime/scheduler/smol.rs:108-137``): the user adds
``mesh=`` to the Runtime/Executor and the compiled step runs under
``jax.shard_map``, each shard processing a contiguous time slice of every
stream edge (SURVEY.md §2.5 names shard_map + ppermute as this framework's
collective tier).

Design — generalized packed-halo overlap-save (the r3 bank redesign,
``parallel/halo.py::packed_stream_halo``, promoted from per-model hand
math to a graph transform):

* A block's device state after a chunk is, for the supported class, a
  function of the last few input items (FIR history, demod continuity,
  PFB window rows). Each block declares ``state_suffix_in`` — the number
  of trailing input items per port that reproduce its state exactly by
  running ``apply`` from the initial state.
* Each shard therefore RECOMPUTES the state package its right neighbor
  needs from its **own** data: it re-runs the graph body on a short
  suffix of its raw source slice (length solved from the compiler's
  per-edge latency calculus — the zero-state transient — plus the
  declared suffixes) and keeps the resulting states.
* ONE ring ``ppermute`` per dtype group ships every block's package to
  the right neighbor. The wrap edge ``S-1 → 0`` doubles as the
  cross-chunk carry: shard 0 stores this step's wrap receive and
  consumes it NEXT step (stream continuity across chunks), so there are
  no extra carry collectives.
* The executor's carried "states" become exactly that carry package —
  the run loop, scan/unrolled batching, snapshot/resume and the params
  cache all work unchanged.

What is NOT supported under a mesh (clear errors, not wrong numbers):
feedback regions (sequential by construction), blocks whose state is not
suffix-reconstructable (IIR's infinite history, NCO phase accumulators —
their state depends on absolute stream position), and host-boundary
blocks keep working as before (chunks are split/joined on the last axis
at the shard_map boundary).
"""

from __future__ import annotations

import math
from dataclasses import fields
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import tree_util as jtu

from futuresdr_tpu.ops import cplx
from futuresdr_tpu.runtime.compiler import CompiledFlowgraph, RateError


def _pspec(*axes):
    from jax.sharding import PartitionSpec as P

    return P(*axes)


def _last_axis_spec(ndim: int, axis: str):
    return _pspec(*((None,) * (ndim - 1) + (axis,)))


def _ppermute_pytree(pkg, axis_name: str):
    """Ring-shift (i → i+1, wrap) an arbitrary pytree with ONE collective
    per distinct leaf dtype: leaves are flattened, grouped by dtype and
    packed into one buffer each (the ``packed_stream_halo`` discipline —
    per-leaf ppermutes would cost one ICI message per state leaf)."""
    leaves, treedef = jtu.tree_flatten(pkg)
    n = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    by_dtype: Dict[Any, List[int]] = {}
    for i, leaf in enumerate(leaves):
        by_dtype.setdefault(jnp.asarray(leaf).dtype, []).append(i)
    out: List[Any] = [None] * len(leaves)
    for dt, idxs in by_dtype.items():
        buf = jnp.concatenate(
            [jnp.asarray(leaves[i]).reshape(-1) for i in idxs]
        )
        recv = jax.lax.ppermute(buf, axis_name, perm=perm)
        off = 0
        for i in idxs:
            a = jnp.asarray(leaves[i])
            sz = int(np.prod(a.shape)) if a.ndim else 1
            out[i] = recv[off : off + sz].reshape(a.shape)
            off += sz
    return jtu.tree_unflatten(treedef, out)


class MeshCompiledFlowgraph(CompiledFlowgraph):
    """A :class:`CompiledFlowgraph` whose step runs under ``shard_map``.

    Drop-in for the executor: ``step/scan_step/unrolled`` keep their
    signatures, ``init_states()`` returns the carry package (leading
    ``[n_shards, ...]`` axis on every leaf), ``put_params`` places params
    with explicit shardings (split for ``sharded_params``, replicated
    otherwise).
    """

    @classmethod
    def from_cfg(cls, cfg: CompiledFlowgraph, mesh, axis: str):
        kw = {f.name: getattr(cfg, f.name) for f in fields(CompiledFlowgraph)}
        kw["step"] = None
        kw["scan_step"] = None
        kw["unrolled_steps"] = {}
        self = cls(**kw)
        self._setup(mesh, axis)
        self.step = jax.jit(self._eval, donate_argnums=(0,))
        return self

    # ---- analysis --------------------------------------------------------
    def _setup(self, mesh, axis: str) -> None:
        fg = self.fg
        self.mesh = mesh
        self.axis = axis
        if axis not in mesh.shape:
            raise RateError(
                f"mesh has no axis {axis!r} (axes: {dict(mesh.shape)})"
            )
        S = self.n_shards = int(mesh.shape[axis])
        if self.regions:
            names = sorted(
                fg.blocks[b].instance_name
                for r in self.regions
                for b in r.members
            )
            raise RateError(
                "feedback regions cannot run time-sharded (the loop is "
                f"sequential across the chunk): {names}. Run this graph "
                "without mesh= or restructure the loop."
            )
        if self.multiplier % S:
            raise RateError(
                f"chunk multiplier {self.multiplier} not divisible by the "
                f"{S}-shard mesh axis — pick a chunk_size that solves to "
                "a multiple of the shard count"
            )

        # source ports (host + pure device sources) and their per-
        # multiplier-unit item counts
        self.source_pure_ids = [
            bid
            for bid in self.pure_ids
            if fg.blocks[bid].stream_outputs
            and not fg.blocks[bid].stream_inputs
        ]
        self._carried_ids = [
            bid for bid in self.pure_ids if bid not in self.source_pure_ids
        ]
        # position-affine blocks (advance_state hook): their
        # state's position-dependent part (NCO phase accumulators)
        # advances deterministically with the stream position, so the
        # mesh keeps a per-block BASE state advanced by chunk_items each
        # step (no collective) and positions every suffix-run/seed from
        # it. ipu = items per multiplier unit on the block's own clock
        # (input port 0, or output port 0 for sources).
        self._affine_ids = [
            bid
            for bid in self.pure_ids
            if callable(getattr(fg.blocks[bid], "advance_state", None))
        ]
        self._aff_ipu: Dict[int, int] = {}
        for bid in self._affine_ids:
            b = fg.blocks[bid]
            chunks = (
                self.in_chunks[bid] if b.stream_inputs else self.out_chunks[bid]
            )
            self._aff_ipu[bid] = chunks[0] // self.multiplier
        src_units: Dict[str, int] = {}
        for e in fg.stream_edges:
            if e.src in self.host_source_ids or e.src in self.source_pure_ids:
                src_units[self.pkey(e.src, e.src_port)] = (
                    self.edge_items[e] // self.multiplier
                )
        self.src_units = src_units

        # ---- per-block shardability + suffix solve -----------------------
        self._build_templates()
        templates = self._carry_template

        # suffix length in multiplier units: for every stateful block,
        # the suffix run must leave state_suffix_in REAL items at its
        # input edge past the zero-state transient the latency calculus
        # predicts (edge_latency = that transient, compiler docstring)
        m_sfx = 1
        for bid in self._carried_ids:
            b = fg.blocks[bid]
            if not jtu.tree_leaves(templates[self.bkey(bid)]):
                continue  # stateless: nothing to reconstruct
            ssi = getattr(b, "state_suffix_in", None)
            if ssi is None:
                if bid in self._affine_ids:
                    continue  # pure position-affine state (NCO phase)
                raise RateError(
                    f"{b.instance_name} carries device state but declares "
                    "no state_suffix_in — its state cannot be rebuilt at "
                    "shard boundaries. Supported: blocks whose state is a "
                    "function of recent input (FIR/PFB history, demod "
                    "continuity) and position-affine states with an "
                    "advance_state hook (NCO phases); unsupported: IIR."
                )
            ssi = tuple(int(x) for x in ssi)
            in_edges = [e for e in fg.in_edges(bid) if not e.feedback]
            if len(ssi) != len(in_edges):
                raise RateError(
                    f"{b.instance_name}: state_suffix_in has {len(ssi)} "
                    f"entries for {len(in_edges)} input edges"
                )
            for e, need in zip(in_edges, ssi):
                units = self.edge_items[e] // self.multiplier
                lat = self.edge_latency[e]
                m_sfx = max(m_sfx, -(-(need + lat) // units))
        m_seg = self.multiplier // S
        if m_sfx > m_seg:
            raise RateError(
                f"per-shard chunk ({m_seg} units) smaller than the "
                f"state-reconstruction suffix ({m_sfx} units) — use a "
                "larger chunk_size or fewer shards (one ppermute hop "
                "reaches only the immediate neighbor)"
            )
        self.suffix_units = m_sfx
        self._out_struct: Optional[Tuple[Any, Any]] = None

    def _segment_chunks(self, chunks: List[int]) -> List[int]:
        return [c // self.n_shards for c in chunks]

    def _build_templates(self) -> None:
        """(Re)run ``make_state`` for every pure block — segment sizes,
        except FULL chunk for ``sharded_params`` blocks whose params
        span the global chunk — and classify the results into the carry
        template and the affine-base template. Called from ``_setup``
        (validation) and from every ``init_states`` (run entry must
        refresh chunk-size captures, the single-device contract)."""
        seg = self._segment_chunks
        templates: Dict[str, Any] = {}
        aff: Dict[str, Any] = {}
        for bid in self.pure_ids:
            b = self.fg.blocks[bid]
            full_params = bool(getattr(b, "sharded_params", ()))
            ic, oc = (
                (self.in_chunks[bid], self.out_chunks[bid])
                if full_params
                else (seg(self.in_chunks[bid]), seg(self.out_chunks[bid]))
            )
            st = b.make_state(ic, oc)
            if bid in self._affine_ids:
                aff[self.bkey(bid)] = st
            if bid in self.source_pure_ids:
                if jtu.tree_leaves(st) and bid not in self._affine_ids:
                    raise RateError(
                        f"{b.instance_name}: stateful device sources "
                        "cannot run under a mesh unless their state is "
                        "position-affine (advance_state hook — NCO "
                        "phases); feed the stream from a host source or "
                        "a ResidentSource instead"
                    )
                continue
            templates[self.bkey(bid)] = st
        self._carry_template = templates
        self._aff_template = aff

    # ---- carried state = the ppermute carry package ----------------------
    def init_states(self) -> Dict[str, Any]:
        S = self.n_shards
        self._build_templates()
        carry = dict(self._carry_template)
        if self._aff_template:
            carry["__aff"] = self._aff_template
        return jtu.tree_map(
            lambda a: jnp.broadcast_to(
                jnp.asarray(a)[None], (S,) + jnp.asarray(a).shape
            ),
            carry,
        )

    # ---- params placement ------------------------------------------------
    def put_params(self, params):
        from jax.sharding import NamedSharding

        axis = self.axis
        shardings = {}
        for bid in self.pure_ids:
            b = self.fg.blocks[bid]
            split = set(getattr(b, "sharded_params", ()) or ())
            per = {}
            for name, arr in params.get(self.bkey(bid), {}).items():
                nd = np.asarray(arr).ndim
                if name in split and nd >= 1:
                    per[name] = NamedSharding(
                        self.mesh, _last_axis_spec(nd, axis)
                    )
                else:
                    per[name] = NamedSharding(self.mesh, _pspec())
            shardings[self.bkey(bid)] = per
        return jax.device_put(params, shardings)

    def _param_specs(self, params):
        axis = self.axis
        specs = {}
        for bk, per in params.items():
            bid = int(bk[1:])
            split = set(
                getattr(self.fg.blocks[bid], "sharded_params", ()) or ()
            )
            specs[bk] = {
                name: (
                    _last_axis_spec(np.ndim(arr), axis)
                    if name in split and np.ndim(arr) >= 1
                    else _pspec()
                )
                for name, arr in per.items()
            }
        return specs

    # ---- the sharded body -------------------------------------------------
    def _seed_sources(self, params, aff_base, idx) -> Dict[str, Any]:
        """Evaluate pure device sources at segment size; returns their
        output-port values (sharded params arrive pre-split, so e.g. a
        ResidentSource emits exactly its shard's slice). Affine sources
        (SignalSource) get their NCO phase positioned at this shard's
        segment start from the chunk-start base."""
        vals: Dict[str, Any] = {}
        seg_units = self.multiplier // self.n_shards
        for bid in self.source_pure_ids:
            b = self.fg.blocks[bid]
            bk = self.bkey(bid)
            st = ()
            if bid in self._affine_ids:
                off = jnp.uint32(idx) * jnp.uint32(
                    seg_units * self._aff_ipu[bid]
                )
                st = b.advance_state(aff_base[bk], off, params[bk])
            with jax.named_scope(b.instance_name):
                _, outs, _ = b.apply(st, [], params[bk])
            for p, o in enumerate(outs):
                vals[self.pkey(bid, p)] = o
        return vals

    def _body(self, carry, params, src_arrays):
        axis = self.axis
        idx = jax.lax.axis_index(axis)
        # 1. per-shard slices: drop the leading length-1 carry axis
        carry = dict(carry)
        aff_carry = carry.pop("__aff", None)
        prev = jtu.tree_map(lambda a: a[0], carry)
        aff_base = (
            jtu.tree_map(lambda a: a[0], aff_carry)
            if aff_carry is not None
            else {}
        )
        # 2. source values at segment size (host srcs arrive pre-split)
        vals_src = dict(src_arrays)
        vals_src.pop("__scan_len", None)
        vals_src.update(self._seed_sources(params, aff_base, idx))
        # 3. state package: re-run the graph body on the raw suffix from
        #    the initial states; the resulting states are exactly what
        #    the right neighbor needs (transient bounded by the latency
        #    calculus — see _setup). Affine blocks' suffix init is the
        #    chunk-start base advanced to the suffix's absolute position
        #    (their history parts stay the template zeros and rebuild
        #    from the suffix like any other history).
        sfx_vals = {
            k: cplx.apply1(
                lambda a: a[..., a.shape[-1] - self.suffix_units * self.src_units[k]:],
                v,
            )
            for k, v in vals_src.items()
        }
        init = dict(self._carry_template)
        seg_units = self.multiplier // self.n_shards
        for bid in self._affine_ids:
            if bid in self.source_pure_ids:
                continue
            bk = self.bkey(bid)
            off = (
                jnp.uint32(idx + 1) * jnp.uint32(seg_units)
                - jnp.uint32(self.suffix_units)
            ) * jnp.uint32(self._aff_ipu[bid])
            init[bk] = self.fg.blocks[bid].advance_state(
                aff_base[bk], off, params[bk]
            )
        pkg, _, _ = CompiledFlowgraph._eval(self, init, params, sfx_vals)
        # drop state keys the carry does not track (defensive: _eval
        # returns states for every evaluated block)
        pkg = {k: pkg[k] for k in self._carry_template}
        # 4. one ring ppermute per dtype group; wrap edge = next step's
        #    shard-0 carry
        recv = _ppermute_pytree(pkg, axis)
        states = jtu.tree_map(
            lambda p, r: jnp.where(idx == 0, p, r), prev, recv
        )
        # 5. the real segment evaluation with reconstructed states
        _, sinks, aux = CompiledFlowgraph._eval(
            self, states, params, vals_src
        )
        # 5b. advance every affine base by one chunk — deterministic on
        # all shards, no collective; uses THIS step's params exactly as
        # the single-device executor's carried state would (so retunes
        # between steps stay phase-continuous)
        new_aff = {
            self.bkey(bid): self.fg.blocks[bid].advance_state(
                aff_base[self.bkey(bid)],
                jnp.uint32(self.multiplier * self._aff_ipu[bid]),
                params[self.bkey(bid)],
            )
            for bid in self._affine_ids
        }
        # 6. reduce device_reduce sink scalars (per-shard scalars cannot
        #    concatenate; the value is only a keep-alive checksum)
        for bid in self.host_sink_ids:
            if getattr(self.fg.blocks[bid], "device_reduce", False):
                for e in self.fg.in_edges(bid):
                    k = self.pkey(bid, e.dst_port)
                    sinks[k] = cplx.apply1(
                        lambda t: jax.lax.psum(t, axis), sinks[k]
                    )
        # 7. aux: leading shard axis (documented: under a mesh, aux
        #    arrays carry an [n_shards, ...] leading axis)
        aux = jtu.tree_map(lambda a: jnp.asarray(a)[None], aux)
        new_carry = jtu.tree_map(lambda a: a[None], recv)
        if aff_carry is not None:
            new_carry["__aff"] = jtu.tree_map(
                lambda a: jnp.asarray(a)[None], new_aff
            )
        return new_carry, sinks, aux

    def _eval(self, states, params, src_arrays):
        from jax import shard_map

        axis = self.axis
        carry_spec = jtu.tree_map(lambda _: _pspec(axis), states)
        param_spec = self._param_specs(params)
        src_spec = {
            k: (
                jtu.tree_map(
                    lambda a: _last_axis_spec(jnp.asarray(a).ndim, axis), v
                )
                if k in self.src_units
                else jtu.tree_map(lambda a: _pspec(), v)
            )
            for k, v in src_arrays.items()
        }
        if self._out_struct is None:
            # discover sink/aux leaf structure once via an abstract trace
            # of the UNSHARDED body at segment sizes (shard_map needs
            # out_specs before tracing)
            def _seg_sds(a, split):
                a = jnp.asarray(a) if not hasattr(a, "dtype") else a
                shp = (
                    a.shape[:-1] + (a.shape[-1] // self.n_shards,)
                    if split
                    else tuple(a.shape)
                )
                return jax.ShapeDtypeStruct(shp, a.dtype)

            seg_srcs = {
                k: jtu.tree_map(lambda a: _seg_sds(a, k in self.src_units), v)
                for k, v in src_arrays.items()
            }

            def probe(params_, srcs_):
                vals = dict(srcs_)
                vals.pop("__scan_len", None)
                # abstract trace: only shapes matter, position 0 is fine
                vals.update(
                    self._seed_sources(params_, self._aff_template, 0)
                )
                _, sinks, aux = CompiledFlowgraph._eval(
                    self, self._carry_template, params_, vals
                )
                return sinks, aux

            sinks_s, aux_s = jax.eval_shape(probe, params, seg_srcs)
            if jtu.tree_leaves(aux_s):
                names = sorted(
                    self.fg.blocks[int(bk[1:])].instance_name
                    for bk in aux_s
                )
                raise RateError(
                    "blocks with aux outputs cannot run under a mesh "
                    f"yet: {names}. Their aux drives host-side "
                    "variable-rate compaction / valid counting "
                    "(Filter masks, ApplyIntoIter counts, Selector "
                    "drain counters), which is per-chunk host logic — "
                    "sharding it silently mis-counts. Run this graph "
                    "without mesh=."
                )
            reduce_keys = {
                self.pkey(bid, e.dst_port)
                for bid in self.host_sink_ids
                if getattr(self.fg.blocks[bid], "device_reduce", False)
                for e in self.fg.in_edges(bid)
            }
            sink_spec = {
                k: jtu.tree_map(
                    lambda a: _pspec()
                    if k in reduce_keys
                    else _last_axis_spec(max(1, a.ndim), axis),
                    v,
                )
                for k, v in sinks_s.items()
            }
            aux_spec = jtu.tree_map(
                lambda a: _pspec(axis), aux_s
            )
            self._out_struct = (sink_spec, aux_spec)
        sink_spec, aux_spec = self._out_struct
        fn = shard_map(
            self._body,
            mesh=self.mesh,
            in_specs=(carry_spec, param_spec, src_spec),
            out_specs=(carry_spec, sink_spec, aux_spec),
            check_vma=False,
        )
        return fn(states, params, src_arrays)


def shard_compiled(
    cfg: CompiledFlowgraph, mesh, axis: str = "time"
) -> MeshCompiledFlowgraph:
    """Wrap a compiled flowgraph for mesh execution (see module doc)."""
    return MeshCompiledFlowgraph.from_cfg(cfg, mesh, axis)
