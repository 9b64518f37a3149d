"""Checkpoint / resume for running flowgraphs.

The reference has no checkpointing at all (SURVEY.md §5: the closest
mechanism is reading block state back from a *finished* graph). Long-
running production streams want more: snapshot a live flowgraph's full
state — every block's device-side carry (filter histories, NCO phase,
feedback scans) plus host-side positions and accumulations — and resume
it later, bit-exactly, as if the stream had never stopped.

Format: a single ``.npz`` holding the flattened device-state leaves
(saved as numpy), a pickled dict of per-block host state
(:meth:`Block.host_state`), and a JSON manifest (graph signature, sink
latency ledger, step counter). Restore validates the leaf structure
against the new executor's own ``init_states()``, so a checkpoint can
only load into a structurally identical graph.

SECURITY: checkpoint files are TRUSTED input. Host state is pickled
(block states are arbitrary Python), so ``load_checkpoint`` executes
whatever a tampered file contains — same trust model as ``torch.load``.
Never restore a checkpoint from an untrusted source. (The REST
``/snapshot/`` route only *writes* checkpoints; restore is not exposed
remotely.)

Coverage: file/vector sources and sinks, ``Head``, and the seify
dummy/file drivers checkpoint their positions; live network sources
(rtl_tcp, TCP/UDP/ZMQ) are intentionally position-less — a resumed
graph rejoins the live stream.
"""

from __future__ import annotations

import io
import json
import pickle
from pathlib import Path
from typing import Any, Dict

import jax
import numpy as np

_VERSION = 1


def graph_signature(fg) -> str:
    """Structural identity: block types/ports + edge topology."""
    parts = []
    for bid, b in enumerate(fg.blocks):
        parts.append(
            f"{bid}:{b.type_name}"
            f"[{len(b.stream_inputs)},{len(b.stream_outputs)}]"
        )
    for e in fg.stream_edges:
        parts.append(f"{e.src}.{e.src_port}>{e.dst}.{e.dst_port}~{e.feedback}")
    return ";".join(parts)


def save_checkpoint(
    path,
    fg,
    states,
    lat_left: Dict[str, int],
    steps_run: int,
) -> None:
    leaves = jax.tree_util.tree_leaves(states)
    host_states = {
        bid: st
        for bid, b in enumerate(fg.blocks)
        if (st := b.host_state()) is not None
    }
    # device params (retuned NCO increments, retunable taps, routes …)
    # are part of "as if the stream had never stopped": without them a
    # snapshot taken after a live retune would silently resume with the
    # CONSTRUCTOR values
    # EVERY block appears (empty dict included): the loader validates
    # key-set equality per block, so a retunable-flag change is caught
    # in BOTH directions — an empty saved set vs a non-empty graph set
    # is as much a structural mismatch as the reverse
    params_states = {
        bid: {k: np.asarray(v) for k, v in b._params.items()}
        for bid, b in enumerate(fg.blocks)
    }
    manifest = {
        "version": _VERSION,
        "signature": graph_signature(fg),
        "n_leaves": len(leaves),
        "lat_left": {k: int(v) for k, v in lat_left.items()},
        "steps_run": int(steps_run),
    }
    payload: Dict[str, Any] = {
        f"leaf_{i}": np.asarray(jax.device_get(l)) for i, l in enumerate(leaves)
    }
    payload["__host__"] = np.frombuffer(
        pickle.dumps(host_states, protocol=4), dtype=np.uint8
    )
    payload["__params__"] = np.frombuffer(
        pickle.dumps(params_states, protocol=4), dtype=np.uint8
    )
    payload["__manifest__"] = np.frombuffer(
        json.dumps(manifest).encode(), dtype=np.uint8
    )
    buf = io.BytesIO()
    np.savez_compressed(buf, **payload)
    Path(path).write_bytes(buf.getvalue())  # atomic-enough single write


def load_checkpoint(path, fg, init_states):
    """Returns ``(states, lat_left, steps_run)`` with ``states`` shaped
    like ``init_states`` (same treedef), and applies host state to the
    blocks of ``fg``."""
    with np.load(Path(path), allow_pickle=False) as z:
        manifest = json.loads(bytes(z["__manifest__"].tobytes()).decode())
        if manifest["version"] != _VERSION:
            raise ValueError(f"checkpoint version {manifest['version']}")
        sig = graph_signature(fg)
        if manifest["signature"] != sig:
            raise ValueError(
                "checkpoint was taken from a structurally different "
                f"flowgraph:\n  saved: {manifest['signature']}\n"
                f"  this:  {sig}"
            )
        ref_leaves, treedef = jax.tree_util.tree_flatten(init_states)
        if manifest["n_leaves"] != len(ref_leaves):
            raise ValueError(
                f"state leaf count mismatch: saved {manifest['n_leaves']}, "
                f"graph has {len(ref_leaves)}"
            )
        leaves = []
        for i, ref in enumerate(ref_leaves):
            leaf = z[f"leaf_{i}"]
            ref = np.asarray(ref)
            if leaf.shape != ref.shape or leaf.dtype != ref.dtype:
                raise ValueError(
                    f"state leaf {i}: saved {leaf.shape}/{leaf.dtype} vs "
                    f"graph {ref.shape}/{ref.dtype}"
                )
            leaves.append(leaf)
        host_states = pickle.loads(bytes(z["__host__"].tobytes()))
        params_states = (
            pickle.loads(bytes(z["__params__"].tobytes()))
            if "__params__" in z.files
            else {}  # pre-params checkpoint: constructor params stand
        )
    # validate EVERYTHING before mutating any block, so a rejected
    # checkpoint leaves the graph untouched
    if params_states:
        for bid, b in enumerate(fg.blocks):
            saved = params_states.get(bid, {})
            if set(saved) != set(b._params):
                raise ValueError(
                    f"block {b.instance_name}: checkpoint params "
                    f"{sorted(saved)} do not match this graph's "
                    f"{sorted(b._params)} (e.g. retunable flag changed)"
                )
            for k, v in saved.items():
                cur = np.asarray(b._params[k])
                v = np.asarray(v)
                if v.shape != cur.shape or v.dtype != cur.dtype:
                    raise ValueError(
                        f"block {b.instance_name} param {k!r}: saved "
                        f"{v.shape}/{v.dtype} vs graph "
                        f"{cur.shape}/{cur.dtype}"
                    )
    for bid, st in host_states.items():
        fg.blocks[int(bid)].set_host_state(st)
    for bid, saved in params_states.items():
        b = fg.blocks[int(bid)]
        for k, v in saved.items():
            b._params[k] = np.asarray(v)  # _ParamDict bumps → re-upload
    states = jax.tree_util.tree_unflatten(treedef, leaves)
    return states, dict(manifest["lat_left"]), int(manifest["steps_run"])
