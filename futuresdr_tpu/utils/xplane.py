"""Minimal XSpace (``*.xplane.pb``) reader — no TensorFlow dependency.

``jax.profiler`` writes TensorBoard-profile XSpace protos. XProf /
TensorBoard are not available in deployment images, so this module
hand-walks the protobuf wire format for the few fields per-block cost
attribution needs. Field numbers follow
``tsl/profiler/protobuf/xplane.proto``:

    XSpace.planes = 1
    XPlane: name=2, lines=3, event_metadata=4 (map), stat_metadata=5 (map)
    XLine:  name=2, events=4
    XEvent: metadata_id=1, duration_ps=3, stats=4 (XStat)
    XEventMetadata: name=2, metadata=3, display_name=4, stats=5
    XStat: metadata_id=1, str_value=5 (oneof; numeric variants 2-4,6-8)

This is the TPU-native replacement for the reference's LTTng sample-path
tracepoints (``perf/perf/src/lttng_sink.rs:6-18``): instead of
instrumenting a scheduler, the compiled step's HLO ops carry their block's
``jax.named_scope`` in the ``tf_op`` stat, and the device trace attributes
real (post-fusion) device time back to flowgraph blocks.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Tuple


def _varint(buf: bytes, i: int) -> Tuple[int, int]:
    r = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, i
        s += 7


def _fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield ``(field_no, wire_type, value)`` over one message's bytes."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wt == 5:
            v = buf[i : i + 4]
            i += 4
        elif wt == 1:
            v = buf[i : i + 8]
            i += 8
        else:  # group wire types are never emitted by xplane
            raise ValueError(f"unsupported wire type {wt}")
        yield fno, wt, v


def _map_entry(buf: bytes) -> Tuple[int, bytes]:
    k, m = 0, b""
    for fno, _wt, v in _fields(buf):
        if fno == 1:
            k = v
        elif fno == 2:
            m = v
    return k, m


@dataclass
class OpEvent:
    plane: str
    line: str
    name: str  # HLO instruction (display) name
    tf_op: str  # scope path, e.g. "jit(step)/<block>/dot_general"
    category: str
    duration_ps: int


def read_op_events(path: str) -> List[OpEvent]:
    """All events of every device plane's lines, with tf_op/category
    resolved from event metadata."""
    data = Path(path).read_bytes()
    out: List[OpEvent] = []
    for fno, _wt, plane in _fields(data):
        if fno != 1:
            continue
        pname = ""
        lines: List[bytes] = []
        emeta_raw: Dict[int, bytes] = {}
        smeta: Dict[int, str] = {}
        for f2, _w2, v in _fields(plane):
            if f2 == 2:
                pname = v.decode()
            elif f2 == 3:
                lines.append(v)
            elif f2 == 4:
                k, m = _map_entry(v)
                emeta_raw[k] = m
            elif f2 == 5:
                k, m = _map_entry(v)
                for f3, _w3, v3 in _fields(m):
                    if f3 == 2:
                        smeta[k] = v3.decode()
        # resolve event metadata: name + tf_op/category stats
        tf_op_id = next(
            (k for k, n in smeta.items() if n == "tf_op"), None
        )
        cat_id = next(
            (k for k, n in smeta.items() if n == "hlo_category"), None
        )
        emeta: Dict[int, Tuple[str, str, str]] = {}
        for k, m in emeta_raw.items():
            name = disp = ""
            tf_op = cat = ""
            for f3, _w3, v3 in _fields(m):
                if f3 == 2:
                    name = v3.decode()
                elif f3 == 4:
                    disp = v3.decode()
                elif f3 == 5:  # XStat
                    sid: Optional[int] = None
                    sval = ""
                    for f4, _w4, v4 in _fields(v3):
                        if f4 == 1:
                            sid = v4
                        elif f4 == 5:
                            sval = v4.decode(errors="replace")
                    if sid == tf_op_id:
                        tf_op = sval
                    elif sid == cat_id:
                        cat = sval
            emeta[k] = (disp or name, tf_op, cat)
        for line in lines:
            lname = ""
            events: List[bytes] = []
            for f3, _w3, v3 in _fields(line):
                if f3 == 2:
                    lname = v3.decode()
                elif f3 == 4:
                    events.append(v3)
            for ev in events:
                mid = 0
                dur = 0
                for f4, _w4, v4 in _fields(ev):
                    if f4 == 1:
                        mid = v4
                    elif f4 == 3:
                        dur = v4
                name, tf_op, cat = emeta.get(mid, ("", "", ""))
                out.append(
                    OpEvent(pname, lname, name, tf_op, cat, dur)
                )
    return out


def latest_xplane(trace_dir: str) -> str:
    """Newest ``*.xplane.pb`` under a ``jax.profiler`` trace directory."""
    files = sorted(
        Path(trace_dir).rglob("*.xplane.pb"), key=lambda p: p.stat().st_mtime
    )
    if not files:
        raise FileNotFoundError(f"no *.xplane.pb under {trace_dir}")
    return str(files[-1])


def block_time_ps(
    trace_dir: str,
    block_names: List[str],
    line_filter: str = "XLA Ops",
) -> Dict[str, int]:
    """Aggregate device-op durations by flowgraph block.

    An op belongs to the block whose ``jax.named_scope`` (= the block's
    instance name, emitted by the graph compiler around each block's
    ``apply``) appears as a path component of its ``tf_op`` stat. Fused
    ops carry their representative op's scope — attribution follows
    XProf's own convention. Ops with no block scope (source conversion,
    donation copies, infeed) land in ``"(unattributed)"``.
    """
    names = set(block_names)
    acc: Dict[str, int] = {}
    for ev in read_op_events(latest_xplane(trace_dir)):
        if line_filter and ev.line != line_filter:
            continue
        block = None
        for comp in ev.tf_op.split("/"):
            if comp in names:
                block = comp
                break
        acc[block or "(unattributed)"] = (
            acc.get(block or "(unattributed)", 0) + ev.duration_ps
        )
    return acc
