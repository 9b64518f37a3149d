"""Pmt — polymorphic message type.

Python analogue of the reference's tagged ``Pmt`` enum
(``crates/types/src/pmt.rs:78-129``): the single value type carried over
message ports, used for handler arguments/returns, and serialized over the
control plane. Since Python is dynamically typed we keep an explicit *kind*
tag so control-plane round-trips and handler contracts stay type-checked,
like the Rust original.
"""

from __future__ import annotations

import enum
import json
from dataclasses import dataclass
from typing import Any, Dict, List

import numpy as np


class PmtKind(enum.Enum):
    """Variant tags, mirroring ``crates/types/src/pmt.rs:487-540``."""

    OK = "Ok"
    INVALID_VALUE = "InvalidValue"
    NULL = "Null"
    STRING = "String"
    BOOL = "Bool"
    USIZE = "Usize"
    ISIZE = "Isize"
    U32 = "U32"
    U64 = "U64"
    F32 = "F32"
    F64 = "F64"
    VEC_CF32 = "VecCF32"
    VEC_F32 = "VecF32"
    VEC_U64 = "VecU64"
    BLOB = "Blob"
    VEC_PMT = "VecPmt"
    FINISHED = "Finished"
    MAP_STR_PMT = "MapStrPmt"
    ANY = "Any"


_SCALAR_RANGES = {
    PmtKind.U32: (0, 2**32 - 1),
    PmtKind.U64: (0, 2**64 - 1),
    PmtKind.USIZE: (0, 2**64 - 1),
    PmtKind.ISIZE: (-(2**63), 2**63 - 1),
}


@dataclass(frozen=True)
class Pmt:
    """A kinded polymorphic value.

    Construct via the classmethods (``Pmt.f32(3.0)``, ``Pmt.map({...})``)
    or via :meth:`from_py` which infers a kind from a Python value.
    """

    kind: PmtKind
    value: Any = None

    # ---- constructors -------------------------------------------------
    @classmethod
    def ok(cls) -> "Pmt":
        return cls(PmtKind.OK)

    @classmethod
    def invalid_value(cls) -> "Pmt":
        return cls(PmtKind.INVALID_VALUE)

    @classmethod
    def null(cls) -> "Pmt":
        return cls(PmtKind.NULL)

    @classmethod
    def finished(cls) -> "Pmt":
        return cls(PmtKind.FINISHED)

    @classmethod
    def string(cls, v: str) -> "Pmt":
        return cls(PmtKind.STRING, str(v))

    @classmethod
    def bool_(cls, v: bool) -> "Pmt":
        return cls(PmtKind.BOOL, bool(v))

    @classmethod
    def usize(cls, v: int) -> "Pmt":
        return cls._int(PmtKind.USIZE, v)

    @classmethod
    def isize(cls, v: int) -> "Pmt":
        return cls._int(PmtKind.ISIZE, v)

    @classmethod
    def u32(cls, v: int) -> "Pmt":
        return cls._int(PmtKind.U32, v)

    @classmethod
    def u64(cls, v: int) -> "Pmt":
        return cls._int(PmtKind.U64, v)

    @classmethod
    def f32(cls, v: float) -> "Pmt":
        return cls(PmtKind.F32, float(np.float32(v)))

    @classmethod
    def f64(cls, v: float) -> "Pmt":
        return cls(PmtKind.F64, float(v))

    @classmethod
    def vec_cf32(cls, v) -> "Pmt":
        return cls(PmtKind.VEC_CF32, np.asarray(v, dtype=np.complex64))

    @classmethod
    def vec_f32(cls, v) -> "Pmt":
        return cls(PmtKind.VEC_F32, np.asarray(v, dtype=np.float32))

    @classmethod
    def vec_u64(cls, v) -> "Pmt":
        return cls(PmtKind.VEC_U64, np.asarray(v, dtype=np.uint64))

    @classmethod
    def blob(cls, v: bytes) -> "Pmt":
        return cls(PmtKind.BLOB, bytes(v))

    @classmethod
    def vec_pmt(cls, v: List["Pmt"]) -> "Pmt":
        items = list(v)
        for it in items:
            if not isinstance(it, Pmt):
                raise TypeError(f"VecPmt items must be Pmt, got {type(it)}")
        return cls(PmtKind.VEC_PMT, items)

    @classmethod
    def map(cls, v: Dict[str, "Pmt"]) -> "Pmt":
        out = {}
        for k, it in v.items():
            if not isinstance(it, Pmt):
                it = cls.from_py(it)
            out[str(k)] = it
        return cls(PmtKind.MAP_STR_PMT, out)

    @classmethod
    def any_(cls, v: Any) -> "Pmt":
        return cls(PmtKind.ANY, v)

    @classmethod
    def _int(cls, kind: PmtKind, v: int) -> "Pmt":
        v = int(v)
        lo, hi = _SCALAR_RANGES[kind]
        if not (lo <= v <= hi):
            raise ValueError(f"{kind.value} out of range: {v}")
        return cls(kind, v)

    @classmethod
    def from_py(cls, v: Any) -> "Pmt":
        """Infer a Pmt from a plain Python value (handler convenience)."""
        if isinstance(v, Pmt):
            return v
        if v is None:
            return cls.null()
        if isinstance(v, bool):
            return cls.bool_(v)
        if isinstance(v, (int, np.integer)):
            return cls.isize(int(v)) if v < 0 else cls.usize(int(v))
        if isinstance(v, (float, np.floating)):
            return cls.f64(float(v))
        if isinstance(v, str):
            return cls.string(v)
        if isinstance(v, (bytes, bytearray)):
            return cls.blob(bytes(v))
        if isinstance(v, dict):
            return cls.map(v)
        if isinstance(v, np.ndarray):
            if np.iscomplexobj(v):
                return cls.vec_cf32(v)
            if np.issubdtype(v.dtype, np.unsignedinteger):
                return cls.vec_u64(v)
            return cls.vec_f32(v)
        if isinstance(v, (list, tuple)):
            if all(isinstance(x, Pmt) for x in v):
                return cls.vec_pmt(list(v))
            if all(isinstance(x, (int, float, complex, np.number)) for x in v):
                return cls.from_py(np.asarray(v))
            # heterogeneous sequence (e.g. (psdu_bytes, mcs_name)) →
            # VecPmt of inferred elements (the reference uses Pmt::Any)
            return cls.vec_pmt([cls.from_py(x) for x in v])
        return cls.any_(v)

    # ---- accessors -----------------------------------------------------
    def to_py(self) -> Any:
        """Unwrap to a plain Python value (kind info dropped)."""
        if self.kind in (PmtKind.OK, PmtKind.NULL, PmtKind.FINISHED,
                         PmtKind.INVALID_VALUE):
            return None
        if self.kind == PmtKind.VEC_PMT:
            return [p.to_py() for p in self.value]
        if self.kind == PmtKind.MAP_STR_PMT:
            return {k: p.to_py() for k, p in self.value.items()}
        return self.value

    def as_float(self) -> float:
        """Numeric coercion like the reference's ``TryInto<f64>``."""
        if self.kind in (PmtKind.F32, PmtKind.F64, PmtKind.U32, PmtKind.U64,
                         PmtKind.USIZE, PmtKind.ISIZE):
            return float(self.value)
        raise TypeError(f"Pmt {self.kind.value} is not numeric")

    def as_int(self) -> int:
        if self.kind in (PmtKind.U32, PmtKind.U64, PmtKind.USIZE,
                         PmtKind.ISIZE):
            return int(self.value)
        if self.kind in (PmtKind.F32, PmtKind.F64):
            if float(self.value).is_integer():
                return int(self.value)
        raise TypeError(f"Pmt {self.kind.value} is not an integer")

    def is_finished(self) -> bool:
        return self.kind == PmtKind.FINISHED

    # ---- serde (control-plane JSON, like pmt.rs serde impl) ------------
    def to_json(self) -> str:
        return json.dumps(self._encode())

    def _encode(self) -> Any:
        k = self.kind
        if k in (PmtKind.OK, PmtKind.NULL, PmtKind.FINISHED,
                 PmtKind.INVALID_VALUE):
            return k.value
        if k == PmtKind.VEC_CF32:
            v = np.asarray(self.value)
            return {k.value: [[float(c.real), float(c.imag)] for c in v]}
        if k in (PmtKind.VEC_F32, PmtKind.VEC_U64):
            return {k.value: np.asarray(self.value).tolist()}
        if k == PmtKind.BLOB:
            return {k.value: list(self.value)}
        if k == PmtKind.VEC_PMT:
            return {k.value: [p._encode() for p in self.value]}
        if k == PmtKind.MAP_STR_PMT:
            return {k.value: {s: p._encode() for s, p in self.value.items()}}
        if k == PmtKind.ANY:
            raise TypeError("Pmt::Any is not serializable (pmt.rs:127)")
        return {k.value: self.value}

    @classmethod
    def from_json(cls, s: str) -> "Pmt":
        return cls._decode(json.loads(s))

    @classmethod
    def _decode(cls, obj: Any) -> "Pmt":
        if isinstance(obj, str):
            return cls(PmtKind(obj))
        if not (isinstance(obj, dict) and len(obj) == 1):
            raise ValueError(f"malformed Pmt json: {obj!r}")
        tag, v = next(iter(obj.items()))
        kind = PmtKind(tag)
        if kind == PmtKind.VEC_CF32:
            return cls.vec_cf32([complex(r, i) for r, i in v])
        if kind == PmtKind.VEC_F32:
            return cls.vec_f32(v)
        if kind == PmtKind.VEC_U64:
            return cls.vec_u64(v)
        if kind == PmtKind.BLOB:
            return cls.blob(bytes(v))
        if kind == PmtKind.VEC_PMT:
            return cls.vec_pmt([cls._decode(x) for x in v])
        if kind == PmtKind.MAP_STR_PMT:
            return cls.map({s: cls._decode(x) for s, x in v.items()})
        if kind == PmtKind.STRING:
            return cls.string(v)
        if kind == PmtKind.BOOL:
            return cls.bool_(v)
        if kind in (PmtKind.F32, PmtKind.F64):
            return cls(kind, float(v))
        if kind in _SCALAR_RANGES:
            return cls._int(kind, v)
        raise ValueError(f"cannot decode Pmt kind {tag}")

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, Pmt):
            return NotImplemented
        if self.kind != other.kind:
            return False
        a, b = self.value, other.value
        if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
            return bool(np.array_equal(np.asarray(a), np.asarray(b)))
        return a == b

    def __hash__(self):
        v = self.value
        if isinstance(v, np.ndarray):
            v = v.tobytes()
        elif isinstance(v, (dict, list)):
            v = id(v)
        return hash((self.kind, v))

    def __repr__(self) -> str:
        if self.value is None:
            return f"Pmt::{self.kind.value}"
        return f"Pmt::{self.kind.value}({self.value!r})"
