"""Stream tags.

Parity: ``src/runtime/tag.rs:52-102`` (``Tag`` variants, ``ItemTag``) and the
tag propagation / index-rebasing semantics of the circular buffer
(``src/runtime/buffer/circular.rs:37-64``).

TPU-first design: sample data lives on device; tags are **host-side chunk
metadata**. Each stream edge carries a list of :class:`ItemTag` per step,
with ``index`` relative to the chunk start. Blocks declare a propagation
policy; rate changes rescale indices by the rational rate (the compiler
knows every edge's exact items/step, so rebasing is exact). Device-generated
events (e.g. a sync detector) surface through the block ``aux`` output and
are converted to tags by the block's host hook.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from fractions import Fraction
from typing import Any, List

from futuresdr_tpu.types.pmt import Pmt


class TagValueKind(enum.Enum):
    ID = "Id"
    STRING = "String"
    DATA = "Data"  # Pmt payload
    NAMED_USIZE = "NamedUsize"
    NAMED_F32 = "NamedF32"
    NAMED_ANY = "NamedAny"


@dataclass(frozen=True)
class Tag:
    kind: TagValueKind
    name: str = ""
    value: Any = None

    @classmethod
    def id(cls, v: int) -> "Tag":
        return cls(TagValueKind.ID, "", int(v))

    @classmethod
    def string(cls, s: str) -> "Tag":
        return cls(TagValueKind.STRING, "", str(s))

    @classmethod
    def data(cls, pmt: Pmt) -> "Tag":
        return cls(TagValueKind.DATA, "", pmt)

    @classmethod
    def named_usize(cls, name: str, v: int) -> "Tag":
        return cls(TagValueKind.NAMED_USIZE, name, int(v))

    @classmethod
    def named_f32(cls, name: str, v: float) -> "Tag":
        return cls(TagValueKind.NAMED_F32, name, float(v))

    @classmethod
    def named_any(cls, name: str, v: Any) -> "Tag":
        return cls(TagValueKind.NAMED_ANY, name, v)


@dataclass(frozen=True)
class ItemTag:
    """A tag attached to stream item ``index`` (chunk-relative)."""

    index: int
    tag: Tag

    def shifted(self, delta: int) -> "ItemTag":
        return ItemTag(self.index + delta, self.tag)


class TagPropagation(enum.Enum):
    """How a block maps input tags to output tags."""

    PROPAGATE = "propagate"  # rescale index by the block's rate ratio
    DROP = "drop"
    CUSTOM = "custom"  # block implements propagate_tags()


def rescale_tags(
    tags: List[ItemTag], in_items: int, out_items: int
) -> List[ItemTag]:
    """Map chunk-relative tag indices across a rate change (exact rational)."""
    if in_items == out_items:
        return list(tags)
    ratio = Fraction(out_items, in_items)
    out = []
    for t in tags:
        idx = int(t.index * ratio)
        if 0 <= idx < out_items:
            out.append(ItemTag(idx, t.tag))
    return out
