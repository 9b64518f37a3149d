"""Typed ID newtypes (parity: ``crates/types/src/{block_id,port_id,flowgraph_id}.rs``)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Union


@dataclass(frozen=True, order=True)
class BlockId:
    """Index of a block inside a flowgraph."""

    value: int

    def __int__(self) -> int:
        return self.value

    def __repr__(self) -> str:
        return f"BlockId({self.value})"


@dataclass(frozen=True)
class PortId:
    """A port addressed by index or by name (``port_id.rs``)."""

    value: Union[int, str]

    def is_name(self) -> bool:
        return isinstance(self.value, str)

    def __repr__(self) -> str:
        return f"PortId({self.value!r})"


@dataclass(frozen=True, order=True)
class FlowgraphId:
    """Index of a flowgraph inside a runtime."""

    value: int

    def __int__(self) -> int:
        return self.value

    def __repr__(self) -> str:
        return f"FlowgraphId({self.value})"
