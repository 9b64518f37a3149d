"""Run a single block without a runtime (parity: examples/mock.rs).

The Mocker stages inputs, invokes the block's chunk function once, and
returns outputs — the unit-test harness as a user-facing tool.

Run:  python examples/mock.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from futuresdr_tpu.blocks import Apply  # noqa: E402
from futuresdr_tpu.runtime.mocker import Mocker  # noqa: E402


def main() -> None:
    data = np.random.default_rng(1).integers(0, 1024, 64).astype(np.uint32)
    block = Apply(lambda x: x + 1, in_dtype=np.uint32)
    mocker = Mocker(block)
    mocker.input(0, data)
    mocker.run()
    out = mocker.output(0)
    assert np.array_equal(out, data + 1)
    print(f"mocked Apply(+1) over {len(data)} items: ok")


if __name__ == "__main__":
    main()
