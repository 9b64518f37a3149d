"""Layered-config demo (parity: examples/custom-config.rs).

Shows the same layering the reference exercises: defaults → project
``config.toml`` (with a user-defined ``[my]`` table) → environment
``FUTURESDR_TPU_*`` → programmatic ``config.set``, and reading a custom
(non-core) section back out, typed.

Run:  python examples/custom_config.py
"""

from __future__ import annotations

import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    # project config.toml with a custom [my] table (custom-config.rs:6-16)
    with tempfile.TemporaryDirectory() as td:
        (Path(td) / "config.toml").write_text(
            'chunk_size = 16384\n\n[my]\na = 7\nb = "hello"\n'
        )
        os.chdir(td)
        os.environ["FUTURESDR_TPU_LOG_LEVEL"] = "debug"  # env layer

        from futuresdr_tpu import config

        config.reload()  # rebuild the store from the layers above
        print("FutureSDR-TPU config:")
        for key in ("chunk_size", "queue_size", "precision", "log_level"):
            print(f"  {key} = {config.get(key)!r}")

        my = config.get("my")
        if my is None:
            print("MyConfig not found")
        else:
            # c defaults to 42 when the file omits it (custom-config.rs:14)
            print(
                "MyConfig:",
                {"a": int(my["a"]), "b": str(my["b"]), "c": int(my.get("c", 42))},
            )

        config.set("chunk_size", 65536)  # programmatic layer wins
        print("after config.set: chunk_size =", config.get("chunk_size"))


if __name__ == "__main__":
    main()
