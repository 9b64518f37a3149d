"""Multi-host (N≥2 processes) distribution proof.

Spawns real OS processes joined via ``jax.distributed.initialize`` over a
host×chip CPU mesh (DCN axis = processes, ICI axis = per-process devices)
and asserts the sharded flagship bank matches the serial pipeline
numerically — the BASELINE "1 host, N≥2 hosts" tier, which the reference
(single-process by design) never had.
"""

import socket
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.parametrize("n_proc,n_dev", [(2, 4)])
def test_multihost_bank_matches_serial(n_proc, n_dev):
    port = _free_port()
    procs = []
    for pid in range(n_proc):
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    "-m",
                    "futuresdr_tpu.parallel.multihost_worker",
                    "--coordinator",
                    f"localhost:{port}",
                    "--num-processes",
                    str(n_proc),
                    "--process-id",
                    str(pid),
                    "--local-devices",
                    str(n_dev),
                ],
                cwd=ROOT,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    assert all(p.returncode == 0 for p in procs), "\n".join(outs)
    assert any("MULTIHOST_OK" in o for o in outs), "\n".join(outs)
