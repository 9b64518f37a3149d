"""Host-side DSP *design* math (filter taps, windows).

Parity tier: ``crates/futuredsp/src/{windows.rs,firdes/,math/}`` — but note
the split: in this framework tap **design** runs on host in NumPy at graph
trace time, while tap **application** (FIR/IIR/FFT inner loops) lives in
:mod:`futuresdr_tpu.ops` as XLA/Pallas device kernels.
"""

from futuresdr_tpu.dsp import firdes, windows
from futuresdr_tpu.dsp.math import besseli0

__all__ = ["windows", "firdes", "besseli0", "adpcm", "g711", "remez"]


def __getattr__(name):  # lazy: codec tables build on first use
    if name in ("adpcm", "g711", "remez"):
        import importlib

        return importlib.import_module(f"futuresdr_tpu.dsp.{name}")
    raise AttributeError(name)
