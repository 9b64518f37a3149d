"""Special functions (parity: ``crates/futuredsp/src/math/special_funs.rs``)."""

from __future__ import annotations

import numpy as np


def besseli0(x) -> np.ndarray:
    """Modified Bessel function of the first kind, order zero.

    The reference uses the Abramowitz & Stegun polynomial approximation
    (``special_funs.rs:22-46``, abs error < 1.9e-7); NumPy ships an exact
    implementation, so we use it directly — strictly more accurate.
    """
    return np.i0(np.asarray(x, dtype=np.float64))
