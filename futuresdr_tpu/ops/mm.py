"""Mueller-Müller timing recovery kernel.

Parity: ``/root/reference/examples/zigbee/src/clock_recovery_mm.rs`` — the
per-output-symbol recurrence

    y       = x[ii] + mu·(x[ii+1] − x[ii])
    e       = sgn(last)·y − sgn(y)·last
    omega  += gain_omega·e            (clamped to omega_mid ± limit)
    mu     += omega + gain_mu·e
    ii     += floor(mu);  mu −= floor(mu)

is inherently sequential, so the TPU form is a ``lax.scan`` over output
slots with dynamic gathers into the input buffer. Note the TPU-*first*
zigbee receiver avoids this loop entirely (batch template correlation,
``models/zigbee``); this kernel exists for behavioral parity and for real
sample-rate-offset tracking, and it runs inside the fused step, not on the
host.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class MmState(NamedTuple):
    ii: jnp.ndarray  # int32 read position in the work buffer
    mu: jnp.ndarray  # f32 fractional inter-sample phase
    omega: jnp.ndarray  # f32 current samples/symbol estimate
    last: jnp.ndarray  # f32 previous output (slicer memory)


def mm_init(omega: float) -> MmState:
    return MmState(
        ii=jnp.int32(0),
        mu=jnp.float32(0.5),
        omega=jnp.float32(omega),
        last=jnp.float32(0.0),
    )


@partial(
    jax.jit,
    static_argnames=(
        "n_out",
        "look_ahead",
        "omega_mid",
        "omega_limit",
        "gain_omega",
        "gain_mu",
    ),
)
def mm_process(
    state: MmState,
    buf: jnp.ndarray,
    n_out: int,
    look_ahead: int,
    omega_mid: float,
    omega_limit: float,
    gain_omega: float,
    gain_mu: float,
):
    """Run the recurrence over ``buf`` producing up to ``n_out`` symbols.

    Returns ``(state', out[n_out], valid[n_out])`` where slots past the
    buffer end are zero with ``valid`` False; ``state'.ii`` points at the
    first unread sample (may exceed ``len(buf) − look_ahead``)."""
    L = buf.shape[-1]

    def sgn(v):
        return jnp.where(v > 0, jnp.float32(1.0), jnp.float32(-1.0))

    def body(carry, _):
        ii, mu, omega, last = carry
        active = ii + look_ahead < L
        x0 = jnp.take(buf, ii, mode="clip")
        x1 = jnp.take(buf, ii + 1, mode="clip")
        y = x0 + mu * (x1 - x0)
        e = sgn(last) * y - sgn(y) * last
        omega_n = omega + jnp.float32(gain_omega) * e
        omega_n = jnp.float32(omega_mid) + jnp.clip(
            omega_n - jnp.float32(omega_mid),
            -jnp.float32(omega_limit),
            jnp.float32(omega_limit),
        )
        mu_t = mu + omega_n + jnp.float32(gain_mu) * e
        adv = jnp.floor(mu_t)
        ii_n = ii + adv.astype(jnp.int32)
        mu_n = mu_t - adv
        carry_n = MmState(
            ii=jnp.where(active, ii_n, ii),
            mu=jnp.where(active, mu_n, mu),
            omega=jnp.where(active, omega_n, omega),
            last=jnp.where(active, y, last),
        )
        return carry_n, (jnp.where(active, y, 0.0), active)

    new_state, (out, valid) = jax.lax.scan(
        body, MmState(*state), None, length=n_out
    )
    return new_state, out, valid
