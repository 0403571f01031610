"""In-kernel math helpers for Pallas TPU.

The axon TPU toolchain lowers a restricted primitive set (probed:
sin/cos/exp/rsqrt/where/matmul/fori_loop/static-ds/roll yes; atan2,
iota, cumsum, runtime-offset ds no).  Everything here is built from the
supported set so kernels can rely on them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_PI = 3.14159265358979
_PI_2 = 1.57079632679490


def atan2(y: jax.Array, x: jax.Array) -> jax.Array:
    """Elementwise atan2 from arithmetic + where (no atan2 primitive).

    Minimax polynomial on the octant-reduced ratio; max error ~1e-5 rad
    — far below the phase noise of any demod chain.
    """
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    mx = jnp.maximum(ax, ay)
    mn = jnp.minimum(ax, ay)
    a = mn / jnp.maximum(mx, 1e-30)
    s = a * a
    # atan(a) for a in [0, 1]
    r = ((((-0.0117212 * s + 0.05265332) * s - 0.11643287) * s
          + 0.19354346) * s - 0.33262348) * s * a + a
    r = jnp.where(ay > ax, _PI_2 - r, r)
    r = jnp.where(x < 0.0, _PI - r, r)
    r = jnp.where(y < 0.0, -r, r)
    # undefined at (0, 0) → 0
    return jnp.where(mx < 1e-30, jnp.zeros_like(r), r)


def complex_mul(ar, ai, br, bi):
    """(ar+j·ai)·(br+j·bi) as plane pairs."""
    return ar * br - ai * bi, ar * bi + ai * br


def complex_matmul(ar, ai, br, bi):
    """Complex matmul over float32 planes → 4 MXU matmuls."""
    rr = jnp.dot(ar, br, preferred_element_type=jnp.float32) - \
        jnp.dot(ai, bi, preferred_element_type=jnp.float32)
    ri = jnp.dot(ar, bi, preferred_element_type=jnp.float32) + \
        jnp.dot(ai, br, preferred_element_type=jnp.float32)
    return rr, ri
