#!/usr/bin/env python
"""Bisect the Mosaic compile failure of the recovery kernel on the
axon TPU toolchain ("Check failed: arr.size() >= layout_rank").

Each variant strips part of the kernel; the remote compile helper's
SIGABRT surfaces as a catchable JaxRuntimeError, so one run reports
every variant.  PYTHONPATH must include /root/repo and /root/.axon_site.
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sigdigger_tpu.kernels.ops import atan2

M, CT, K, KEQ = 256, 128, 16, 5
SROWS = 16 + 2 * (K - 1) + 4 * KEQ


def front_only(y_re, y_im, state_in, alpha, out, scr):
    al = alpha[0, :]

    def step(i, carry):
        lo_re, lo_im, freq, qpr, qpi, dc = carry
        xr = y_re[i, :]
        xi = y_im[i, :]
        rr = xr * lo_re + xi * lo_im
        ri = xi * lo_re - xr * lo_im
        mag = jnp.maximum(jnp.sqrt(rr * rr + ri * ri), 1e-12)
        ui = ri / mag
        err = al * ui
        freq = freq + err
        w = freq + al * err
        cw = jnp.cos(w)
        sw = jnp.sin(w)
        nr = lo_re * cw - lo_im * sw
        ni = lo_re * sw + lo_im * cw
        inv = jax.lax.rsqrt(nr * nr + ni * ni)
        dr = xr * qpr + xi * qpi
        di = xi * qpr - xr * qpi
        fv = atan2(di, dr)
        dc = 0.99 * dc + 0.01 * mag
        scr[i + (K - 1), :] = rr + fv
        return nr * inv, ni * inv, freq, xr, xi, dc

    scr[0:K - 1, :] = state_in[0:K - 1, :]
    carry0 = tuple(state_in[i, :] for i in range(6))
    out_c = jax.lax.fori_loop(0, M, step, carry0)
    out[0, :] = out_c[0]


def gardner_noeq(y_re, y_im, state_in, gp, out, scr):
    gpv = gp[0, :]

    def step(i, carry):
        (t, period, prev_re, prev_im, mid_re, mid_im, st_re, st_im,
         want_mid, power) = carry
        xr = y_re[i, :]
        xi = y_im[i, :]
        t = t - 1.0
        event = t <= 0.0
        frac = jnp.clip(t + 1.0, 0.0, 1.0)
        ir = prev_re + frac * (xr - prev_re)
        ii = prev_im + frac * (xi - prev_im)
        is_mid = jnp.logical_and(event, want_mid > 0.5)
        is_strobe = jnp.logical_and(event, want_mid <= 0.5)
        power = power + 0.01 * (xr * xr + xi * xi - power)
        nm_re = jnp.where(is_mid, ir, mid_re)
        nm_im = jnp.where(is_mid, ii, mid_im)
        err = (ir - st_re) * nm_re + (ii - st_im) * nm_im
        err = jnp.where(is_strobe, err, 0.0) / jnp.maximum(power, 1e-9)
        err = jnp.clip(err, -2.0, 2.0)
        period = jnp.clip(period - gpv * err, 2.0, 100.0)
        t = t + jnp.where(event, period * 0.5 - gpv * err, 0.0)
        st_re = jnp.where(is_strobe, ir, st_re)
        st_im = jnp.where(is_strobe, ii, st_im)
        want_mid = jnp.where(event, 1.0 - want_mid, want_mid)
        out[i, :] = jnp.where(is_strobe, ir, 0.0)
        return (t, period, xr, xi, nm_re, nm_im, st_re, st_im,
                want_mid, power)

    carry = tuple(state_in[i, :] for i in range(10))
    carry = jax.lax.fori_loop(0, M, step, carry)
    scr[0, :] = carry[0]


def gardner_eq(y_re, y_im, state_in, gp, out, scr):
    gpv = gp[0, :]

    def step(i, carry):
        (t, period, prev_re, prev_im, st_re, st_im, want_mid,
         power) = carry[:8]
        eq = carry[8:]
        xr = y_re[i, :]
        xi = y_im[i, :]
        t = t - 1.0
        event = t <= 0.0
        frac = jnp.clip(t + 1.0, 0.0, 1.0)
        ir = prev_re + frac * (xr - prev_re)
        ii = prev_im + frac * (xi - prev_im)
        is_strobe = jnp.logical_and(event, want_mid <= 0.5)
        want_mid = jnp.where(event, 1.0 - want_mid, want_mid)
        etr = list(eq[:KEQ])
        eti = list(eq[KEQ:2 * KEQ])
        ebr = list(eq[2 * KEQ:3 * KEQ])
        ebi = list(eq[3 * KEQ:4 * KEQ])
        push = jnp.where(is_strobe, 1.0, 0.0)
        nbr = [push * ir + (1.0 - push) * ebr[0]]
        nbi = [push * ii + (1.0 - push) * ebi[0]]
        for j in range(1, KEQ):
            nbr.append(push * ebr[j - 1] + (1.0 - push) * ebr[j])
            nbi.append(push * ebi[j - 1] + (1.0 - push) * ebi[j])
        yr = etr[0] * nbr[0] - eti[0] * nbi[0]
        yi = etr[0] * nbi[0] + eti[0] * nbr[0]
        for j in range(1, KEQ):
            yr = yr + etr[j] * nbr[j] - eti[j] * nbi[j]
            yi = yi + etr[j] * nbi[j] + eti[j] * nbr[j]
        p = yr * yr + yi * yi
        er = yr * (p - 1.0)
        ei = yi * (p - 1.0)
        emag = jnp.sqrt(er * er + ei * ei)
        s = 1.0 / jnp.maximum(emag, 1.0)
        er = er * s
        ei = ei * s
        pw = jnp.float32(1e-6)
        for j in range(KEQ):
            pw = pw + nbr[j] * nbr[j] + nbi[j] * nbi[j]
        g = push * 0.01 / pw
        for j in range(KEQ):
            etr[j] = etr[j] - g * (er * nbr[j] + ei * nbi[j])
            eti[j] = eti[j] - g * (ei * nbr[j] - er * nbi[j])
        out[i, :] = yr + yi
        t = t + jnp.where(event, period * 0.5 - gpv * 0.0, 0.0)
        return ((t, period, xr, xi, st_re, st_im, want_mid, power)
                + tuple(etr) + tuple(eti) + tuple(nbr) + tuple(nbi))

    carry = tuple(state_in[i, :] for i in range(8 + 4 * KEQ))
    carry = jax.lax.fori_loop(0, M, step, carry)
    scr[0, :] = carry[0]


def state_copy(y_re, y_im, state_in, gp, out, scr):
    # pure big-state passthrough: SROWS-row state block in and out
    scr[0, :] = state_in[0, :] * gp[0, :]
    for i in range(SROWS):
        out_row = state_in[i, :]
        if i == 0:
            out[0, :] = out_row


VARIANTS = {
    "front": (front_only, (M, CT)),
    "gardner_noeq": (gardner_noeq, (M, CT)),
    "gardner_eq": (gardner_eq, (M, CT)),
    "state_copy": (state_copy, (M, CT)),
}


def try_variant(name):
    fn, out_shape = VARIANTS[name]
    plane = pl.BlockSpec((M, CT), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, CT), lambda i: (0, i),
                       memory_space=pltpu.VMEM)
    grid_spec = pl.GridSpec(
        grid=(1,),
        in_specs=[plane, plane,
                  pl.BlockSpec((SROWS, CT), lambda i: (0, i),
                               memory_space=pltpu.VMEM), row],
        out_specs=pl.BlockSpec(out_shape, lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((M + K - 1, CT), jnp.float32)],
    )
    call = jax.jit(pl.pallas_call(
        fn, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        interpret=False,
    ))
    rng = np.random.default_rng(0)
    args = (rng.standard_normal((M, CT)).astype(np.float32),
            rng.standard_normal((M, CT)).astype(np.float32),
            rng.standard_normal((SROWS, CT)).astype(np.float32),
            np.ones((1, CT), np.float32))
    t0 = time.time()
    try:
        r = call(*args)
        jax.block_until_ready(r)
        print(f"{name}: OK ({time.time() - t0:.0f}s)", flush=True)
        return True
    except Exception as e:
        msg = str(e).splitlines()[0][:160]
        print(f"{name}: FAIL ({time.time() - t0:.0f}s) {msg}",
              flush=True)
        return False


if __name__ == "__main__":
    names = sys.argv[1:] or list(VARIANTS)
    for n in names:
        try_variant(n)
