#!/usr/bin/env python
"""Round 3: (a) does the hardware-proven kernels/psk.py still compile?
(b) feature-strip the real recovery kernel to find the layout-check
trigger."""

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


def psk_baseline():
    from sigdigger_tpu.kernels.psk import PskKernel, PskKernelConfig

    cfg = PskKernelConfig(n_channels=128, block_len=256, sps=8.0,
                          order=4)
    k = PskKernel(cfg, interpret=False)
    rng = np.random.default_rng(0)
    y = (rng.standard_normal((256, 128))
         + 1j * rng.standard_normal((256, 128))).astype(np.complex64)
    k.feed(y)
    return True


def make_recovery_variant(*, fsk: bool, blend: bool, eq: bool,
                          two_loops: bool, strobe_out: bool):
    """A configurable copy of the real recovery kernel."""

    def kern(y_re, y_im, state_in, w_psk, alpha, gp,
             out_sym_re, out_sym_im, out_strobe, state_out,
             scr_re, scr_im):
        al = alpha[0, :]
        wp = w_psk[0, :]

        def front_step(i, carry):
            lo_re, lo_im, freq, qpr, qpi, dc = carry
            xr = y_re[i, :]
            xi = y_im[i, :]
            rr = xr * lo_re + xi * lo_im
            ri = xi * lo_re - xr * lo_im
            mag = jnp.maximum(jnp.sqrt(rr * rr + ri * ri), 1e-12)
            ur = rr / mag
            ui = ri / mag
            if blend:
                u2r = ur * ur - ui * ui
                u2i = 2.0 * ur * ui
                u4r = u2r * u2r - u2i * u2i
                u4i = 2.0 * u2r * u2i
                u8i = 2.0 * u4r * u4i
                err = (ui + u2i * 0.5 + u4i * 0.25 + u8i * 0.125) * al
            else:
                err = al * ui
            freq = freq + err
            w = freq + al * err
            cw = jnp.cos(w)
            sw = jnp.sin(w)
            nr = lo_re * cw - lo_im * sw
            ni = lo_re * sw + lo_im * cw
            inv = jax.lax.rsqrt(nr * nr + ni * ni)
            if fsk:
                dr = xr * qpr + xi * qpi
                di = xi * qpr - xr * qpi
                fq = atan2(di, dr)
                xr2 = xr * al - xi * al
                xi2 = xr * al + xi * al
                fp = atan2(xi2, xr2)
                fv = (wp * fq + (1.0 - wp) * fp) * jnp.float32(1 / np.pi)
            else:
                fv = 0.0 * xr
            dc = 0.9995 * dc + 0.0005 * mag
            av = mag - dc
            scr_re[i + (K - 1), :] = wp * rr + fv + (1 - wp) * av
            scr_im[i + (K - 1), :] = wp * ri
            return nr * inv, ni * inv, freq, xr, xi, dc

        scr_re[0:K - 1, :] = state_in[16:16 + (K - 1), :]
        scr_im[0:K - 1, :] = state_in[16 + (K - 1):16 + 2 * (K - 1), :]
        carry0 = tuple(state_in[i, :] for i in range(6))
        lo_re, lo_im, freq, qpr, qpi, dc = jax.lax.fori_loop(
            0, M, front_step, carry0)
        new_tail_re = scr_re[M:M + (K - 1), :]
        new_tail_im = scr_im[M:M + (K - 1), :]

        # MF
        fr = w_psk[0:1, :] * scr_re[K - 1:K - 1 + M, :]
        fi = w_psk[0:1, :] * scr_im[K - 1:K - 1 + M, :]
        for t in range(1, K):
            fr = fr + w_psk[0:1, :] * scr_re[K - 1 - t:K - 1 - t + M, :]
            fi = fi + w_psk[0:1, :] * scr_im[K - 1 - t:K - 1 - t + M, :]
        scr_re[0:M, :] = fr
        scr_im[0:M, :] = fi

        if two_loops:
            gpv = gp[0, :]
            eq_base = 16 + 2 * (K - 1)

            def gstep(i, carry):
                (t, period, prev_re, prev_im, mid_re, mid_im, st_re,
                 st_im, want_mid, power) = carry[:10]
                eqs = carry[10:]
                xr = scr_re[i, :]
                xi = scr_im[i, :]
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
                err = jnp.where(is_strobe, err, 0.0) \
                    / jnp.maximum(power, 1e-9)
                err = jnp.clip(err, -2.0, 2.0)
                period = jnp.clip(period - gpv * err, 2.0, 100.0)
                t = t + jnp.where(event, period * 0.5 - gpv * err, 0.0)
                st_re = jnp.where(is_strobe, ir, st_re)
                st_im = jnp.where(is_strobe, ii, st_im)
                want_mid = jnp.where(event, 1.0 - want_mid, want_mid)
                if eq:
                    etr = list(eqs[:KEQ])
                    eti = list(eqs[KEQ:2 * KEQ])
                    ebr = list(eqs[2 * KEQ:3 * KEQ])
                    ebi = list(eqs[3 * KEQ:4 * KEQ])
                    push = jnp.where(is_strobe, 1.0, 0.0)
                    nbr = [push * ir + (1.0 - push) * ebr[0]]
                    nbi = [push * ii + (1.0 - push) * ebi[0]]
                    for j in range(1, KEQ):
                        nbr.append(push * ebr[j - 1]
                                   + (1.0 - push) * ebr[j])
                        nbi.append(push * ebi[j - 1]
                                   + (1.0 - push) * ebi[j])
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
                    outr = yr
                    outi = yi
                    new_eq = (tuple(etr) + tuple(eti) + tuple(nbr)
                              + tuple(nbi))
                else:
                    outr = ir
                    outi = ii
                    new_eq = eqs
                emit = jnp.where(is_strobe, 1.0, 0.0)
                out_sym_re[i, :] = emit * outr
                out_sym_im[i, :] = emit * outi
                if strobe_out:
                    out_strobe[i, :] = emit
                return ((t, period, xr, xi, nm_re, nm_im, st_re, st_im,
                         want_mid, power) + new_eq)

            carry = tuple(state_in[i, :] for i in range(6, 16)) \
                + tuple(state_in[eq_base + i, :] for i in range(4 * KEQ))
            carry = jax.lax.fori_loop(0, M, gstep, carry)
            for i in range(10):
                state_out[6 + i, :] = carry[i]
            for i in range(4 * KEQ):
                state_out[eq_base + i, :] = carry[10 + i]
        else:
            out_sym_re[0:M, :] = scr_re[0:M, :]
            out_sym_im[0:M, :] = scr_im[0:M, :]
            if strobe_out:
                out_strobe[0:M, :] = scr_re[0:M, :]

        state_out[0, :] = lo_re
        state_out[1, :] = lo_im
        state_out[2, :] = freq
        state_out[3, :] = qpr
        state_out[4, :] = qpi
        state_out[5, :] = dc
        state_out[16:16 + (K - 1), :] = new_tail_re
        state_out[16 + (K - 1):16 + 2 * (K - 1), :] = new_tail_im
        if not two_loops:
            for i in range(10):
                state_out[6 + i, :] = state_in[6 + i, :]
            for i in range(4 * KEQ):
                state_out[16 + 2 * (K - 1) + i, :] = \
                    state_in[16 + 2 * (K - 1) + i, :]

    return kern


def run_variant(name, **flags):
    kern = make_recovery_variant(**flags)
    plane = pl.BlockSpec((M, CT), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, CT), lambda i: (0, i),
                       memory_space=pltpu.VMEM)
    srows = pl.BlockSpec((SROWS, CT), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    call = jax.jit(pl.pallas_call(
        kern,
        grid_spec=pl.GridSpec(
            grid=(1,),
            in_specs=[plane, plane, srows, row, row, row],
            out_specs=[plane, plane, plane, srows],
            scratch_shapes=[
                pltpu.VMEM((M + K - 1, CT), jnp.float32),
                pltpu.VMEM((M + K - 1, CT), jnp.float32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((M, CT), jnp.float32),
            jax.ShapeDtypeStruct((M, CT), jnp.float32),
            jax.ShapeDtypeStruct((M, CT), jnp.float32),
            jax.ShapeDtypeStruct((SROWS, CT), jnp.float32),
        ],
        interpret=False,
    ))
    rng = np.random.default_rng(0)
    args = (rng.standard_normal((M, CT)).astype(np.float32),
            rng.standard_normal((M, CT)).astype(np.float32),
            rng.standard_normal((SROWS, CT)).astype(np.float32),
            np.ones((1, CT), np.float32),
            np.full((1, CT), 0.01, np.float32),
            np.full((1, CT), 0.05, np.float32))
    r = call(*args)
    jax.block_until_ready(r)
    return True


VARIANTS = {
    "psk_baseline": psk_baseline,
    "full_copy": lambda: run_variant("full", fsk=True, blend=True,
                                     eq=True, two_loops=True,
                                     strobe_out=True),
    "no_fsk": lambda: run_variant("no_fsk", fsk=False, blend=True,
                                  eq=True, two_loops=True,
                                  strobe_out=True),
    "no_eq": lambda: run_variant("no_eq", fsk=True, blend=True,
                                 eq=False, two_loops=True,
                                 strobe_out=True),
    "one_loop": lambda: run_variant("one_loop", fsk=True, blend=True,
                                    eq=True, two_loops=False,
                                    strobe_out=True),
    "no_blend": lambda: run_variant("no_blend", fsk=True, blend=False,
                                    eq=True, two_loops=True,
                                    strobe_out=True),
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(VARIANTS)
    for n in names:
        t0 = time.time()
        try:
            VARIANTS[n]()
            print(f"{n}: OK ({time.time() - t0:.0f}s)", flush=True)
        except Exception as e:
            msg = str(e).splitlines()[0][:120]
            print(f"{n}: FAIL ({time.time() - t0:.0f}s) {msg}",
                  flush=True)
