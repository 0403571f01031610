#!/usr/bin/env python
"""Round 4: bisect from the REAL recovery kernel by monkeypatching
flag-guarded copies (exact same signature/grid) into RecoveryBank."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from sigdigger_tpu.kernels import recovery as R
from sigdigger_tpu.kernels.ops import atan2


def make_kernel(*, use_front=True, use_mf=True, use_gardner=True,
                use_eq=True, use_clip_rows=True, use_fsk=True,
                use_ask=True):
    def kern(y_re, y_im, state_in, w_psk, w_fsk, w_ask,
             w1, w2, w4, w8, alpha, beta, gp, gf, pmin, pmax,
             fsk_cos, fsk_sin, w_quad, w_coh, w_run,
             eq_en, eq_rate, mf,
             out_sym_re, out_sym_im, out_strobe, state_out,
             scr_re, scr_im,
             *, m: int, k: int, keq: int, dc_alpha: float):
        al = alpha[0, :]
        be = beta[0, :]
        wp = w_psk[0, :]
        wf = w_fsk[0, :]
        wa = w_ask[0, :]
        o1 = w1[0, :]
        o2 = w2[0, :]
        o4 = w4[0, :]
        o8 = w8[0, :]
        fc = fsk_cos[0, :]
        fs = fsk_sin[0, :]
        wq = w_quad[0, :]
        wc = w_coh[0, :]
        run = w_run[0, :]
        eqe = eq_en[0, :]
        eqr = eq_rate[0, :]
        adc = jnp.float32(dc_alpha)

        if use_front:
            def front_step(i, carry):
                lo_re, lo_im, freq, qpr, qpi, dc = carry
                xr = y_re[i, :]
                xi = y_im[i, :]
                rr = xr * lo_re + xi * lo_im
                ri = xi * lo_re - xr * lo_im
                mag = jnp.maximum(jnp.sqrt(rr * rr + ri * ri), 1e-12)
                ur = rr / mag
                ui = ri / mag
                u2r = ur * ur - ui * ui
                u2i = 2.0 * ur * ui
                u4r = u2r * u2r - u2i * u2i
                u4i = 2.0 * u2r * u2i
                u8i = 2.0 * u4r * u4i
                err = (o1 * ui + o2 * u2i * 0.5 + o4 * u4i * 0.25
                       + o8 * u8i * 0.125)
                freq = freq + be * err
                w = freq + al * err
                cw = jnp.cos(w)
                sw = jnp.sin(w)
                nr = lo_re * cw - lo_im * sw
                ni = lo_re * sw + lo_im * cw
                inv = jax.lax.rsqrt(nr * nr + ni * ni)
                if use_fsk:
                    dr = xr * qpr + xi * qpi
                    di = xi * qpr - xr * qpi
                    fq = atan2(di, dr)
                    xr2 = xr * fc - xi * fs
                    xi2 = xr * fs + xi * fc
                    fp = atan2(xi2, xr2)
                    fv = (wq * fq + (1.0 - wq) * fp) \
                        * jnp.float32(1.0 / np.pi)
                else:
                    fv = 0.0 * xr
                if use_ask:
                    avs = wc * rr + (1.0 - wc) * mag
                    dc = adc * dc + (1.0 - adc) * avs
                    av = avs - dc
                else:
                    av = 0.0 * xr
                scr_re[i + (k - 1), :] = wp * rr + wf * fv + wa * av
                scr_im[i + (k - 1), :] = wp * ri
                return nr * inv, ni * inv, freq, xr, xi, dc

            scr_re[0:k - 1, :] = state_in[16:16 + (k - 1), :]
            scr_im[0:k - 1, :] = \
                state_in[16 + (k - 1):16 + 2 * (k - 1), :]
            carry0 = tuple(state_in[i, :] for i in range(6))
            lo_re, lo_im, freq, qpr, qpi, dc = jax.lax.fori_loop(
                0, m, front_step, carry0)
            new_tail_re = scr_re[m:m + (k - 1), :]
            new_tail_im = scr_im[m:m + (k - 1), :]
        else:
            scr_re[0:m + k - 1, :] = jnp.zeros_like(
                scr_re[0:m + k - 1, :])
            scr_im[0:m + k - 1, :] = jnp.zeros_like(
                scr_im[0:m + k - 1, :])
            lo_re = state_in[0, :]
            lo_im = state_in[1, :]
            freq = state_in[2, :]
            qpr = state_in[3, :]
            qpi = state_in[4, :]
            dc = state_in[5, :]
            new_tail_re = scr_re[m:m + (k - 1), :]
            new_tail_im = scr_im[m:m + (k - 1), :]

        if use_mf:
            fr = mf[0:1, :] * scr_re[k - 1:k - 1 + m, :]
            fi = mf[0:1, :] * scr_im[k - 1:k - 1 + m, :]
            for t in range(1, k):
                fr = fr + mf[t:t + 1, :] \
                    * scr_re[k - 1 - t:k - 1 - t + m, :]
                fi = fi + mf[t:t + 1, :] \
                    * scr_im[k - 1 - t:k - 1 - t + m, :]
            scr_re[0:m, :] = fr
            scr_im[0:m, :] = fi

        if use_gardner:
            gpv = gp[0, :]
            gfv = gf[0, :]
            pmn = pmin[0, :]
            pmx = pmax[0, :]
            eq_base = 16 + 2 * (k - 1)

            def gardner_step(i, carry):
                (t, period, prev_re, prev_im, mid_re, mid_im, st_re,
                 st_im, want_mid, power) = carry[:10]
                eq = carry[10:]
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
                if use_clip_rows:
                    period = jnp.clip(period - gfv * err, pmn, pmx)
                else:
                    period = jnp.clip(period - gfv * err, 2.0, 100.0)
                t = t + jnp.where(event, period * 0.5 - gpv * err, 0.0)
                st_re = jnp.where(is_strobe, ir, st_re)
                st_im = jnp.where(is_strobe, ii, st_im)
                want_mid = jnp.where(event, 1.0 - want_mid, want_mid)
                if use_eq:
                    etr = list(eq[:keq])
                    eti = list(eq[keq:2 * keq])
                    ebr = list(eq[2 * keq:3 * keq])
                    ebi = list(eq[3 * keq:4 * keq])
                    push = jnp.where(is_strobe, 1.0, 0.0)
                    nbr = [push * ir + (1.0 - push) * ebr[0]]
                    nbi = [push * ii + (1.0 - push) * ebi[0]]
                    for j in range(1, keq):
                        nbr.append(push * ebr[j - 1]
                                   + (1.0 - push) * ebr[j])
                        nbi.append(push * ebi[j - 1]
                                   + (1.0 - push) * ebi[j])
                    yr = etr[0] * nbr[0] - eti[0] * nbi[0]
                    yi = etr[0] * nbi[0] + eti[0] * nbr[0]
                    for j in range(1, keq):
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
                    for j in range(keq):
                        pw = pw + nbr[j] * nbr[j] + nbi[j] * nbi[j]
                    g = push * eqr / pw
                    for j in range(keq):
                        etr[j] = etr[j] - g * (er * nbr[j]
                                               + ei * nbi[j])
                        eti[j] = eti[j] - g * (ei * nbr[j]
                                               - er * nbi[j])
                    outr = eqe * yr + (1.0 - eqe) * ir
                    outi = eqe * yi + (1.0 - eqe) * ii
                    new_eq = (tuple(etr) + tuple(eti) + tuple(nbr)
                              + tuple(nbi))
                else:
                    outr = ir
                    outi = ii
                    new_eq = eq
                emit = jnp.where(is_strobe, 1.0, 0.0) * run
                out_sym_re[i, :] = emit * outr
                out_sym_im[i, :] = emit * outi
                out_strobe[i, :] = emit
                return ((t, period, xr, xi, nm_re, nm_im, st_re, st_im,
                         want_mid, power) + new_eq)

            carry = tuple(state_in[i, :] for i in range(6, 16)) \
                + tuple(state_in[eq_base + i, :]
                        for i in range(4 * keq))
            carry = jax.lax.fori_loop(0, m, gardner_step, carry)
            for i in range(10):
                state_out[6 + i, :] = carry[i]
            for i in range(4 * keq):
                state_out[eq_base + i, :] = carry[10 + i]
        else:
            out_sym_re[0:m, :] = scr_re[0:m, :]
            out_sym_im[0:m, :] = scr_im[0:m, :]
            out_strobe[0:m, :] = scr_re[0:m, :]
            for i in range(10):
                state_out[6 + i, :] = state_in[6 + i, :]
            eq_base = 16 + 2 * (k - 1)
            for i in range(4 * keq):
                state_out[eq_base + i, :] = state_in[eq_base + i, :]

        state_out[0, :] = lo_re
        state_out[1, :] = lo_im
        state_out[2, :] = freq
        state_out[3, :] = qpr
        state_out[4, :] = qpi
        state_out[5, :] = dc
        state_out[16:16 + (k - 1), :] = new_tail_re
        state_out[16 + (k - 1):16 + 2 * (k - 1), :] = new_tail_im

    return kern


def run(name, **flags):
    R._recovery_kernel = make_kernel(**flags)
    cfg = R.RecoveryBankConfig(n_channels=128, block_len=256,
                               mf_taps_max=16, channel_tile=128)
    bank = R.RecoveryBank(cfg, interpret=False)
    bank.configure_channel(0, kind=R.KIND_PSK, sps=8.0, order=4)
    rng = np.random.default_rng(0)
    y = (rng.standard_normal((256, 128))
         + 1j * rng.standard_normal((256, 128))).astype(np.complex64)
    bank.feed(y)
    return True


VARIANTS = {
    "all_on": {},
    "no_mf": {"use_mf": False},
    "no_front": {"use_front": False},
    "no_gardner": {"use_gardner": False},
    "no_eq": {"use_eq": False},
    "no_cliprows": {"use_clip_rows": False},
    "no_fsk": {"use_fsk": False},
    "no_ask": {"use_ask": False},
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(VARIANTS)
    for n in names:
        t0 = time.time()
        try:
            run(n, **VARIANTS[n])
            print(f"{n}: OK ({time.time() - t0:.0f}s)", flush=True)
        except Exception as e:
            msg = str(e).splitlines()[0][:120]
            print(f"{n}: FAIL ({time.time() - t0:.0f}s) {msg}",
                  flush=True)


def run_real():
    import importlib
    importlib.reload(R)
    cfg = R.RecoveryBankConfig(n_channels=128, block_len=256,
                               mf_taps_max=16, channel_tile=128)
    bank = R.RecoveryBank(cfg, interpret=False)
    bank.configure_channel(0, kind=R.KIND_PSK, sps=8.0, order=4)
    rng = np.random.default_rng(0)
    y = (rng.standard_normal((256, 128))
         + 1j * rng.standard_normal((256, 128))).astype(np.complex64)
    s, st = bank.feed(y)
    assert np.all(np.isfinite(s))
    return True


VARIANTS["real_fixed"] = run_real
