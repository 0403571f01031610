"""Where does the fused channelizer's time go, and what wins it back?

r4 VERDICT item 2: executed efficiency is ~22% of the f32 ceiling.
This probe times ablated/restructured variants of the fused
channelize+rotate+discriminate+FIR kernel ON THE REAL CHIP to find the
actual cost split before committing a redesign:

  full        current structure (4 narrow matmuls + trig rotation +
              atan2 + banded FIR)
  norot       rotation skipped            → cost of cos/sin
  noatan      discriminator linearized    → cost of atan2
  matonly     channelize matmuls only     → MXU share
  wide2       channelize as 2 [mt,K]x[K,2ct] matmuls (wider N)
  concat1     channelize as ONE [mt,2K]x[2K,2ct] matmul
              (128-deep contraction — full MXU depth)
  tabrot      rotation from precomputed Q/R phase tables
              (rank-structure: e^{-jmθ} = Q[m/64]·R[m%64], no
              in-kernel transcendentals)

Each variant chains 30 device-resident dispatches at block_out=32768
(dispatch floor amortized); median of 3 runs.  Output committed as
scripts/tpu_kernel_probe.out.
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sigdigger_tpu.utils.compile_cache import enable  # noqa: E402

enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from sigdigger_tpu.kernels.ops import atan2  # noqa: E402

MT, K, CT, C = 2048, 64, 128, 1024
M_TILES = 16                     # block_out = 32768
BLOCK_OUT = MT * M_TILES
DA, KA, FT = 8, 64, 256
R_ROWS = 64                      # rotation table split: m = 64q + r


def _kernel(xw_re, xw_im, h_re, h_im, h2, theta, m_ramp, phi0,
            q_re, q_im, r_re, r_im, bt, carry_in, out_ref, carry_ref,
            scr_f, *, variant: str):
    mi = pl.program_id(1)
    xr = xw_re[:]
    xi = xw_im[:]
    # ---- channelize ----
    if variant == "concat1":
        xc = jnp.concatenate([xr, xi], axis=1)          # [mt, 2K]
        y2 = jnp.dot(xc, h2[:], preferred_element_type=jnp.float32)
        yr = y2[:, :CT]
        yi = y2[:, CT:]
    elif variant == "wide2":
        y2 = jnp.dot(xr, h2[0:K, :],
                     preferred_element_type=jnp.float32) \
            + jnp.dot(xi, h2[K:2 * K, :],
                      preferred_element_type=jnp.float32)
        yr = y2[:, :CT]
        yi = y2[:, CT:]
    else:
        yr = jnp.dot(xr, h_re[:], preferred_element_type=jnp.float32) \
            - jnp.dot(xi, h_im[:], preferred_element_type=jnp.float32)
        yi = jnp.dot(xr, h_im[:], preferred_element_type=jnp.float32) \
            + jnp.dot(xi, h_re[:], preferred_element_type=jnp.float32)
    if variant == "matonly":
        rr, ri = yr, yi
    elif variant in ("norot",):
        rr, ri = yr, yi
    elif variant == "tabrot":
        # rot[m] = Q[m // 64] * R[m % 64]  (complex), tables in VMEM:
        # Q rows broadcast 64x, R rows tiled mt/64 x — no trig
        qs = MT // R_ROWS
        cr_q = jnp.concatenate(
            [jnp.broadcast_to(q_re[i:i + 1, :], (R_ROWS, CT))
             for i in range(qs)], axis=0)
        ci_q = jnp.concatenate(
            [jnp.broadcast_to(q_im[i:i + 1, :], (R_ROWS, CT))
             for i in range(qs)], axis=0)
        cr_r = jnp.concatenate([r_re[:]] * qs, axis=0)
        ci_r = jnp.concatenate([r_im[:]] * qs, axis=0)
        cr = cr_q * cr_r - ci_q * ci_r
        ci = cr_q * ci_r + ci_q * cr_r
        rr = yr * cr - yi * ci
        ri = yr * ci + yi * cr
    else:
        ph = phi0[0:1, :] + m_ramp[:] * theta[:]
        cr = jnp.cos(ph)
        ci = -jnp.sin(ph)
        rr = yr * cr - yi * ci
        ri = yr * ci + yi * cr
    if variant == "matonly":
        f = rr
    elif variant == "noatan":
        pr = jnp.concatenate([rr[-1:, :], rr[:-1, :]], axis=0)
        pi = jnp.concatenate([ri[-1:, :], ri[:-1, :]], axis=0)
        f = rr * pr + ri * pi          # linear stand-in
    else:
        pr = jnp.concatenate([rr[-1:, :], rr[:-1, :]], axis=0)
        pi = jnp.concatenate([ri[-1:, :], ri[:-1, :]], axis=0)
        dr = rr * pr + ri * pi
        di = ri * pr - rr * pi
        f = atan2(di, dr) * jnp.float32(1.0 / np.pi)
    # the carry makes every chained execution unique (the remote
    # runtime dedupes identical (executable, inputs) executions, which
    # faked a first version of this probe ~7x past the f32 ceiling)
    scr_f[KA - 1:KA - 1 + MT, :] = f + carry_in[0:1, :]
    fta = FT // DA
    for fi in range(MT // FT):
        chunk = jnp.dot(bt[:], scr_f[fi * FT:fi * FT + FT + KA - 1, :],
                        preferred_element_type=jnp.float32)
        out_ref[fi * fta:(fi + 1) * fta, :] = chunk
    scr_f[0:KA - 1, :] = scr_f[MT:MT + KA - 1, :]
    @pl.when(mi == M_TILES - 1)
    def _():
        carry_ref[:] = carry_in[:] * 0.9999 + out_ref[0:8, :] * 1e-6


def build(variant: str):
    grid_spec = pl.GridSpec(
        grid=(C // CT, M_TILES),
        in_specs=[
            pl.BlockSpec((MT, K), lambda ci, mi: (mi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((MT, K),
                         lambda ci, mi, _m=M_TILES: (_m + mi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, CT), lambda ci, mi: (0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, CT), lambda ci, mi: (0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * K, 2 * CT), lambda ci, mi: (0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CT), lambda ci, mi: (0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((MT, 1), lambda ci, mi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, CT), lambda ci, mi: (mi, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((MT // R_ROWS, CT),
                         lambda ci, mi: (mi, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((MT // R_ROWS, CT),
                         lambda ci, mi: (mi, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_ROWS, CT), lambda ci, mi: (0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_ROWS, CT), lambda ci, mi: (0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FT // DA, FT + KA - 1),
                         lambda ci, mi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, CT), lambda ci, mi: (0, ci),
                         memory_space=pltpu.VMEM),      # carry_in
        ],
        out_specs=[
            pl.BlockSpec((MT // DA, CT), lambda ci, mi: (mi, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, CT), lambda ci, mi: (0, ci),
                         memory_space=pltpu.VMEM),      # carry_out
        ],
        scratch_shapes=[pltpu.VMEM((MT + KA - 1, CT), jnp.float32)],
    )
    call = pl.pallas_call(
        partial(_kernel, variant=variant),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((BLOCK_OUT // DA, C), jnp.float32),
            jax.ShapeDtypeStruct((8, C), jnp.float32),
        ],
        interpret=False,
    )
    return jax.jit(call)


def main():
    rng = np.random.default_rng(0)
    consts = dict(
        h_re=jnp.asarray(rng.standard_normal((K, C)).astype(np.float32)),
        h_im=jnp.asarray(rng.standard_normal((K, C)).astype(np.float32)),
        h2=jnp.asarray(rng.standard_normal(
            (2 * K, 2 * C)).astype(np.float32)),
        theta=jnp.asarray(rng.standard_normal((1, C)).astype(np.float32)),
        m_ramp=jnp.asarray(np.arange(MT, dtype=np.float32)[:, None]),
        phi0=jnp.asarray(np.zeros((M_TILES * 8, C), np.float32)),
        q_re=jnp.asarray(rng.standard_normal(
            (MT // R_ROWS * M_TILES, C)).astype(np.float32)),
        q_im=jnp.asarray(rng.standard_normal(
            (MT // R_ROWS * M_TILES, C)).astype(np.float32)),
        r_re=jnp.asarray(rng.standard_normal(
            (R_ROWS, C)).astype(np.float32)),
        r_im=jnp.asarray(rng.standard_normal(
            (R_ROWS, C)).astype(np.float32)),
        bt=jnp.asarray(rng.standard_normal(
            (FT // DA, FT + KA - 1)).astype(np.float32)),
    )
    n_bufs, iters = 8, 100
    xws = [jnp.asarray(rng.standard_normal(
        (2 * BLOCK_OUT, K)).astype(np.float32)) for _ in range(n_bufs)]
    args = [consts[k] for k in
            ("h_re", "h_im", "h2", "theta", "m_ramp", "phi0",
             "q_re", "q_im", "r_re", "r_im", "bt")]
    carry0 = jnp.asarray(
        rng.standard_normal((8, C)).astype(np.float32))
    results = {}
    for variant in ("full", "norot", "noatan", "matonly", "wide2",
                    "concat1", "tabrot"):
        try:
            call = build(variant)
            out, carry = call(xws[0], xws[0], *args, carry0)
            jax.block_until_ready((out, carry))
            meds, meds_nf = [], []
            for _ in range(3):
                # block_until_ready through the tunnel does not prove
                # completion (submission-only); fetching the chained
                # carry VALUE does — D2H can only follow real compute.
                t0 = time.perf_counter()
                outs = []
                for i in range(iters):
                    out, carry = call(xws[i % n_bufs], xws[i % n_bufs],
                                      *args, carry)
                    outs.append(out)
                jax.block_until_ready((outs, carry))
                meds_nf.append((time.perf_counter() - t0) / iters)
                t0 = time.perf_counter()
                for i in range(iters):
                    out, carry = call(xws[i % n_bufs], xws[i % n_bufs],
                                      *args, carry)
                    outs.append(out)
                np.asarray(carry)          # force completion (1 RTT)
                meds.append((time.perf_counter() - t0) / iters)
            ms = min(meds) * 1e3
            print(f"  (no-fetch timing: {min(meds_nf)*1e3:.3f} ms)",
                  flush=True)
            results[variant] = round(ms, 3)
            print(f"{variant:8s} {ms:7.3f} ms/block "
                  f"({BLOCK_OUT * 64 / min(meds) / 1e9:6.2f} Gsps)",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — record and continue
            results[variant] = f"FAILED: {e}"[:200]
            print(f"{variant:8s} FAILED: {e}", flush=True)
    print(json.dumps({"block_out": BLOCK_OUT, "ms": results}))


if __name__ == "__main__":
    main()
