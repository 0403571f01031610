#!/usr/bin/env python
"""Probe where the fused channelizer kernel's time goes on the real
chip (VERDICT r2 Weak #2: MFU 0.023, kernels not at roofline).

Times one grid program shape (block_out=8192, m_tile=2048, C=1024,
ct=128, K=64, audio K=64/D=8) in isolating variants:

  A baseline   — the shipped math: 4 channelize matmuls + trig rotator
                 + atan2 discriminator + banded audio matmul
  B rot-table  — rotator cos/sin streamed as precomputed HBM constants
                 (valid whenever snap_grid pins the per-block phase)
  C no-atan2   — B with the discriminator's atan2 replaced by a mul
                 (bounds atan2's share)
  D no-audio   — B with the banded audio matmul removed (bounds its share)
  E audio-vpu  — B with the audio FIR as 64 shifted mul-adds (VPU)
                 instead of the dense banded matmul (MXU)
  F bf16-mm    — B with channelize matmuls fed bf16 (f32 accum)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_kernel_probe.py
"""

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sigdigger_tpu.kernels.ops import atan2

M, MT, C, CT, K = 8192, 2048, 1024, 128, 64
KA, DA = 64, 8
M_TILES, C_TILES = M // MT, C // CT


def make_band():
    rng = np.random.default_rng(1)
    h = rng.standard_normal(KA).astype(np.float32) / KA
    bt = np.zeros((MT // DA, MT + KA - 1), np.float32)
    for i in range(MT // DA):
        for t in range(KA):
            bt[i, i * DA - t + KA - 1] = h[t]
    return bt


def kernel(xw_re, xw_im, h_re, h_im, theta, m_ramp, phi0, rot_cr, rot_ci,
           bt, fb_in, audio_ref, fb_out, scr_prev, scr_f,
           *, variant: str):
    mi = pl.program_id(1)
    xr = xw_re[:] + fb_in[0:1, :]
    xi = xw_im[:]
    if variant == "F":
        xr16, xi16 = xr.astype(jnp.bfloat16), xi.astype(jnp.bfloat16)
        hr16, hi16 = h_re[:].astype(jnp.bfloat16), h_im[:].astype(jnp.bfloat16)
        yr = jnp.dot(xr16, hr16, preferred_element_type=jnp.float32) \
            - jnp.dot(xi16, hi16, preferred_element_type=jnp.float32)
        yi = jnp.dot(xr16, hi16, preferred_element_type=jnp.float32) \
            + jnp.dot(xi16, hr16, preferred_element_type=jnp.float32)
    else:
        yr = jnp.dot(xr, h_re[:], preferred_element_type=jnp.float32) \
            - jnp.dot(xi, h_im[:], preferred_element_type=jnp.float32)
        yi = jnp.dot(xr, h_im[:], preferred_element_type=jnp.float32) \
            + jnp.dot(xi, h_re[:], preferred_element_type=jnp.float32)

    if variant == "A":
        ph = phi0[0:1, :] + m_ramp[:] * theta[:]
        cr = jnp.cos(ph)
        ci = -jnp.sin(ph)
    else:
        cr = rot_cr[:]
        ci = rot_ci[:]
    rr = yr * cr - yi * ci
    ri = yr * ci + yi * cr

    @pl.when(mi == 0)
    def _():
        scr_prev[0:1, :] = jnp.zeros((1, CT), jnp.float32)
        scr_prev[1:2, :] = jnp.zeros((1, CT), jnp.float32)
        scr_f[0:KA - 1, :] = jnp.zeros((KA - 1, CT), jnp.float32)

    pr = jnp.concatenate([scr_prev[0:1, :], rr[:-1, :]], axis=0)
    pi = jnp.concatenate([scr_prev[1:2, :], ri[:-1, :]], axis=0)
    dr = rr * pr + ri * pi
    di = ri * pr - rr * pi
    if variant == "C":
        f = di * dr          # stand-in: bounds atan2's cost
    else:
        f = atan2(di, dr) * jnp.float32(1.0 / np.pi)

    scr_f[KA - 1:KA - 1 + MT, :] = f
    if variant == "D":
        aud = f[0:MT // DA, :]
    elif variant == "E":
        bt0 = bt[0:1, 0:KA]  # the tap row (band values, reversed)
        acc = bt0[0, KA - 1] * scr_f[KA - 1:KA - 1 + MT:DA, :]
        for t in range(1, KA):
            acc = acc + bt0[0, KA - 1 - t] * \
                scr_f[KA - 1 - t:KA - 1 - t + MT:DA, :]
        aud = acc
    else:
        aud = jnp.dot(bt[:], scr_f[0:MT + KA - 1, :],
                      preferred_element_type=jnp.float32)
    audio_ref[:] = aud

    scr_prev[0:1, :] = rr[-1:, :]
    scr_prev[1:2, :] = ri[-1:, :]
    scr_f[0:KA - 1, :] = scr_f[MT:MT + KA - 1, :]
    fb_out[:] = aud[-1:, 0:K] * 1e-6


def build(variant: str):
    grid_spec = pl.GridSpec(
        grid=(C_TILES, M_TILES),
        in_specs=[
            pl.BlockSpec((MT, K), lambda ci, mi: (mi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((MT, K), lambda ci, mi, _mt=M_TILES: (_mt + mi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, CT), lambda ci, mi: (0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, CT), lambda ci, mi: (0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CT), lambda ci, mi: (0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((MT, 1), lambda ci, mi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, CT), lambda ci, mi: (mi, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((MT, CT), lambda ci, mi: (mi, ci),
                         memory_space=pltpu.VMEM),      # rot_cr
            pl.BlockSpec((MT, CT), lambda ci, mi: (mi, ci),
                         memory_space=pltpu.VMEM),      # rot_ci
            pl.BlockSpec((MT // DA, MT + KA - 1), lambda ci, mi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda ci, mi: (0, 0),
                         memory_space=pltpu.VMEM),      # fb_in
        ],
        out_specs=[
            pl.BlockSpec((MT // DA, CT), lambda ci, mi: (mi, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda ci, mi: (0, 0),
                         memory_space=pltpu.VMEM),      # fb_out
        ],
        scratch_shapes=[
            pltpu.VMEM((2, CT), jnp.float32),
            pltpu.VMEM((MT + KA - 1, CT), jnp.float32),
        ],
    )
    return jax.jit(pl.pallas_call(
        partial(kernel, variant=variant),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((M // DA, C), jnp.float32),
                   jax.ShapeDtypeStruct((1, K), jnp.float32)],
        interpret=False,
    ))


def main():
    assert jax.default_backend() in ("tpu", "axon")
    rng = np.random.default_rng(0)
    xw = jnp.asarray(rng.standard_normal((2 * M, K)).astype(np.float32))
    h_re = jnp.asarray(rng.standard_normal((K, C)).astype(np.float32))
    h_im = jnp.asarray(rng.standard_normal((K, C)).astype(np.float32))
    theta = jnp.asarray(rng.standard_normal((1, C)).astype(np.float32))
    m_ramp = jnp.asarray(np.arange(MT, dtype=np.float32)[:, None])
    phi0 = jnp.asarray(np.zeros((M_TILES * 8, C), np.float32))
    ph = (np.zeros((1, C)) + np.arange(M)[:, None]
          * rng.standard_normal((1, C))).astype(np.float32)
    rot_cr = jnp.asarray(np.cos(ph))
    rot_ci = jnp.asarray(-np.sin(ph))
    bt = jnp.asarray(make_band())

    for variant in ("A", "B", "C", "D", "F"):
        t0 = time.time()
        call = build(variant)
        fb = jnp.zeros((1, K), jnp.float32)
        out = call(xw, xw, h_re, h_im, theta, m_ramp, phi0,
                   rot_cr, rot_ci, bt, fb)
        jax.block_until_ready(out)
        compile_s = time.time() - t0
        iters = 30
        t0 = time.perf_counter()
        for _ in range(iters):
            out = call(xw, xw, h_re, h_im, theta, m_ramp, phi0,
                       rot_cr, rot_ci, bt, out[1])
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"variant {variant}: {dt * 1e3:.3f} ms/block "
              f"({M * 64 / dt / 1e6:.0f} Msps-eq, compile {compile_s:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
