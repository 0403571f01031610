#!/usr/bin/env python
"""Probe the axon Pallas toolchain for the dtypes the transfer-
discipline work needs: int16 loads + convert, bf16 matmul inputs,
bf16 stores.  Each probe validates numerics against f32."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, C = 256, 64, 128


def _call(kern, in_shapes, out_shape, out_dtype=jnp.float32):
    specs = [pl.BlockSpec(s, lambda i: (0, 0), memory_space=pltpu.VMEM)
             for s in in_shapes]
    return jax.jit(pl.pallas_call(
        kern,
        grid_spec=pl.GridSpec(
            grid=(1,),
            in_specs=specs,
            out_specs=pl.BlockSpec(out_shape, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct(out_shape, out_dtype),
        interpret=False,
    ))


def probe_i16_load():
    def kern(x_ref, o_ref):
        o_ref[:] = x_ref[:].astype(jnp.float32) * (1.0 / 32767.0)

    rng = np.random.default_rng(0)
    x = rng.integers(-32768, 32767, (M, K)).astype(np.int16)
    y = _call(kern, [(M, K)], (M, K))(x)
    ref = x.astype(np.float32) / 32767.0
    err = np.abs(np.asarray(y) - ref).max()
    assert err < 1e-6, err
    return f"max err {err:.2e}"


def probe_bf16_load():
    def kern(x_ref, o_ref):
        o_ref[:] = x_ref[:].astype(jnp.float32)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((M, K)).astype(jnp.bfloat16)
    y = _call(kern, [(M, K)], (M, K))(x)
    err = np.abs(np.asarray(y) - np.asarray(x, np.float32)).max()
    assert err < 1e-6, err
    return f"max err {err:.2e}"


def probe_bf16_matmul():
    def kern(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                           preferred_element_type=jnp.float32)

    rng = np.random.default_rng(0)
    a = rng.standard_normal((M, K)).astype(np.float32)
    b = rng.standard_normal((K, C)).astype(np.float32)
    y = _call(kern, [(M, K), (K, C)], (M, C))(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16))
    ref = a @ b
    rel = np.abs(np.asarray(y) - ref).max() / np.abs(ref).max()
    assert rel < 0.02, rel
    return f"rel err {rel:.2e}"


def probe_bf16_store():
    def kern(x_ref, o_ref):
        o_ref[:] = (x_ref[:] * 2.0).astype(jnp.bfloat16)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((M, K)).astype(np.float32)
    y = _call(kern, [(M, K)], (M, K), jnp.bfloat16)(x)
    rel = np.abs(np.asarray(y, np.float32) - 2 * x).max()
    assert rel < 0.05, rel
    return f"abs err {rel:.2e}"


def probe_i16_mixed_with_f32():
    """The real pattern: int16 plane + f32 taps in one kernel."""
    def kern(x_ref, h_ref, o_ref):
        xf = x_ref[:].astype(jnp.float32) * (1.0 / 32767.0)
        o_ref[:] = jnp.dot(xf, h_ref[:],
                           preferred_element_type=jnp.float32)

    rng = np.random.default_rng(0)
    x = rng.integers(-32768, 32767, (M, K)).astype(np.int16)
    h = rng.standard_normal((K, C)).astype(np.float32)
    y = _call(kern, [(M, K), (K, C)], (M, C))(x, h)
    ref = (x.astype(np.float32) / 32767.0) @ h
    rel = np.abs(np.asarray(y) - ref).max() / np.abs(ref).max()
    assert rel < 1e-4, rel
    return f"rel err {rel:.2e}"


PROBES = {
    "i16_load": probe_i16_load,
    "bf16_load": probe_bf16_load,
    "bf16_matmul": probe_bf16_matmul,
    "bf16_store": probe_bf16_store,
    "i16_mixed": probe_i16_mixed_with_f32,
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(PROBES)
    for n in names:
        t0 = time.time()
        try:
            info = PROBES[n]()
            print(f"{n}: OK ({time.time() - t0:.0f}s) {info}",
                  flush=True)
        except Exception as e:
            msg = str(e).splitlines()[0][:120]
            print(f"{n}: FAIL ({time.time() - t0:.0f}s) {msg}",
                  flush=True)


def probe_input_row_slices():
    """mf[t:t+1, :] static row slices at nonzero offsets of an input
    ref (the recovery bank's per-channel MF) — suspected layout-check
    trigger."""
    def kern(x_ref, mf_ref, o_ref):
        acc = mf_ref[0:1, :] * x_ref[0:M, :]
        for t in range(1, 8):
            acc = acc + mf_ref[t:t + 1, :] * x_ref[0:M, :]
        o_ref[:] = acc

    rng = np.random.default_rng(0)
    x = rng.standard_normal((M, C)).astype(np.float32)
    mf = rng.standard_normal((8, C)).astype(np.float32)
    y = _call(kern, [(M, C), (8, C)], (M, C))(x, mf)
    ref = mf.sum(axis=0)[None, :] * x
    err = np.abs(np.asarray(y) - ref).max()
    assert err < 1e-4, err
    return f"max err {err:.2e}"


PROBES["input_row_slices"] = probe_input_row_slices
