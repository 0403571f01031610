#!/usr/bin/env python
"""Round 2: the real RecoveryBank at varying shapes, plus an isolated
MF-pass kernel, to find what trips Mosaic's layout check."""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def real_bank(block_len, k=64):
    from sigdigger_tpu.kernels.recovery import (
        KIND_PSK,
        RecoveryBank,
        RecoveryBankConfig,
    )

    cfg = RecoveryBankConfig(n_channels=128, block_len=block_len,
                             mf_taps_max=k, channel_tile=128)
    bank = RecoveryBank(cfg, interpret=False)
    bank.configure_channel(0, kind=KIND_PSK, sps=8.0, order=4)
    rng = np.random.default_rng(0)
    y = (rng.standard_normal((block_len, 128))
         + 1j * rng.standard_normal((block_len, 128))).astype(np.complex64)
    s, st = bank.feed(y)
    assert np.all(np.isfinite(s))
    return True


def mf_pass(m, k):
    def kern(x, mf, out, scr):
        scr[0:k - 1, :] = x[0:k - 1, :]
        scr[k - 1:k - 1 + m, :] = x[0:m, :]
        fr = mf[0:1, :] * scr[k - 1:k - 1 + m, :]
        for t in range(1, k):
            fr = fr + mf[t:t + 1, :] * scr[k - 1 - t:k - 1 - t + m, :]
        out[:] = fr

    ct = 128
    call = jax.jit(pl.pallas_call(
        kern,
        grid_spec=pl.GridSpec(
            grid=(1,),
            in_specs=[
                pl.BlockSpec((m, ct), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, ct), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m, ct), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((m + k - 1, ct), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((m, ct), jnp.float32),
        interpret=False,
    ))
    rng = np.random.default_rng(0)
    r = call(rng.standard_normal((m, ct)).astype(np.float32),
             rng.standard_normal((k, ct)).astype(np.float32))
    jax.block_until_ready(r)
    return True


VARIANTS = {
    "real_m256_k16": lambda: real_bank(256, 16),
    "real_m256_k64": lambda: real_bank(256, 64),
    "real_m2048_k16": lambda: real_bank(2048, 16),
    "real_m8192_k16": lambda: real_bank(8192, 16),
    "real_m8192_k64": lambda: real_bank(8192, 64),
    "mf_m8192_k64": lambda: mf_pass(8192, 64),
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(VARIANTS)
    for n in names:
        t0 = time.time()
        try:
            VARIANTS[n]()
            print(f"{n}: OK ({time.time() - t0:.0f}s)", flush=True)
        except Exception as e:
            msg = str(e).splitlines()[0][:140]
            print(f"{n}: FAIL ({time.time() - t0:.0f}s) {msg}",
                  flush=True)
