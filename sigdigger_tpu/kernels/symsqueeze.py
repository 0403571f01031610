"""Pallas TPU kernel: symbol-rate squeeze of the recovery drain.

The RecoveryBank emits channel-rate [M, C] soft-symbol planes plus a
strobe plane marking symbol instants; the reference inspector's
SAMPLES stream is symbol-rate after clock recovery (reference
Suscan/Analyzer.cpp inspector sampler output — one sample per strobe).
Draining the full-rate planes at ~1024 open inspectors costs sps×
more D2H bytes than the symbols carry, so this kernel reduces the
planes ``group``× ON DEVICE before the drain:

    out_v[i]  = Σ_{r<R} strobe[i·R + r] · plane[i·R + r]
    out_st[i] = Σ_{r<R} strobe[i·R + r]            (0 or 1)

Group sums are banded matmuls with a block-diagonal 0/1 matrix, run in
chunks (the same chunked-band trick as the audio FIRs — gather/cumsum
don't exist on this toolchain; the MXU is nearly free).  The reduction
is EXACT when consecutive strobes are ≥ R samples apart, i.e. every
R-sample group holds at most one symbol — the engine enforces
sps ≥ group + 1 on every digital slot sharing the bucket
(Gardner strobe spacing jitters ±1 around sps).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@dataclass(frozen=True)
class SymbolSqueezeConfig:
    n_rows: int                  # M (channel-rate rows per block)
    n_channels: int              # C
    group: int                   # R (rows summed per output row)
    channel_tile: int = 128
    m_tile: int = 0              # rows per grid program (0 → auto)
    chunk: int = 0               # band chunk rows (0 → auto ≤ 256)

    def __post_init__(self):
        assert self.group >= 2
        assert self.n_rows % self.group == 0
        assert self.n_channels % self.channel_tile == 0
        if self.m_tile == 0:
            mt = min(self.n_rows, 2048)
            mt -= mt % self.group
            while mt >= self.group and self.n_rows % mt:
                mt -= self.group
            object.__setattr__(self, "m_tile", max(mt, self.group))
        assert self.n_rows % self.m_tile == 0
        assert self.m_tile % self.group == 0
        if self.chunk == 0:
            ck = min(self.m_tile, 256)
            ck -= ck % self.group
            while ck >= self.group and self.m_tile % ck:
                ck -= self.group
            object.__setattr__(self, "chunk", max(ck, self.group))
        assert self.m_tile % self.chunk == 0
        assert self.chunk % self.group == 0

    @property
    def out_rows(self) -> int:
        return self.n_rows // self.group


def _squeeze_kernel(sr, si, st, gm, out_r, out_i, out_s, *,
                    mt: int, ck: int, r: int):
    vs = st[:]
    vr = sr[:] * vs
    vi = si[:] * vs
    ok = ck // r
    for fi in range(mt // ck):
        sl = slice(fi * ck, (fi + 1) * ck)
        osl = slice(fi * ok, (fi + 1) * ok)
        out_r[osl, :] = jnp.dot(gm[:], vr[sl, :],
                                preferred_element_type=jnp.float32)
        out_i[osl, :] = jnp.dot(gm[:], vi[sl, :],
                                preferred_element_type=jnp.float32)
        out_s[osl, :] = jnp.dot(gm[:], vs[sl, :],
                                preferred_element_type=jnp.float32)


class SymbolSqueeze:
    """Device-side R× reduction of (soft_re, soft_im, strobe) planes."""

    def __init__(self, cfg: SymbolSqueezeConfig,
                 interpret: bool | None = None) -> None:
        self.cfg = cfg
        if interpret is None:
            interpret = jax.default_backend() not in ("tpu", "axon")
        self.interpret = interpret
        g = np.zeros((cfg.chunk // cfg.group, cfg.chunk), np.float32)
        for j in range(cfg.chunk):
            g[j // cfg.group, j] = 1.0
        self._g = jnp.asarray(g)
        self._call = self._build()

    def _build(self):
        cfg = self.cfg
        mt, ct, r = cfg.m_tile, cfg.channel_tile, cfg.group
        plane = pl.BlockSpec((mt, ct), lambda ci, mi: (mi, ci),
                             memory_space=pltpu.VMEM)
        out = pl.BlockSpec((mt // r, ct), lambda ci, mi: (mi, ci),
                           memory_space=pltpu.VMEM)
        grid_spec = pl.GridSpec(
            grid=(cfg.n_channels // ct, cfg.n_rows // mt),
            in_specs=[plane, plane, plane,
                      pl.BlockSpec((cfg.chunk // r, cfg.chunk),
                                   lambda ci, mi: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[out, out, out],
        )
        shape = jax.ShapeDtypeStruct(
            (cfg.out_rows, cfg.n_channels), jnp.float32)
        call = pl.pallas_call(
            partial(_squeeze_kernel, mt=mt, ck=cfg.chunk, r=r),
            grid_spec=grid_spec,
            out_shape=[shape, shape, shape],
            interpret=self.interpret,
        )
        return jax.jit(call)

    def dispatch(self, sr, si, st):
        """Device-resident (soft_re, soft_im, strobe) → squeezed
        device planes (same order, ``group``× fewer rows)."""
        return self._call(sr, si, st, self._g)
