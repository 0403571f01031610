"""Pallas TPU kernel: TV line resampling as banded matmuls.

TPU-native compute path for the analog TV processor (r4 VERDICT
Missing #3; reference Default/GenericInspector/TVProcessorWorker.h:
36-76 drives `su_tv_processor_t` per sample).  The host keeps the
structure work it is good at — sync-run extraction, the period
flywheel, line-start interpolation (dsp/tv.py) — and ships each
block's lines as a framed [L, W] matrix; the per-line resample to
``pixels_per_line`` runs on the MXU:

    out[l, p] = L_l(u_p + frac_l),   u_p = p·step

with L_l the linear interpolant of line l's window.  Linearized in
the per-line fractional offset (exact at the endpoints):

    out = X @ W0 + frac ⊙ (X @ W1)

where W0[k, p] holds the two-tap interpolation weights of u_p and
W1 = (weights of u_p + 1) − W0.  Two [lt, W]×[W, px] matmuls + one
fused multiply-add per tile — no gather (unavailable on this
toolchain), and TRUE linear interpolation where the host gather
truncates (a small fidelity upgrade, not a regression).

W0/W1 depend only on (step, W, px): the host rebuilds them when the
flywheel period moves ≥0.1% — in lock, never.
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
class LineResamplerConfig:
    width: int                   # W: window samples per line (mult 128)
    pixels: int                  # px: output pixels (mult 128)
    l_cap: int = 256             # lines per dispatch (padded)
    l_tile: int = 64

    def __post_init__(self):
        assert self.width % 128 == 0
        assert self.pixels % 128 == 0
        assert self.l_cap % self.l_tile == 0


def _tv_kernel(x, w0, w1, frac, out_ref):
    a = jnp.dot(x[:], w0[:], preferred_element_type=jnp.float32)
    b = jnp.dot(x[:], w1[:], preferred_element_type=jnp.float32)
    out_ref[:] = a + frac[:] * b


class LineResampler:
    """Batched per-line fractional resampler on the MXU."""

    def __init__(self, cfg: LineResamplerConfig,
                 interpret: bool | None = None) -> None:
        self.cfg = cfg
        if interpret is None:
            interpret = jax.default_backend() not in ("tpu", "axon")
        self.interpret = interpret
        self._step = None
        self._w0 = self._w1 = None
        self._call = self._build()

    def _build(self):
        cfg = self.cfg
        lt, w, px = cfg.l_tile, cfg.width, cfg.pixels
        grid_spec = pl.GridSpec(
            grid=(cfg.l_cap // lt,),
            in_specs=[
                pl.BlockSpec((lt, w), lambda li: (li, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((w, px), lambda li: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((w, px), lambda li: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((lt, 1), lambda li: (li, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((lt, px), lambda li: (li, 0),
                                   memory_space=pltpu.VMEM),
        )
        call = pl.pallas_call(
            partial(_tv_kernel),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((cfg.l_cap, cfg.pixels),
                                           jnp.float32),
            interpret=self.interpret,
        )
        return jax.jit(call)

    def set_step(self, step: float) -> None:
        """(Re)build the interpolation matrices for a pixel step (in
        samples); no-op within 0.1% of the current step."""
        if self._step is not None and \
                abs(step - self._step) < 1e-3 * self._step:
            return
        cfg = self.cfg
        self._step = float(step)
        w0 = np.zeros((cfg.width, cfg.pixels), np.float32)
        wn = np.zeros((cfg.width, cfg.pixels), np.float32)
        for p in range(cfg.pixels):
            u = p * step
            k = int(np.floor(u))
            g = u - k
            if k + 2 < cfg.width:
                w0[k, p] += 1.0 - g
                w0[k + 1, p] += g
                wn[k + 1, p] += 1.0 - g
                wn[k + 2, p] += g
        self._w0 = jnp.asarray(w0)
        self._w1 = jnp.asarray(wn - w0)

    def resample(self, x: np.ndarray, frac: np.ndarray) -> np.ndarray:
        """``x`` [L, W] framed line windows, ``frac`` [L] per-line
        fractional start offsets (L ≤ l_cap; padded here) →
        [L, pixels] float32."""
        assert self._w0 is not None, "set_step first"
        cfg = self.cfg
        n = len(x)
        assert n <= cfg.l_cap
        xb = np.zeros((cfg.l_cap, cfg.width), np.float32)
        xb[:n] = x
        fb = np.zeros((cfg.l_cap, 1), np.float32)
        fb[:n, 0] = frac
        out = np.asarray(self._call(xb, self._w0, self._w1, fb))
        return out[:n]
