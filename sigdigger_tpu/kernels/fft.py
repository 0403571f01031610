"""Pallas TPU spectral kernel: Bailey four-step FFT → PSD.

The spectrum path's FFT (reference engine's per-interval windowed FFT,
SURVEY.md §3.2) re-designed for the MXU: an N-point FFT with N = A·B is
two batches of small DFT *matmuls* plus a twiddle multiply —

    X[k2·A + k1] = Σ_b W_N^{k1 b} · DFT_B(b→k2) Σ_a x[a·B + b] W_A^{a k1}

For A, B ≤ 128 the DFT matrices are MXU-sized, and a whole block of
frames is batched into one [A, A]×[A, F·B] matmul, so the FFT runs at
matmul throughput instead of using an (unavailable) FFT primitive.
Output is the per-block mean PSD in digit-reversed (k1, k2) layout;
``unpermute`` restores natural bin order on host.

Complex arithmetic uses float32 re/im planes (the axon toolchain has no
complex dtype); each complex matmul is 4 real MXU matmuls.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sigdigger_tpu.dsp.window import window_taps
from sigdigger_tpu.types import WindowFunction


def _dft_matrix(n: int, sign: float = -1.0) -> tuple[np.ndarray, np.ndarray]:
    k = np.arange(n)
    ang = sign * 2.0 * np.pi * np.outer(k, k) / n
    return (np.cos(ang).astype(np.float32),
            np.sin(ang).astype(np.float32))


@dataclass(frozen=True)
class PallasPSDConfig:
    fft_size: int                # N = A * B
    frames_per_block: int        # F (non-overlapping frames per feed)
    a: int = 0                   # row factor (0 → auto ≈ sqrt(N))
    frames_per_program: int = 8  # Fb frames handled per grid program

    def __post_init__(self):
        if self.a == 0:
            a = 1 << (int(np.log2(self.fft_size)) // 2)
            object.__setattr__(self, "a", a)
        assert self.fft_size % self.a == 0
        assert self.frames_per_block % self.frames_per_program == 0

    @property
    def b(self) -> int:
        return self.fft_size // self.a

    @property
    def block_in(self) -> int:
        return self.fft_size * self.frames_per_block


def _psd_kernel(x_re, x_im, da_re, da_im, tw_re, tw_im, db_re, db_im,
                out_ref, *, a: int, b: int, fb: int, scale: float):
    # stage 1: S1 = DFT_A × X  over [A, Fb·B]
    s1r = jnp.dot(da_re[:], x_re[:], preferred_element_type=jnp.float32) \
        - jnp.dot(da_im[:], x_im[:], preferred_element_type=jnp.float32)
    s1i = jnp.dot(da_re[:], x_im[:], preferred_element_type=jnp.float32) \
        + jnp.dot(da_im[:], x_re[:], preferred_element_type=jnp.float32)
    # stage 2: twiddle W_N^{k1 b} (tiled over frames on host)
    s2r = s1r * tw_re[:] - s1i * tw_im[:]
    s2i = s1r * tw_im[:] + s1i * tw_re[:]
    # stage 3: per-frame [A, B] × DFT_B, accumulate |X|²
    acc = jnp.zeros((a, b), jnp.float32)
    for fi in range(fb):                      # static unroll
        fr = s2r[:, fi * b:(fi + 1) * b]
        fim = s2i[:, fi * b:(fi + 1) * b]
        s3r = jnp.dot(fr, db_re[:], preferred_element_type=jnp.float32) \
            - jnp.dot(fim, db_im[:], preferred_element_type=jnp.float32)
        s3i = jnp.dot(fr, db_im[:], preferred_element_type=jnp.float32) \
            + jnp.dot(fim, db_re[:], preferred_element_type=jnp.float32)
        acc = acc + (s3r * s3r + s3i * s3i)
    prog = pl.program_id(0)

    @pl.when(prog == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += acc * scale


class PallasPSD:
    """Streaming mean-PSD over fixed blocks via the Bailey kernel.

    ``feed(x)`` consumes ``cfg.block_in`` complex samples and returns the
    natural-order mean PSD of the block's frames (power/Hz).  The
    EMA fold across blocks happens host-side on the tiny PSD row
    (alpha folded per block — display-equivalent to the reference's
    per-frame EMA).
    """

    def __init__(self, cfg: PallasPSDConfig, sample_rate: float,
                 window: WindowFunction = WindowFunction.BLACKMANN_HARRIS,
                 alpha: float = 0.25,
                 interpret: bool | None = None) -> None:
        self.cfg = cfg
        self.sample_rate = float(sample_rate)
        self.alpha_block = 1.0 - (1.0 - alpha) ** cfg.frames_per_program
        self.window = window
        if interpret is None:
            interpret = jax.default_backend() not in ("tpu", "axon")
        a, b, n = cfg.a, cfg.b, cfg.fft_size
        fb = cfg.frames_per_program
        self._taps = window_taps(window, n).astype(np.float64)
        wsum2 = float(np.sum(self._taps ** 2))
        scale = 1.0 / (self.sample_rate * wsum2 * fb *
                       (cfg.frames_per_block // fb))
        da_re, da_im = _dft_matrix(a)
        db_re, db_im = _dft_matrix(b)
        k1 = np.arange(a)[:, None]
        bb = np.arange(b)[None, :]
        ang = -2.0 * np.pi * k1 * bb / n
        tw_re = np.tile(np.cos(ang).astype(np.float32), (1, fb))
        tw_im = np.tile(np.sin(ang).astype(np.float32), (1, fb))
        self._const = (jnp.asarray(da_re), jnp.asarray(da_im),
                       jnp.asarray(tw_re), jnp.asarray(tw_im),
                       jnp.asarray(db_re), jnp.asarray(db_im))
        n_prog = cfg.frames_per_block // fb
        grid_spec = pl.GridSpec(
            grid=(n_prog,),
            in_specs=[
                pl.BlockSpec((a, fb * b), lambda i: (0, i),
                             memory_space=pltpu.VMEM),   # x_re
                pl.BlockSpec((a, fb * b), lambda i: (0, i),
                             memory_space=pltpu.VMEM),   # x_im
                pl.BlockSpec((a, a), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((a, a), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((a, fb * b), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),   # tw_re
                pl.BlockSpec((a, fb * b), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),   # tw_im
                pl.BlockSpec((b, b), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b, b), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((a, b), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
        )
        self._call = jax.jit(pl.pallas_call(
            partial(_psd_kernel, a=a, b=b, fb=fb, scale=scale),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((a, b), jnp.float32),
            interpret=interpret,
        ))
        self.psd = np.zeros(n, np.float64)
        self._count = 0

    def prepare(self, x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Host framing: x [block_in] complex → windowed [A, F·B] planes
        in the kernel's layout (column f·B+b, row a ↔ sample a·B+b)."""
        from sigdigger_tpu.native import frame_psd

        cfg = self.cfg
        return frame_psd(np.asarray(x, np.complex64), self._taps,
                         cfg.frames_per_block, cfg.a, cfg.b)

    def feed(self, x: np.ndarray) -> np.ndarray:
        x_re, x_im = self.prepare(np.asarray(x, np.complex64))
        out = np.asarray(self._call(x_re, x_im, *self._const))
        mean_psd = self.unpermute(out)
        if self._count == 0:
            self.psd = mean_psd.astype(np.float64)
        else:
            self.psd += self.alpha_block * (mean_psd - self.psd)
        self._count += 1
        return self.psd.astype(np.float32)

    def reset(self) -> None:
        """Restart the cross-block EMA (Analyzer wide-spectrum hops)."""
        self.psd = np.zeros(self.cfg.fft_size, np.float64)
        self._count = 0

    def unpermute(self, out: np.ndarray) -> np.ndarray:
        """(k1, k2) digit layout → natural bin order [N]."""
        return np.ascontiguousarray(out.T).ravel()

    def shifted(self) -> np.ndarray:
        return np.fft.fftshift(self.psd).astype(np.float32)
