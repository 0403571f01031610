"""Roofline / MFU accounting for the Pallas kernel set.

BASELINE.md demands "FFT and polyphase kernels at per-chip roofline";
this module provides the bookkeeping to check that claim honestly:
per-block FLOP and byte counts for each kernel (counted from the
kernel's actual matmul shapes, i.e. *executed* MXU work, plus the
useful-work subset where they differ), chip peak tables, and an
``mfu()`` / ``membw()`` report.

The distinction matters for the banded audio FIR: the kernel executes a
dense [Mt/Da, Mt+Ka-1] x [Mt+Ka-1, Ct] matmul whose matrix is mostly
zeros, so executed FLOPs >> useful FLOPs.  MFU (model-flops
utilization) uses the USEFUL count; hardware utilization uses the
EXECUTED count.  Both are reported.

Peak numbers are the public v5e specs (197 TFLOP/s bf16, 819 GB/s HBM).
The kernels run f32 inputs with f32 accumulation; on the MXU an f32
matmul decomposes into ~3 bf16 passes, so the conservative f32 matmul
ceiling is peak_bf16/3.  MFU is reported against BOTH ceilings.
"""

from __future__ import annotations

from dataclasses import dataclass


# public chip specs (per chip)
CHIP_PEAKS = {
    "v5e": {"bf16_tflops": 197.0, "hbm_gbps": 819.0},
    "v5p": {"bf16_tflops": 459.0, "hbm_gbps": 2765.0},
    "v4": {"bf16_tflops": 275.0, "hbm_gbps": 1228.0},
}
F32_MATMUL_PASSES = 3  # bf16x3 decomposition of an f32 dot on the MXU


@dataclass(frozen=True)
class KernelWork:
    """Per-block work accounting for one kernel dispatch."""

    name: str
    mxu_flops: float        # executed MXU flops (dense matmul shapes)
    useful_flops: float     # algorithmically required flops
    vpu_flops: float        # elementwise/transcendental flop estimate
    hbm_bytes: float        # HBM traffic: streamed inputs + outputs

    def __add__(self, other: "KernelWork") -> "KernelWork":
        return KernelWork(
            name=f"{self.name}+{other.name}",
            mxu_flops=self.mxu_flops + other.mxu_flops,
            useful_flops=self.useful_flops + other.useful_flops,
            vpu_flops=self.vpu_flops + other.vpu_flops,
            hbm_bytes=self.hbm_bytes + other.hbm_bytes,
        )


def channelizer2_work(cfg) -> KernelWork:
    """MatChannelizer2 per-block work (kernels/channelizer2.py).

    Executed matmuls: 4 real [M, K] x [K, C] (channelize) plus, per time
    tile and channel tile, the dense banded audio FIR
    [Mt/Da, Mt+Ka-1] x [Mt+Ka-1, Ct].
    """
    m, k, c = cfg.block_out, cfg.taps, cfg.n_channels
    ka, da = cfg.audio_taps, cfg.audio_decim
    # the banded FIR runs in fir_tile chunks (channelizer2.py); its
    # executed width per audio row is the chunk band, not the tile
    ft = getattr(cfg, "fir_tile", cfg.m_tile)
    chan_mxu = 4 * 2.0 * m * k * c
    fir_mxu = 2.0 * (m / da) * (ft + ka - 1) * c
    fir_useful = 2.0 * (m / da) * ka * c
    # rotate (sin/cos + complex mul) + discriminator (atan2 ~ 30 flops)
    vpu = m * c * (2 * 12 + 6 + 30 + 4)
    # streamed per block: xw planes in, audio + carries out, constants
    hbm = (2 * m * k * 4) + (m / da) * c * 4 + 2 * (k * c * 4)
    return KernelWork("channelizer2", chan_mxu + fir_mxu,
                      chan_mxu + fir_useful, vpu, hbm)


def psd_work(cfg) -> KernelWork:
    """PallasPSD per-block work (kernels/fft.py Bailey four-step).

    Executed: 4 real [A, A] x [A, F*B] (stage 1) + per frame
    4 real [A, B] x [B, B] (stage 3); twiddle + |X|^2 on the VPU.
    Useful-FLOP reference for an N-point FFT: 5 N log2 N per frame.
    """
    import numpy as np

    a, b, f = cfg.a, cfg.b, cfg.frames_per_block
    n = cfg.fft_size
    s1 = 4 * 2.0 * a * a * (f * b)
    s3 = 4 * 2.0 * a * b * b * f
    useful = 5.0 * n * np.log2(n) * f
    vpu = f * n * (6 + 3)          # twiddle complex mul + |X|^2 acc
    hbm = 2 * a * f * b * 4 + a * b * 4 + 2 * (a * a + b * b + a * f * b) * 4
    return KernelWork("psd", s1 + s3, useful, vpu, hbm)


def report(work: KernelWork, seconds: float, chip: str = "v5e") -> dict:
    """Utilization numbers for `work` executed in `seconds` on `chip`."""
    peak = CHIP_PEAKS[chip]
    peak_bf16 = peak["bf16_tflops"] * 1e12
    peak_f32 = peak_bf16 / F32_MATMUL_PASSES
    tflops_exec = work.mxu_flops / seconds / 1e12
    return {
        "chip": chip,
        "mxu_tflops": round(tflops_exec, 3),
        "hw_util_f32": round(work.mxu_flops / seconds / peak_f32, 4),
        "mfu": round(work.useful_flops / seconds / peak_bf16, 4),
        "hbm_gbps": round(work.hbm_bytes / seconds / 1e9, 2),
        "hbm_util": round(work.hbm_bytes / seconds / 1e9
                          / peak["hbm_gbps"], 4),
    }
