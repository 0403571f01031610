from sigdigger_tpu.kernels.channelizer import (
    MatChannelizer,
    MatChannelizerConfig,
)
from sigdigger_tpu.kernels.digital import DigitalKernel, DigitalKernelConfig
from sigdigger_tpu.kernels.fft import PallasPSD, PallasPSDConfig
from sigdigger_tpu.kernels.ops import atan2, complex_matmul, complex_mul
from sigdigger_tpu.kernels.psk import PskKernel, PskKernelConfig

__all__ = [
    "DigitalKernel",
    "DigitalKernelConfig",
    "MatChannelizer",
    "MatChannelizerConfig",
    "PallasPSD",
    "PallasPSDConfig",
    "PskKernel",
    "PskKernelConfig",
    "atan2",
    "complex_matmul",
    "complex_mul",
]
