from sigdigger_tpu.kernels.channelizer import (
    MatChannelizer,
    MatChannelizerConfig,
)
from sigdigger_tpu.kernels.fft import PallasPSD, PallasPSDConfig
from sigdigger_tpu.kernels.ops import atan2, complex_matmul, complex_mul

__all__ = [
    "MatChannelizer",
    "MatChannelizerConfig",
    "PallasPSD",
    "PallasPSDConfig",
    "atan2",
    "complex_matmul",
    "complex_mul",
]
