from sigdigger_tpu.io.wav import WavWriter, read_wav, write_wav

__all__ = ["WavWriter", "read_wav", "write_wav"]
