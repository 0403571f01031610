import io

import numpy as np
import pytest

from sigdigger_tpu.io.wav import read_wav, write_wav
from sigdigger_tpu.profiles import SourceProfile
from sigdigger_tpu.sources import (
    FileSource,
    StdinSource,
    ToneGenSource,
    guess_metadata,
    make_source,
)
from sigdigger_tpu.types import SampleFormat


def test_tonegen_phase_continuity():
    p = SourceProfile(type="tonegen", sample_rate=48000, tone_freq=1000.0)
    src = ToneGenSource(p)
    a = src.read(4096)
    b = src.read(4096)
    both = np.concatenate([a, b])
    ref = ToneGenSource(p)
    ref_all = ref.read(8192)
    assert np.allclose(both, ref_all, atol=1e-6)


def test_tonegen_noise_power():
    p = SourceProfile(type="tonegen", sample_rate=48000, tone_freq=0.0,
                      noise_db=-20.0)
    src = ToneGenSource(p)
    x = src.read(1 << 16)
    noise = x - 1.0  # tone at DC has amplitude 1
    measured = 10 * np.log10(np.mean(np.abs(noise) ** 2))
    assert abs(measured - (-20.0)) < 0.5


def test_raw_file_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    data = (rng.standard_normal(10000) + 1j * rng.standard_normal(10000)
            ).astype(np.complex64)
    path = tmp_path / "capture.cf32"
    data.tofile(path)
    p = SourceProfile(type="file", path=str(path),
                      format=SampleFormat.RAW_COMPLEX64, sample_rate=100000)
    src = make_source(p)
    assert src.total_samples == 10000
    x = src.read(4096)
    assert np.array_equal(x, data[:4096])
    src.seek(9000)
    y = src.read(2048)  # short read → zero pad + EOS
    assert np.array_equal(y[:1000], data[9000:])
    assert np.all(y[1000:] == 0)
    assert src.eos


def test_raw_file_loop(tmp_path):
    data = np.arange(100, dtype=np.complex64)
    path = tmp_path / "loop.cf32"
    data.tofile(path)
    p = SourceProfile(type="file", path=str(path),
                      format=SampleFormat.RAW_COMPLEX64, loop=True)
    src = FileSource(p)
    x = src.read(250)
    assert src.looped and not src.eos
    assert np.array_equal(x, np.concatenate([data, data, data[:50]]))


def test_int16_and_uint8_conversion(tmp_path):
    iq16 = np.array([32767, 0, -32768, 16384], dtype=np.int16)
    path = tmp_path / "x.cs16"
    iq16.tofile(path)
    p = SourceProfile(type="file", path=str(path),
                      format=SampleFormat.RAW_INT16)
    src = FileSource(p)
    x = src.read(2)
    assert np.isclose(x[0].real, 32767 / 32768) and np.isclose(x[0].imag, 0)
    assert np.isclose(x[1].real, -1.0) and np.isclose(x[1].imag, 0.5)

    u8 = np.array([255, 127, 0, 128], dtype=np.uint8)
    path8 = tmp_path / "x.cu8"
    u8.tofile(path8)
    p8 = SourceProfile(type="file", path=str(path8),
                       format=SampleFormat.RAW_UINT8)
    x8 = FileSource(p8).read(2)
    assert np.isclose(x8[0].real, 1.0) and abs(x8[0].imag) < 0.005


def test_wav_roundtrip_and_source(tmp_path):
    rng = np.random.default_rng(5)
    stereo = rng.standard_normal((1000, 2)).astype(np.float32) * 0.5
    path = tmp_path / "capture.wav"
    write_wav(str(path), stereo, 48000)
    back, rate = read_wav(str(path))
    assert rate == 48000
    assert np.allclose(back, stereo, atol=1e-6)

    p = SourceProfile(type="file", path=str(path), format=SampleFormat.WAV)
    src = FileSource(p)
    assert src.sample_rate == 48000
    x = src.read(1000)
    assert np.allclose(x.real, stereo[:, 0], atol=1e-6)
    assert np.allclose(x.imag, stereo[:, 1], atol=1e-6)


def test_wav_pcm16(tmp_path):
    mono = np.sin(np.linspace(0, 20, 500)).astype(np.float32)
    path = tmp_path / "pcm.wav"
    write_wav(str(path), mono, 8000, float32=False)
    back, rate = read_wav(str(path))
    assert rate == 8000
    assert np.allclose(back[:, 0], mono, atol=1e-3)


def test_stdin_source():
    data = (np.arange(64) + 1j).astype(np.complex64)
    stream = io.BytesIO(data.tobytes())
    p = SourceProfile(type="stdin", format=SampleFormat.RAW_COMPLEX64)
    src = StdinSource(p, stream=stream)
    x = src.read(32)
    assert np.array_equal(x, data[:32])
    y = src.read(64)
    assert np.array_equal(y[:32], data[32:])
    assert src.eos


def test_guess_metadata():
    p = guess_metadata("gqrx_20240101_000000_145000000_2400000_fc.raw")
    assert p.sample_rate == 2400000
    assert p.freq == 145000000
    assert p.format == SampleFormat.RAW_COMPLEX64

    p2 = guess_metadata("baseband_433920000Hz_1024000sps.cf32")
    assert p2.sample_rate == 1024000
    assert p2.freq == 433920000


def test_profile_roundtrip():
    p = SourceProfile(type="tonegen", sample_rate=2_400_000, average=4,
                      tone_freq=100e3, gains={"LNA": 20.0})
    q = SourceProfile.from_json(p.to_json())
    assert q == p
    assert q.effective_rate == 600_000


def test_unknown_source_type():
    with pytest.raises(ValueError):
        make_source(SourceProfile(type="nope"))
