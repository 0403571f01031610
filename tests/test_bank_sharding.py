"""Sharded kernel-bank path ≡ single-device, across mesh layouts.

The VERDICT round-2 top gap: the Pallas banks behind KernelAnalyzer —
the only code that executes on the target hardware — must scale across
chips.  parallel/banks.py shards every per-channel constant column and
state plane over a ("ch",) mesh (channels are independent; reference
analog Suscan/Analyzer.cpp:460-484 N inspectors on one stream) and
frame-shards the PSD with one psum.  These tests assert numerical
equality with the unsharded banks on the virtual CPU mesh, for every
bank and for the full KernelAnalyzer session protocol.
"""

import numpy as np
import pytest

from sigdigger_tpu.kernels.audio import (
    MODE_AM,
    MODE_FM,
    MODE_USB,
    AudioBank,
    AudioBankConfig,
)
from sigdigger_tpu.kernels.fft import PallasPSD, PallasPSDConfig
from sigdigger_tpu.kernels.rawbank import RawBank, RawBankConfig
from sigdigger_tpu.kernels.recovery import (
    KIND_ASK,
    KIND_FSK,
    KIND_PSK,
    RecoveryBank,
    RecoveryBankConfig,
)
from sigdigger_tpu.parallel.banks import (
    make_ch_mesh,
    shard_audio_bank,
    shard_psd,
    shard_raw_bank,
    shard_recovery_bank,
)

FS = 1_024_000.0
C = 16


def _blocks(n, size, seed=0):
    rng = np.random.default_rng(seed)
    return [(rng.standard_normal(size)
             + 1j * rng.standard_normal(size)).astype(np.complex64)
            for _ in range(n)]


def _raw_cfg():
    return RawBankConfig(sample_rate=FS, n_channels=C, taps=64,
                         decimation=16, block_out=512, m_tile=256,
                         channel_tile=C)


def _configure_raw(bank):
    for i in range(C):
        bank.configure_channel(i, f0=-400e3 + i * 50e3,
                               bw=10e3 + 2e3 * i)


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_raw_bank_sharded_equivalence(n_dev):
    cfg = _raw_cfg()
    ref = RawBank(cfg, interpret=True)
    sh = shard_raw_bank(RawBank(cfg, interpret=True),
                        make_ch_mesh(n_dev))
    _configure_raw(ref)
    _configure_raw(sh)
    for x in _blocks(3, cfg.block_in):
        yr, yi = ref.feed(x)
        zr, zi = sh.feed(x)
        np.testing.assert_allclose(zr, yr, atol=1e-5)
        np.testing.assert_allclose(zi, yi, atol=1e-5)
    np.testing.assert_allclose(sh.block_power, ref.block_power,
                               atol=1e-6)


def _audio_cfg():
    return AudioBankConfig(sample_rate=FS, n_channels=C, taps=64,
                           decimation=16, audio_decim=8, block_out=512,
                           m_tile=256, channel_tile=C, enable_ssb=True)


def _configure_audio(bank):
    modes = [MODE_FM, MODE_AM, MODE_USB]
    for i in range(C):
        bank.configure_channel(
            i, f0=-400e3 + i * 50e3, bw=12e3, mode=modes[i % 3],
            cutoff=5e3, volume=1.0, squelch=(i % 4 == 0),
            squelch_level=1e-4, agc=(i % 2 == 0), reset_state=True)


@pytest.mark.parametrize("n_dev", [4, 8])
def test_audio_bank_sharded_equivalence(n_dev):
    cfg = _audio_cfg()
    ref = AudioBank(cfg, interpret=True)
    sh = shard_audio_bank(AudioBank(cfg, interpret=True),
                          make_ch_mesh(n_dev))
    _configure_audio(ref)
    _configure_audio(sh)
    for x in _blocks(3, cfg.block_in):
        a = ref.feed(x)
        b = sh.feed(x)
        np.testing.assert_allclose(b, a, atol=1e-5)
    np.testing.assert_array_equal(sh.squelch_open(), ref.squelch_open())


def _configure_recovery(bank):
    kinds = [KIND_PSK, KIND_FSK, KIND_ASK]
    for i in range(C):
        bank.configure_channel(
            i, kind=kinds[i % 3], sps=4.0 + (i % 4),
            order=(2, 4, 8)[i % 3], loop_bw=0.01,
            clock_gain=0.05, mf_rolloff=0.35, use_mf=(i % 2 == 0))


@pytest.mark.parametrize("n_dev", [4, 8])
def test_recovery_bank_sharded_equivalence(n_dev):
    cfg = RecoveryBankConfig(n_channels=C, block_len=512,
                             channel_tile=C)
    ref = RecoveryBank(cfg, interpret=True)
    sh = shard_recovery_bank(RecoveryBank(cfg, interpret=True),
                             make_ch_mesh(n_dev))
    _configure_recovery(ref)
    _configure_recovery(sh)
    rng = np.random.default_rng(3)
    for _ in range(3):
        y = (rng.standard_normal((512, C))
             + 1j * rng.standard_normal((512, C))).astype(np.complex64)
        s_ref, st_ref = ref.feed(y)
        s_sh, st_sh = sh.feed(y)
        np.testing.assert_allclose(s_sh, s_ref, atol=1e-5)
        np.testing.assert_array_equal(st_sh, st_ref)
    np.testing.assert_allclose(sh.state, ref.state, atol=1e-5)


@pytest.mark.parametrize("n_dev", [2, 8])
def test_psd_frame_sharded_equivalence(n_dev):
    cfg = PallasPSDConfig(fft_size=1024, frames_per_block=16,
                          frames_per_program=2)
    ref = PallasPSD(cfg, FS, interpret=True)
    sh = shard_psd(PallasPSD(cfg, FS, interpret=True),
                   make_ch_mesh(n_dev))
    rng = np.random.default_rng(5)
    x = (rng.standard_normal(cfg.block_in)
         + 1j * rng.standard_normal(cfg.block_in)).astype(np.complex64)
    np.testing.assert_allclose(sh.feed(x), ref.feed(x),
                               rtol=1e-5, atol=1e-12)


def test_psd_shard_rejects_indivisible_frames():
    cfg = PallasPSDConfig(fft_size=1024, frames_per_block=12,
                          frames_per_program=4)
    with pytest.raises(ValueError):
        shard_psd(PallasPSD(cfg, FS, interpret=True), make_ch_mesh(8))


def test_open_retune_close_no_recompile_sharded():
    """The dynamic-analyzer contract survives sharding: open/retune/
    close are constant updates; the compiled sharded call never
    changes."""
    cfg = _audio_cfg()
    sh = shard_audio_bank(AudioBank(cfg, interpret=True),
                          make_ch_mesh(8))
    call_before = sh._call
    _configure_audio(sh)
    sh.configure_channel(3, f0=100e3, mode=MODE_FM)
    sh.configure_channel(3, mode=0, volume=0.0)      # close/mask
    assert sh._call is call_before


# ---------------------------------------------------------------------------
# Full KernelAnalyzer session on the sharded banks
# ---------------------------------------------------------------------------

def _make_engines(mesh):
    from sigdigger_tpu.analyzer.kernel_engine import KernelAnalyzer
    from sigdigger_tpu.profiles import SourceProfile
    from sigdigger_tpu.sources import Emitter, SynthBandSource
    from sigdigger_tpu.types import AnalyzerParams

    def mk(m):
        prof = SourceProfile(type="synth", sample_rate=256_000,
                             freq=0.0)
        src = SynthBandSource(prof, [
            Emitter(freq=60e3, amplitude=1.0, fm_rate=200.0,
                    fm_dev=2000.0),
            Emitter(freq=-40e3, amplitude=0.5, kind="psk", order=4, baud=4000.0),
        ], seed=1)
        params = AnalyzerParams()
        params.window_size = 4096
        return KernelAnalyzer(source=src, params=params,
                              block_size=32768, decimation=16,
                              n_slots=16, interpret=True, mesh=m)
    return mk(None), mk(mesh)


def test_kernel_analyzer_sharded_session():
    """open audio + psk inspectors, step both engines on identical
    sources, and require identical message payloads."""
    from sigdigger_tpu.types import Channel

    ref, sh = _make_engines(make_ch_mesh(8))
    for an in (ref, sh):
        an.open_inspector("audio", Channel(fc=60e3, bw=12e3),
                          config={"audio.demodulator": 2,
                                  "audio.volume": 1.0,
                                  "audio.sample-rate": 16_000.0})
        an.open_inspector("psk", Channel(fc=-40e3, bw=8e3),
                          config={"afc.bits-per-symbol": 2,
                                  "clock.baud": 4000.0})
        an.poll()

    for _ in range(3):
        assert ref.step() and sh.step()
        m_ref = ref.poll()
        m_sh = sh.poll()
        assert len(m_ref) == len(m_sh)
        compared = 0
        for a, b in zip(m_ref, m_sh):
            assert a.kind == b.kind
            for attr in ("samples", "data"):
                pa = getattr(a, attr, None)
                pb = getattr(b, attr, None)
                if pa is not None and pb is not None:
                    np.testing.assert_allclose(
                        np.asarray(pb, np.complex128),
                        np.asarray(pa, np.complex128), atol=1e-4)
                    compared += 1
        assert compared >= 2   # at least audio samples + PSD per step
