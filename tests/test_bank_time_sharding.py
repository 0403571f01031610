"""Time-axis sharding of the Pallas bank path (r3 VERDICT item 6).

Time-sharded bank output must equal the single-device stream:
- RawBank / FM AudioBank: exact (stateless split / input halos)
- PSK chain (RawBank → RecoveryBank): exact sequential handoff

Runs on the 8-virtual-device CPU mesh from conftest.
"""

import jax
import numpy as np
import pytest

from sigdigger_tpu.kernels.audio import (
    MODE_FM,
    MODE_RAW,
    AudioBank,
    AudioBankConfig,
)
from sigdigger_tpu.kernels.rawbank import RawBank, RawBankConfig
from sigdigger_tpu.kernels.recovery import (
    KIND_PSK,
    RecoveryBank,
    RecoveryBankConfig,
)
from sigdigger_tpu.parallel.timebanks import (
    TimeShardedAudioBank,
    TimeShardedRawBank,
    TimeShardedRecoveryBank,
    make_time_ch_mesh,
)

FS = 1_024_000.0
C = 16
DECIM = 16
BLOCK_OUT = 2048         # channel samples per block
F0S = np.linspace(-400e3, 400e3, C)


def make_signal(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / FS
    x = np.zeros(n, np.complex64)
    # FM carrier on channel 4, tone on channel 10
    fm = 2 * np.pi * np.cumsum(
        np.full(n, F0S[4]) + 3e3 * np.sin(2 * np.pi * 400.0 * t)) / FS
    x += (0.8 * np.exp(1j * fm)).astype(np.complex64)
    x += (0.5 * np.exp(2j * np.pi * F0S[10] * t)).astype(np.complex64)
    x += (0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
          ).astype(np.complex64)
    return x.astype(np.complex64)


def raw_cfg():
    return RawBankConfig(sample_rate=FS, n_channels=C, taps=32,
                         decimation=DECIM, block_out=BLOCK_OUT,
                         m_tile=512, channel_tile=8)


@pytest.mark.parametrize("n_time,n_ch", [(2, 1), (4, 2), (2, 4)])
def test_raw_bank_time_sharded_exact(n_time, n_ch):
    mesh = make_time_ch_mesh(n_time, n_ch)
    blocks = [make_signal(BLOCK_OUT * DECIM, seed=s) for s in range(3)]

    ref = RawBank(raw_cfg(), interpret=True)
    for i in range(C):
        ref.configure_channel(i, f0=F0S[i], bw=30e3)
    want = [ref.feed(b) for b in blocks]

    bank = RawBank(raw_cfg(), interpret=True)
    tsh = TimeShardedRawBank(bank, mesh)
    for i in range(C):
        bank.configure_channel(i, f0=F0S[i], bw=30e3)
    for b, (w_re, w_im) in zip(blocks, want):
        g_re, g_im = tsh.feed(b)
        np.testing.assert_allclose(g_re, w_re, atol=2e-4)
        np.testing.assert_allclose(g_im, w_im, atol=2e-4)
    np.testing.assert_allclose(tsh.block_power, ref.block_power,
                               rtol=1e-4)


def audio_cfg():
    return AudioBankConfig(sample_rate=FS, n_channels=C, taps=32,
                           decimation=DECIM, audio_taps=32,
                           audio_decim=4, audio_fir_taps=32,
                           block_out=BLOCK_OUT, m_tile=512,
                           channel_tile=8)


def test_audio_bank_time_sharded_fm_exact():
    """FM (and RAW) through the haloed time-sharded audio bank match
    the single-device stream across block boundaries."""
    mesh = make_time_ch_mesh(4, 2)
    blocks = [make_signal(BLOCK_OUT * DECIM, seed=s) for s in range(3)]

    def setup(bank):
        for i in range(C):
            bank.configure_channel(
                i, f0=F0S[i], bw=30e3,
                mode=MODE_FM if i == 4 else MODE_RAW,
                cutoff=12e3, volume=1.0, squelch=False)

    ref = AudioBank(audio_cfg(), interpret=True)
    setup(ref)
    want = [ref.feed(b) for b in blocks]

    bank = AudioBank(audio_cfg(), interpret=True)
    tsh = TimeShardedAudioBank(bank, mesh)
    setup(bank)
    for k, (b, w) in enumerate(zip(blocks, want)):
        got = tsh.feed(b)
        assert got.shape == w.shape
        np.testing.assert_allclose(got, w, atol=5e-4,
                                   err_msg=f"block {k}")


def test_psk_chain_time_sharded_exact_handoff():
    """RawBank (time split) → RecoveryBank (turn-taking): the PSK soft
    symbols and strobes bit-match the single-device chain."""
    mesh = make_time_ch_mesh(4, 2)
    # PSK burst on channel 6
    rng = np.random.default_rng(3)
    n = BLOCK_OUT * DECIM
    baud = FS / DECIM / 8.0
    nsym = int(3 * n / FS * baud) + 8
    syms = np.exp(0.5j * np.pi * rng.integers(0, 4, nsym))
    t = np.arange(3 * n) / FS
    idx = np.minimum((t * baud).astype(int), nsym - 1)
    x_all = (0.7 * syms[idx] * np.exp(2j * np.pi * F0S[6] * t)
             ).astype(np.complex64)
    x_all += (0.005 * (rng.standard_normal(3 * n)
                       + 1j * rng.standard_normal(3 * n))
              ).astype(np.complex64)
    blocks = [x_all[i * n:(i + 1) * n] for i in range(3)]

    def rec_cfg():
        return RecoveryBankConfig(n_channels=C, block_len=BLOCK_OUT,
                                  m_tile=512, channel_tile=8)

    def setup(raw, rec):
        for i in range(C):
            raw.configure_channel(i, f0=F0S[i], bw=20e3)
            rec.configure_channel(i, kind=KIND_PSK, sps=8.0, order=4,
                                  loop_bw=0.01, clock_gain=0.05,
                                  use_mf=False)

    ref_raw = RawBank(raw_cfg(), interpret=True)
    ref_rec = RecoveryBank(rec_cfg(), interpret=True)
    setup(ref_raw, ref_rec)
    want = []
    for b in blocks:
        y_re, y_im = ref_raw.feed_frames(*ref_raw.frame(b),
                                         fetch=False)
        want.append(ref_rec.feed_planes(y_re, y_im))

    raw = RawBank(raw_cfg(), interpret=True)
    rec = RecoveryBank(rec_cfg(), interpret=True)
    setup(raw, rec)
    t_raw = TimeShardedRawBank(raw, mesh)
    t_rec = TimeShardedRecoveryBank(rec, mesh)
    for k, (b, (w_soft, w_st)) in enumerate(zip(blocks, want)):
        y_re, y_im = t_raw.feed(b, fetch=False)
        soft, st = t_rec.feed_planes(y_re, y_im)
        np.testing.assert_array_equal(st, w_st,
                                      err_msg=f"strobes block {k}")
        np.testing.assert_allclose(soft, w_soft, atol=1e-3,
                                   err_msg=f"soft block {k}")


def test_time_mesh_needs_enough_devices():
    with pytest.raises(ValueError):
        make_time_ch_mesh(8, 8, devices=jax.devices())


def test_kernel_analyzer_on_time_ch_mesh():
    """The FULL dynamic analyzer session on a ("time","ch") mesh: one
    wideband stream split in time on the bank path, same message
    payloads as the single-device engine (FM exact via input halos,
    PSK via exact turn-taking handoff)."""
    from sigdigger_tpu.analyzer.kernel_engine import KernelAnalyzer
    from sigdigger_tpu.analyzer.messages import MessageKind
    from sigdigger_tpu.profiles import SourceProfile
    from sigdigger_tpu.sources import Emitter, SynthBandSource
    from sigdigger_tpu.types import AnalyzerParams, Channel

    FS_E = 256_000

    def make(mesh):
        prof = SourceProfile(type="synth", sample_rate=FS_E, freq=0.0)
        src = SynthBandSource(
            prof,
            [Emitter(freq=60e3, amplitude=1.0, fm_rate=300.0,
                     fm_dev=2000.0),
             Emitter(freq=-50e3, amplitude=1.0, kind="psk", order=4,
                     baud=2000.0, seed=9)], seed=1)
        params = AnalyzerParams()
        params.window_size = 4096
        return KernelAnalyzer(source=src, params=params,
                              block_size=32768, interpret=True,
                              decimation=16, n_slots=16, mesh=mesh)

    def session(an, steps=3):
        h_a = an.open_inspector(
            "audio", Channel(fc=60e3, bw=12e3),
            config={"audio.demodulator": 2, "audio.volume": 1.0,
                    "audio.sample-rate": an.audio_rate,
                    "audio.squelch": False})
        h_p = an.open_inspector(
            "psk", Channel(fc=-50e3, bw=6e3),
            config={"afc.bits-per-symbol": 2, "clock.baud": 2000.0,
                    "agc.enabled": False, "agc.gain": 1.0})
        h_w = an.open_inspector("power", Channel(fc=60e3, bw=12e3))
        an.poll()
        out = {h_a: [], h_p: [], h_w: []}
        strobes = []
        psds = 0
        for _ in range(steps):
            assert an.step()
            for m in an.poll():
                if m.kind == MessageKind.SAMPLES:
                    out[m.handle].append(np.asarray(m.samples))
                    if m.handle == h_p:
                        strobes.append(
                            np.asarray(m.extras["strobes"]))
                elif m.kind == MessageKind.PSD:
                    psds += 1
        assert psds >= 1
        return ([np.concatenate(v) for v in out.values()],
                np.concatenate(strobes))

    want, st_want = session(make(None))
    mesh = make_time_ch_mesh(4, 2)
    got, st_got = session(make(mesh))
    # audio (FM, halo path) matches the single-device stream exactly
    np.testing.assert_allclose(got[0], want[0], rtol=0, atol=5e-4)
    # Gardner strobes: the engine's reference build and the shard-local
    # build tile the recovery kernel differently, so f32 reassociation
    # can flip a knife-edge timing decision by one sample — allow a
    # sub-0.5% disagreement, same total symbol count
    assert len(st_got) == len(st_want)
    assert abs(int(st_got.sum()) - int(st_want.sum())) <= 2
    frac = float(np.mean(st_got != st_want))
    assert frac < 0.005, frac
    agree = st_got == st_want
    np.testing.assert_allclose(got[1][agree], want[1][agree],
                               rtol=0, atol=5e-3)
    np.testing.assert_allclose(got[2], want[2], rtol=0, atol=5e-4)


def make_am_signal(n, seed=0):
    rng = np.random.default_rng(seed + 100)
    t = np.arange(n) / FS
    x = (0.7 * (1 + 0.5 * np.cos(2 * np.pi * 300.0 * t))
         * np.exp(2j * np.pi * F0S[6] * t))
    x = x + 0.02 * np.exp(2j * np.pi * F0S[2] * t)   # below squelch
    x = x + 0.01 * (rng.standard_normal(n)
                    + 1j * rng.standard_normal(n))
    return x.astype(np.complex64)


def test_audio_bank_time_sharded_am_squelch_exact():
    """AM output (AGC off), squelch EMA state and squelch decisions are
    EXACT vs single-device (r4 VERDICT item 4): the sq/DC EMAs are
    linear in their carried state, so the wrapper reshards them with a
    two-pass seed scan instead of the halo approximation."""
    from sigdigger_tpu.kernels.audio import MODE_AM

    mesh = make_time_ch_mesh(4, 2)
    blocks = [make_am_signal(BLOCK_OUT * DECIM, seed=s)
              for s in range(3)]

    def setup(bank):
        for ch in (2, 6):
            bank.configure_channel(
                ch, f0=F0S[ch], bw=30e3, mode=MODE_AM, cutoff=5e3,
                volume=1.0, agc=False, squelch=True,
                squelch_level=0.05)

    ref = AudioBank(audio_cfg(), interpret=True)
    setup(ref)
    want = [ref.feed(b) for b in blocks]

    bank = AudioBank(audio_cfg(), interpret=True)
    tsh = TimeShardedAudioBank(bank, mesh)
    assert tsh.seed_tile > 0
    setup(bank)
    for k, (b, w) in enumerate(zip(blocks, want)):
        got = tsh.feed(b)
        np.testing.assert_array_equal(got[:, [2, 6]], w[:, [2, 6]],
                                      err_msg=f"block {k}")
    # squelch EMA state and the gate decisions match bit-for-bit
    np.testing.assert_array_equal(np.asarray(bank._sq)[:, [2, 6]],
                                  np.asarray(ref._sq)[:, [2, 6]])
    assert bool(bank.squelch_open()[6]) == bool(ref.squelch_open()[6])
    assert bool(bank.squelch_open()[2]) == bool(ref.squelch_open()[2])
    assert bool(ref.squelch_open()[6])          # strong AM open
    assert not bool(ref.squelch_open()[2])      # weak tone gated
    np.testing.assert_allclose(bank.block_power, ref.block_power,
                               rtol=1e-6)
