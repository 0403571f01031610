"""SNR-bound correctness — the BASELINE.json acceptance criterion.

The reference publishes no numbers and no test vectors, so correctness
is asserted against *theory*: demodulator output quality at a given
input SNR must sit within the textbook bound for each chain.  These are
the replay-based differential tests SURVEY.md §4 calls for, with
closed-form signals standing in for recorded suscan output.
"""

import numpy as np
from scipy.special import erfc

from sigdigger_tpu.dsp.filters import fir_apply, rrc_taps
from sigdigger_tpu.inspectors import make_inspector


def awgn(x, snr_db, rng):
    p_sig = np.mean(np.abs(x) ** 2)
    p_noise = p_sig / (10.0 ** (snr_db / 10.0))
    n = (rng.standard_normal(len(x)) + 1j * rng.standard_normal(len(x))
         ).astype(np.complex64) * np.sqrt(p_noise / 2.0)
    return (x + n).astype(np.complex64)


def test_fm_demod_output_snr():
    """Above threshold, FM demod output SNR ≈ CNR + 10log10(3(β)²(β+1))
    (sinusoidal modulation).  Assert within 3 dB of theory."""
    rng = np.random.default_rng(0)
    fs = 200_000.0
    fm, dev = 1000.0, 30_000.0          # β = 30
    n = 1 << 17
    t = np.arange(n) / fs
    msg = np.sin(2 * np.pi * fm * t)
    x = np.exp(1j * (2 * np.pi * dev * np.cumsum(msg) / fs)).astype(
        np.complex64)
    cnr_db = 20.0
    noisy = awgn(x, cnr_db, rng)

    insp = make_inspector("audio", fs)
    insp.set_config({"audio.demodulator": 2, "audio.sample-rate": int(fs),
                     "audio.cutoff": 3000.0, "agc.enabled": False})
    audio = np.asarray(insp.process(noisy[None, :])["samples"])[0][2000:]

    # coherent reference fit: audio = a*sin + b*cos + noise
    tt = np.arange(2000, n) / fs
    s = np.sin(2 * np.pi * fm * tt)
    c = np.cos(2 * np.pi * fm * tt)
    a = 2 * np.mean(audio * s)
    b = 2 * np.mean(audio * c)
    fit = a * s + b * c
    p_sig = np.mean(fit ** 2)
    p_noise = np.mean((audio - fit) ** 2)
    out_snr_db = 10 * np.log10(p_sig / max(p_noise, 1e-30))

    beta = dev / fm
    # classic FM processing gain above threshold: 3 β² (≈34 dB at β=30);
    # the chain must deliver at least CNR + gain − 3 dB implementation
    # margin (measured ≈ CNR + 38 dB)
    gain_db = 10 * np.log10(3 * beta ** 2)
    expected = cnr_db + gain_db
    assert out_snr_db > expected - 3.0, (out_snr_db, expected)


def test_qpsk_ber_vs_theory():
    """QPSK through the full psk inspector at Es/N0 = 10 dB: measured
    BER within 5x of the theoretical 0.5*erfc(sqrt(Eb/N0))."""
    rng = np.random.default_rng(1)
    sps = 4
    nsym = 20000
    bits = rng.integers(0, 2, (nsym, 2))
    gray = np.array([0, 1, 3, 2])
    syms = gray[bits[:, 0] * 2 + bits[:, 1]]
    const = np.exp(1j * (2 * np.pi * syms / 4))
    up = np.zeros(nsym * sps, np.complex64)
    up[::sps] = const
    taps = rrc_taps(sps, span=8, rolloff=0.35)
    bb = np.array(fir_apply(up, taps))

    es_n0_db = 10.0
    # signal power of RRC-shaped QPSK with unit-energy pulses: Es/sps
    p_sig = np.mean(np.abs(bb) ** 2)
    es = p_sig * sps
    n0 = es / (10.0 ** (es_n0_db / 10.0))
    # complex noise over full band: variance n0 * (fs/symbol rate = sps)
    sigma2 = n0
    noise = (rng.standard_normal(len(bb)) +
             1j * rng.standard_normal(len(bb))) * np.sqrt(sigma2 / 2.0)
    x = (bb + noise).astype(np.complex64)

    rate = 32_000.0
    insp = make_inspector("psk", rate)
    # narrow carrier loop: at Es/N0=10 dB the 4th-power detector slips
    # cycles with wider loops (~125-symbol transitions); 2e-4 is
    # slip-free over this run
    insp.set_config({"afc.bits-per-symbol": 2, "afc.loop-bw": 0.0002,
                     "clock.baud": rate / sps, "clock.type": 1,
                     "clock.gain": 0.05, "mf.type": 1,
                     "mf.roll-off": 0.35, "agc.enabled": True,
                     "agc.ts": 50.0})
    out = insp.process(x[None, :])
    stb = np.asarray(out["strobes"])[0]
    ids = np.asarray(out["symbols"])[0][stb].astype(int)

    # differential-symbol comparison: immune to the Costas 90°
    # ambiguity AND to occasional cycle slips (each slip costs ~1
    # differential error instead of flipping the rest of the stream) —
    # exactly why practical QPSK links run differentially encoded.
    d_got_all = np.diff(ids.astype(int)) % 4
    d_ref_all = np.diff(syms.astype(int)) % 4

    def window_err(start, length=500):
        got = d_got_all[start:start + length]
        best = 1.0
        for lag in range(-16, 17):
            ref = d_ref_all[start + lag:start + lag + len(got)]
            if len(ref) == len(got):
                best = min(best, float(np.mean(got != ref)))
        return best

    n_skip = len(d_got_all) // 4
    wins = [window_err(n_skip + w * 500) for w in range(20)]
    err = float(np.median(wins))
    # differential decoding ≈ doubles the symbol error rate; QPSK SER at
    # Es/N0=10 dB ≈ 2*Q(sqrt(Es/N0)) ≈ 1.6e-3 → differential ≈ 3e-3
    eb_n0 = 10.0 ** (es_n0_db / 10.0) / 2.0
    theory_ser = erfc(np.sqrt(eb_n0))
    assert err < max(5 * 2 * theory_ser, 1e-2), (err, theory_ser, wins)


def test_am_demod_output_quality():
    """AM envelope detection at 30 dB SNR recovers the message with
    >25 dB output SNR."""
    rng = np.random.default_rng(2)
    fs = 48_000.0
    n = 1 << 16
    t = np.arange(n) / fs
    msg = 0.5 * np.sin(2 * np.pi * 1000.0 * t)
    x = ((1.0 + msg) + 0j).astype(np.complex64)
    noisy = awgn(x, 30.0, rng)
    insp = make_inspector("audio", fs)
    insp.set_config({"audio.demodulator": 1, "audio.sample-rate": int(fs),
                     "audio.cutoff": 4000.0, "agc.enabled": False})
    audio = np.asarray(insp.process(noisy[None, :])["samples"])[0][8000:]
    tt = np.arange(8000, n) / fs
    s = np.sin(2 * np.pi * 1000.0 * tt)
    c = np.cos(2 * np.pi * 1000.0 * tt)
    fit = 2 * np.mean(audio * s) * s + 2 * np.mean(audio * c) * c
    out_snr = 10 * np.log10(np.mean(fit ** 2) /
                            max(np.mean((audio - fit) ** 2), 1e-30))
    assert out_snr > 25.0, out_snr
