"""ALSA + SoapySDR ctypes bindings, driven against mock shared
libraries compiled at test time — exercises the real FFI path (struct
layouts, argtypes, buffer ownership) without hardware.

Mirrors: reference Audio/AlsaPlayer.cpp (open/set_params/writei/EPIPE
recovery) and the SoapySDR capture flow behind
include/Suscan/Source.h:69-120.
"""

from __future__ import annotations

import ctypes
import subprocess

import numpy as np
import pytest

from sigdigger_tpu.audio.alsa import AlsaPlayer
from sigdigger_tpu.audio.alsa import _declare as _declare_alsa
from sigdigger_tpu.device import DeviceFacade
from sigdigger_tpu.profiles import SourceProfile
from sigdigger_tpu.sources.soapy import (
    SoapySource,
    enumerate_devices,
    soapy_discoverer,
)
from sigdigger_tpu.sources.soapy import _declare as _declare_soapy

_ALSA_MOCK = r"""
#include <string.h>
#include <stdlib.h>

static long total_frames = 0;
static int fail_next = 0;   /* emit one -EPIPE to test recovery */
static int recovered = 0;
static unsigned got_rate = 0;
static int got_format = -1, got_access = -1;
static float last_sample = 0.0f;

int snd_pcm_open(void **pcm, const char *name, int stream, int mode) {
    *pcm = (void *)0x1; return 0;
}
int snd_pcm_set_params(void *pcm, int format, int access,
                       unsigned channels, unsigned rate,
                       int soft_resample, unsigned latency_us) {
    got_format = format; got_access = access; got_rate = rate;
    return 0;
}
long snd_pcm_writei(void *pcm, const void *buf, unsigned long frames) {
    if (fail_next) { fail_next = 0; return -32; /* -EPIPE */ }
    unsigned long n = frames > 64 ? 64 : frames; /* force partial writes */
    total_frames += (long)n;
    if (n) last_sample = ((const float *)buf)[n - 1];
    return (long)n;
}
int snd_pcm_recover(void *pcm, int err, int silent) {
    recovered++; return 0;
}
int snd_pcm_drain(void *pcm) { return 0; }
int snd_pcm_close(void *pcm) { return 0; }
const char *snd_strerror(int e) { return "mock error"; }

/* test hooks */
long mock_total(void) { return total_frames; }
int mock_recovered(void) { return recovered; }
void mock_fail_next(void) { fail_next = 1; }
unsigned mock_rate(void) { return got_rate; }
int mock_format(void) { return got_format; }
float mock_last_sample(void) { return last_sample; }
"""

_SOAPY_MOCK = r"""
#include <string.h>
#include <stdlib.h>
#include <math.h>

typedef struct { size_t size; char **keys; char **vals; } Kwargs;
typedef struct { double minimum, maximum, step; } Range;

static char *k0[] = {(char*)"driver", (char*)"label",
                     (char*)"serial"};
static char *v0[] = {(char*)"mocksdr", (char*)"Mock SDR #0",
                     (char*)"0001"};
static Kwargs devs[1];

static double cur_rate = 0, cur_freq = 0, cur_gain = -1;
static char cur_antenna[32] = "";
static int activated = 0, deactivated = 0, closed = 0, unmade = 0;
static long sample_counter = 0;
static int timeout_next = 0;

Kwargs *SoapySDRDevice_enumerate(const Kwargs *args, size_t *length) {
    devs[0].size = 3; devs[0].keys = k0; devs[0].vals = v0;
    *length = 1;
    return devs;
}
void SoapySDRKwargsList_clear(Kwargs *args, size_t length) {}
void *SoapySDRDevice_makeStrArgs(const char *args) {
    if (strstr(args, "driver=mocksdr") == NULL) return NULL;
    return (void *)0x2;
}
int SoapySDRDevice_unmake(void *dev) { unmade++; return 0; }
int SoapySDRDevice_setSampleRate(void *d, int dir, size_t ch, double r) {
    cur_rate = r; return 0;
}
int SoapySDRDevice_setFrequency(void *d, int dir, size_t ch, double f,
                                const Kwargs *kw) {
    cur_freq = f; return 0;
}
int SoapySDRDevice_setGain(void *d, int dir, size_t ch, double g) {
    cur_gain = g; return 0;
}
int SoapySDRDevice_setGainElement(void *d, int dir, size_t ch,
                                  const char *n, double g) {
    cur_gain = g; return 0;
}
int SoapySDRDevice_setAntenna(void *d, int dir, size_t ch,
                              const char *n) {
    strncpy(cur_antenna, n, 31); return 0;
}
char **SoapySDRDevice_listGains(void *d, int dir, size_t ch,
                                size_t *length) {
    static char *names[] = {(char*)"LNA", (char*)"VGA"};
    *length = 2; return names;
}
Range SoapySDRDevice_getGainElementRange(void *d, int dir, size_t ch,
                                         const char *n) {
    Range r; r.minimum = 0.0; r.maximum = 40.0; r.step = 0.5; return r;
}
void *SoapySDRDevice_setupStream(void *d, int dir, const char *fmt,
                                 const size_t *chans, size_t n,
                                 const Kwargs *kw) {
    if (strcmp(fmt, "CF32") != 0) return NULL;
    return (void *)0x3;
}
int SoapySDRDevice_activateStream(void *d, void *s, int flags,
                                  long long t, size_t n) {
    activated++; return 0;
}
int SoapySDRDevice_deactivateStream(void *d, void *s, int flags,
                                    long long t) {
    deactivated++; return 0;
}
int SoapySDRDevice_closeStream(void *d, void *s) { closed++; return 0; }
int SoapySDRDevice_readStream(void *d, void *s, void *const *buffs,
                              size_t numElems, int *flags,
                              long long *timeNs, long timeoutUs) {
    if (timeout_next) { timeout_next = 0; return -1; /* TIMEOUT */ }
    /* deterministic ramp so the test can check data integrity; cap at
       100 elems to exercise the short-read accumulation loop */
    size_t n = numElems > 100 ? 100 : numElems;
    float *out = (float *)buffs[0];
    for (size_t i = 0; i < n; i++) {
        out[2 * i] = (float)(sample_counter + (long)i);
        out[2 * i + 1] = -(float)(sample_counter + (long)i);
    }
    sample_counter += (long)n;
    return (int)n;
}
const char *SoapySDRDevice_lastError(void) { return "mock soapy error"; }

/* test hooks */
double mock_rate(void) { return cur_rate; }
double mock_freq(void) { return cur_freq; }
double mock_gain(void) { return cur_gain; }
const char *mock_antenna(void) { return cur_antenna; }
int mock_unmade(void) { return unmade; }
int mock_closed(void) { return closed; }
void mock_timeout_next(void) { timeout_next = 1; }
"""


def _build(tmp_path, name: str, source: str) -> str:
    src = tmp_path / f"{name}.c"
    so = tmp_path / f"lib{name}.so"
    src.write_text(source)
    subprocess.run(
        ["gcc", "-shared", "-fPIC", "-O1", "-o", str(so), str(src)],
        check=True, capture_output=True)
    return str(so)


@pytest.fixture(scope="module")
def alsa_lib(tmp_path_factory):
    path = _build(tmp_path_factory.mktemp("alsa"), "asoundmock",
                  _ALSA_MOCK)
    lib = ctypes.CDLL(path)
    _declare_alsa(lib)
    lib.mock_total.restype = ctypes.c_long
    lib.mock_rate.restype = ctypes.c_uint
    lib.mock_last_sample.restype = ctypes.c_float
    return lib


@pytest.fixture(scope="module")
def soapy_lib(tmp_path_factory):
    path = _build(tmp_path_factory.mktemp("soapy"), "soapymock",
                  _SOAPY_MOCK)
    lib = ctypes.CDLL(path)
    _declare_soapy(lib)
    lib.mock_rate.restype = ctypes.c_double
    lib.mock_freq.restype = ctypes.c_double
    lib.mock_gain.restype = ctypes.c_double
    lib.mock_antenna.restype = ctypes.c_char_p
    return lib


class TestAlsa:
    def test_open_params_and_partial_writes(self, alsa_lib):
        player = AlsaPlayer(48_000, lib=alsa_lib)
        assert alsa_lib.mock_rate() == 48_000
        assert alsa_lib.mock_format() == 14      # FLOAT_LE
        before = alsa_lib.mock_total()
        samples = np.linspace(-1, 1, 1000, dtype=np.float32)
        player.play(samples)                     # forces >1 writei call
        assert alsa_lib.mock_total() - before == 1000
        assert alsa_lib.mock_last_sample() == pytest.approx(1.0)
        player.close()

    def test_underrun_recovery(self, alsa_lib):
        player = AlsaPlayer(8_000, lib=alsa_lib)
        alsa_lib.mock_fail_next()
        player.play(np.zeros(64, np.float32))
        assert player.underruns == 1
        assert alsa_lib.mock_recovered() >= 1
        player.close()


class TestSoapy:
    def test_enumerate(self, soapy_lib):
        devs = enumerate_devices(soapy_lib)
        assert devs == [{"driver": "mocksdr", "label": "Mock SDR #0",
                         "serial": "0001"}]

    def test_discoverer_gain_ranges(self, soapy_lib):
        props = soapy_discoverer(soapy_lib)
        assert len(props) == 1
        assert props[0].driver == "soapysdr"
        assert props[0].label == "Mock SDR #0"
        assert [g.name for g in props[0].gains] == ["LNA", "VGA"]
        assert props[0].gains[0].max == 40.0

    def test_facade_integration(self, soapy_lib):
        facade = DeviceFacade.instance()
        facade.register_discoverer(lambda: soapy_discoverer(soapy_lib))
        uuids = [d.uuid for d in facade.devices()]
        assert any(u.startswith("soapysdr:") for u in uuids)

    def _profile(self):
        return SourceProfile(
            type="soapysdr", sample_rate=1_000_000, freq=100e6,
            antenna="RX", gains={"LNA": 20.0},
            device={"driver": "mocksdr", "serial": "0001"})

    def test_capture_configures_and_reads(self, soapy_lib):
        src = SoapySource(self._profile(), lib=soapy_lib)
        assert soapy_lib.mock_rate() == 1_000_000.0
        assert soapy_lib.mock_freq() == 100e6
        assert soapy_lib.mock_gain() == 20.0
        assert soapy_lib.mock_antenna() == b"RX"
        soapy_lib.mock_timeout_next()            # survives a timeout
        x = src.read(256)                        # > one 100-elem chunk
        assert x.dtype == np.complex64
        # mock emits ramp re=k, im=-k — verify contiguity across the
        # short-read accumulation loop
        start = x[0].real
        expect = start + np.arange(256, dtype=np.float32)
        np.testing.assert_allclose(x.real, expect)
        np.testing.assert_allclose(x.imag, -expect)
        src.close()
        assert soapy_lib.mock_closed() >= 1
        assert soapy_lib.mock_unmade() >= 1

    def test_lnb_offset(self, soapy_lib):
        prof = self._profile()
        prof.lnb_freq = 9_750e6
        prof.freq = 10_000e6
        src = SoapySource(prof, lib=soapy_lib)
        assert soapy_lib.mock_freq() == pytest.approx(250e6)
        src.close()


# ---------------------------------------------------------------------------
# PortAudio backend against a compiled mock libportaudio
# (reference Audio/PortAudioPlayer.cpp; runtime order ALSA→PortAudio→Null)
# ---------------------------------------------------------------------------

_PA_MOCK = r"""
#include <string.h>

typedef struct {
    int structVersion; const char *name; int hostApi;
    int maxInputChannels; int maxOutputChannels;
    double defaultLowInputLatency, defaultLowOutputLatency;
    double defaultHighInputLatency, defaultHighOutputLatency;
    double defaultSampleRate;
} PaDeviceInfo;

typedef struct {
    int device; int channelCount; unsigned long sampleFormat;
    double suggestedLatency; void *hostApiSpecificStreamInfo;
} PaStreamParameters;

static int inited = 0, started = 0, underflow_next = 0;
static long total = 0;
static double got_rate = 0; static unsigned long got_fmt = 0;
static int got_device = -1; static float last_sample = 0;
static PaDeviceInfo devs[2] = {
    {2, "Mock Output", 0, 0, 2, 0.01, 0.01, 0.1, 0.1, 48000.0},
    {2, "USB Thing", 0, 0, 1, 0.01, 0.01, 0.1, 0.1, 44100.0},
};

int Pa_Initialize(void) { inited = 1; return 0; }
int Pa_Terminate(void) { inited = 0; return 0; }
int Pa_GetDeviceCount(void) { return 2; }
int Pa_GetDefaultOutputDevice(void) { return 0; }
const PaDeviceInfo *Pa_GetDeviceInfo(int i) {
    if (i < 0 || i > 1) return 0;
    return &devs[i];
}
int Pa_OpenStream(void **stream, const PaStreamParameters *in,
                  const PaStreamParameters *out, double rate,
                  unsigned long fpb, unsigned long flags,
                  void *cb, void *user) {
    if (!inited || in != 0 || out == 0) return -10000;
    got_rate = rate; got_fmt = out->sampleFormat;
    got_device = out->device;
    *stream = (void *)0x2; return 0;
}
int Pa_StartStream(void *s) { started = 1; return 0; }
int Pa_WriteStream(void *s, const void *buf, unsigned long frames) {
    const float *f = (const float *)buf;
    total += frames;
    if (frames) last_sample = f[frames - 1];
    if (underflow_next) { underflow_next = 0; return -9980; }
    return 0;
}
int Pa_StopStream(void *s) { started = 0; return 0; }
int Pa_CloseStream(void *s) { return 0; }
const char *Pa_GetErrorText(int e) { return "mock pa error"; }

long pa_mock_total(void) { return total; }
double pa_mock_rate(void) { return got_rate; }
unsigned long pa_mock_fmt(void) { return got_fmt; }
int pa_mock_device(void) { return got_device; }
float pa_mock_last(void) { return last_sample; }
void pa_mock_underflow_next(void) { underflow_next = 1; }
int pa_mock_inited(void) { return inited; }
"""


@pytest.fixture(scope="module")
def pa_lib(tmp_path_factory):
    from sigdigger_tpu.audio.portaudio import _declare as _declare_pa

    path = _build(tmp_path_factory.mktemp("pa"), "pamock", _PA_MOCK)
    lib = ctypes.CDLL(path)
    _declare_pa(lib)
    lib.pa_mock_total.restype = ctypes.c_long
    lib.pa_mock_rate.restype = ctypes.c_double
    lib.pa_mock_fmt.restype = ctypes.c_ulong
    lib.pa_mock_last.restype = ctypes.c_float
    return lib


def test_portaudio_open_params_and_write(pa_lib):
    from sigdigger_tpu.audio.portaudio import PA_FLOAT32, PortAudioPlayer

    p = PortAudioPlayer(48000, lib=pa_lib)
    assert pa_lib.pa_mock_inited() == 1
    assert pa_lib.pa_mock_rate() == 48000.0
    assert pa_lib.pa_mock_fmt() == PA_FLOAT32
    assert pa_lib.pa_mock_device() == 0        # default output
    samples = np.linspace(-0.5, 0.5, 480).astype(np.float32)
    p.play(samples)
    assert pa_lib.pa_mock_total() == 480
    assert abs(pa_lib.pa_mock_last() - 0.5) < 1e-6
    p.close()


def test_portaudio_device_by_name_and_underflow(pa_lib):
    from sigdigger_tpu.audio.portaudio import PortAudioPlayer

    p = PortAudioPlayer(44100, device="USB", lib=pa_lib)
    assert pa_lib.pa_mock_device() == 1
    pa_lib.pa_mock_underflow_next()
    p.play(np.zeros(128, np.float32))          # swallowed underflow
    assert p.underruns == 1
    p.play(np.zeros(128, np.float32))
    assert p.underruns == 1
    p.close()


def test_portaudio_unknown_device_raises(pa_lib):
    from sigdigger_tpu.audio.portaudio import (
        PortAudioError,
        PortAudioPlayer,
    )

    with pytest.raises(PortAudioError):
        PortAudioPlayer(48000, device="nope-no-such", lib=pa_lib)


def test_portaudio_playback_pump_integration(pa_lib):
    """Full AudioPlayback pump draining into the PortAudio backend."""
    import time as _t

    from sigdigger_tpu.audio.playback import AudioPlayback
    from sigdigger_tpu.audio.portaudio import PortAudioPlayer

    before = pa_lib.pa_mock_total()
    pb = AudioPlayback(8000, player=PortAudioPlayer(8000, lib=pa_lib))
    pb.write(np.ones(4096, np.float32))
    for _ in range(100):
        if pa_lib.pa_mock_total() - before >= 4096:
            break
        _t.sleep(0.02)
    pb.close()
    assert pa_lib.pa_mock_total() - before >= 2048
