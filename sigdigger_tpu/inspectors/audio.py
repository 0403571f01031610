"""The "audio" inspector: AM / FM / USB / LSB / RAW voice demodulation.

Behavioral contract of the engine-side audio inspector that
AudioProcessor drives (reference Default/Audio/AudioProcessor.cpp:
95-169 open flow, 251-269 config push of audio.{cutoff,volume,
sample-rate,demodulator,squelch,squelch-level} + agc.{enabled,ts};
demod taxonomy AudioDemod {AM,FM,USB,LSB,RAW} reference
include/SigDiggerHelpers.h:39-45).

SSB convention: the analyzer opens the channel with its LO offset by
cutoff/2 into the selected sideband (reference AudioProcessor.cpp:
200-248), so here USB/LSB only shift the baseband back by ±cutoff/2 and
take the real part.
"""

from __future__ import annotations

import enum
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from sigdigger_tpu.dsp.agc import AGC, AGCParams
from sigdigger_tpu.dsp.filters import FirFilter, fir_lowpass
from sigdigger_tpu.dsp.ncqo import NCQO
from sigdigger_tpu.dsp.quad import QuadDemod
from sigdigger_tpu.dsp.resample import Resampler
from sigdigger_tpu.inspectors.base import Inspector, register_inspector


class AudioDemod(enum.IntEnum):
    """Wire values of the `audio.demodulator` key (reference
    Default/Audio/AudioProcessor.cpp:258 + SigDiggerHelpers)."""

    DISABLED = 0
    AM = 1
    FM = 2
    USB = 3
    LSB = 4
    RAW = 5


@register_inspector
class AudioInspector(Inspector):
    class_name = "audio"

    def _build(self) -> None:
        c = self.channels
        r = self.sample_rate
        cfg = self.config
        self.demod = AudioDemod(int(cfg["audio.demodulator"]))
        self.cutoff = float(cfg["audio.cutoff"])
        self.volume = float(cfg["audio.volume"])
        self.audio_rate = int(cfg["audio.sample-rate"])
        self.squelch = bool(cfg["audio.squelch"])
        self.squelch_level = float(cfg["audio.squelch-level"])

        self._agc = (AGC(c, AGCParams(tau=cfg["agc.ts"] * r / 1000.0))
                     if cfg["agc.enabled"] else None)
        self._quad = QuadDemod(c, gain=1.0 / np.pi)
        self._ssb_lo = NCQO(
            +self.cutoff / 2.0 if self.demod == AudioDemod.USB
            else -self.cutoff / 2.0, r,
        )
        cut = min(self.cutoff, 0.45 * r)
        self._lpf = FirFilter(fir_lowpass(63, 2.0 * cut / r), c)
        self._resamp = (Resampler(r, self.audio_rate, c)
                        if abs(r - self.audio_rate) > 1e-6 else None)
        self._dc = jnp.zeros(c, jnp.float32)        # AM DC follower
        self._sq_power = jnp.zeros(c, jnp.float32)  # squelch power EMA

    def process(self, x) -> dict[str, Any]:
        x = jnp.asarray(x, jnp.complex64)
        if x.ndim == 1:
            x = x[None, :]
        if self.demod == AudioDemod.DISABLED:
            z = jnp.zeros(
                (x.shape[0],
                 0 if self._resamp else x.shape[1]), jnp.float32)
            return {"samples": z, "squelch_open": np.ones(x.shape[0], bool)}

        # squelch decision on pre-AGC channel power (EMA over the block)
        power = jnp.mean(jnp.abs(x) ** 2, axis=1)
        self._sq_power = 0.5 * self._sq_power + 0.5 * power
        squelch_open = (np.asarray(self._sq_power) >= self.squelch_level
                        if self.squelch else np.ones(x.shape[0], bool))

        y = self._agc(x) if self._agc is not None else x

        if self.demod == AudioDemod.FM:
            a = self._quad(y)
        elif self.demod == AudioDemod.AM:
            mag = jnp.abs(y)
            # one-pole DC blocker per block (EMA carried across blocks)
            alpha = jnp.float32(0.9995)
            def dc_step(carry, m):
                carry = alpha * carry + (1 - alpha) * m
                return carry, m - carry
            self._dc, a = jax.lax.scan(dc_step, self._dc,
                                       jnp.transpose(mag))
            a = jnp.transpose(a)
        elif self.demod in (AudioDemod.USB, AudioDemod.LSB):
            a = jnp.real(self._ssb_lo.mix(y))
        else:  # RAW
            a = jnp.real(y)

        a = self._lpf(a.astype(jnp.complex64))
        if self._resamp is not None:
            a = self._resamp(a)
        audio = jnp.real(a) * self.volume
        if self.squelch:
            audio = audio * jnp.asarray(
                squelch_open[:, None], jnp.float32)
        return {"samples": audio, "squelch_open": squelch_open}
