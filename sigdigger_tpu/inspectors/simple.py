"""The "raw" and "power" inspector classes.

- raw:   passthrough of channel baseband with optional AGC — feeds the
  TimeWindow capture path (reference Default/Inspection/
  InspToolWidget.cpp:558-628) and raw recording.
- power: RMS time series with an integration window — feeds
  RMSInspector (reference Default/RMSInspector/RMSInspector.cpp:40-80).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from sigdigger_tpu.dsp.agc import AGC, AGCParams
from sigdigger_tpu.inspectors.base import Inspector, register_inspector


@register_inspector
class RawInspector(Inspector):
    class_name = "raw"

    def _build(self) -> None:
        self._agc = (
            AGC(self.channels, AGCParams(tau=self.config["agc.ts"]))
            if self.config["agc.enabled"] else None
        )
        self._gain = float(self.config["agc.gain"])

    def process(self, x) -> dict[str, Any]:
        x = jnp.asarray(x, jnp.complex64)
        if self._agc is not None:
            y = self._agc(x)
        else:
            y = x * self._gain
        return {"samples": y}


@register_inspector
class PowerInspector(Inspector):
    class_name = "power"

    def _build(self) -> None:
        self._n_int = max(1, int(self.config["power.integrate-samples"]))
        self._acc = np.zeros(self.channels, np.float64)   # partial sum
        self._cnt = 0

    def process(self, x) -> dict[str, Any]:
        """Returns RMS points: sqrt(mean |x|^2) over each full
        integration window; partial windows carry across blocks."""
        x = np.asarray(x)
        if x.ndim == 1:
            x = x[None, :]
        p = (x.real.astype(np.float64) ** 2 + x.imag.astype(np.float64) ** 2)
        t = x.shape[1]
        out = []
        pos = 0
        while pos < t:
            take = min(self._n_int - self._cnt, t - pos)
            self._acc += p[:, pos:pos + take].sum(axis=1)
            self._cnt += take
            pos += take
            if self._cnt == self._n_int:
                out.append(np.sqrt(self._acc / self._n_int))
                self._acc = np.zeros(self.channels, np.float64)
                self._cnt = 0
        samples = (np.stack(out, axis=1) if out
                   else np.zeros((x.shape[0], 0)))
        return {"samples": samples.astype(np.float32)}
