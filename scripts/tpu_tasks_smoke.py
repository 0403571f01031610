"""On-chip proof for the offline-task PSD routing (r4 VERDICT item 7).

Runs CarrierDetector, DopplerCalculator, the in-channel estimators and
the CLI ``psd`` spectrum path with their "auto" estimator on the real
TPU — the FFT-heavy transforms execute the Bailey DFT-matmul Pallas
kernel (tasks/psdutil.py); there is no np.fft fallback on this
backend.  Output committed as scripts/tpu_tasks_smoke.out.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sigdigger_tpu.utils.compile_cache import enable  # noqa: E402

enable()

import jax  # noqa: E402

assert jax.default_backend() in ("tpu", "axon"), jax.default_backend()

from sigdigger_tpu.analyzer.estimators import (  # noqa: E402
    estimate_baud,
    estimate_offset,
)
from sigdigger_tpu.tasks.carrier import CarrierDetector  # noqa: E402
from sigdigger_tpu.tasks.doppler import DopplerCalculator  # noqa: E402
from sigdigger_tpu.tasks.psdutil import (  # noqa: E402
    pallas_mean_psd,
    use_pallas,
)

assert use_pallas("auto")

fs = 100_000.0
f0 = 12_345.6
n = 8192
k = np.arange(n)
x = np.exp(2j * np.pi * (f0 / fs) * k).astype(np.complex64)

det = CarrierDetector(x, fs)
st = det.run()
assert st.error is None, st.error

dop = DopplerCalculator(x, fs, 437e6)
st2 = dop.run()
assert st2.error is None, st2.error
lam = 299_792_458.0 / 437e6

t = k / fs
sym = np.sign(np.sin(2 * np.pi * 500.0 * t) + 0.3)
y = (sym * np.exp(2j * np.pi * 700.0 * t)).astype(np.complex64)
baud = estimate_baud(y, fs)
off = estimate_offset(y, fs)

spec = pallas_mean_psd(x, fs, fft_size=4096)
peak_bin = int(np.argmax(np.fft.fftshift(spec)))
peak_hz = (peak_bin - 2048) * fs / 4096

print(json.dumps({
    "backend": jax.default_backend(),
    "carrier_est_hz": round(det.result, 1),
    "carrier_true_hz": f0,
    "doppler_v_mps": round(st2.result.center_velocity, 2),
    "doppler_v_true_mps": round(-f0 * lam, 2),
    "baud_est_hz": None if baud is None else round(baud, 1),
    "offset_est_hz": None if off is None else round(off, 1),
    "cli_psd_peak_hz": round(peak_hz, 1),
}))
assert abs(det.result - f0) < 30.0
assert abs(peak_hz - f0) < fs / 4096 * 1.5
print("TPU offline-task PSD routing OK")
