"""Analog TV line processor — the `su_tv_processor_t` equivalent.

The reference decodes analog video by locking to horizontal sync pulses
and stacking lines into frames (reference Default/GenericInspector/
TVProcessorWorker.h:36-76 drives `su_tv_processor_t` from demodulated
luminance).  This implementation:

- detects hsync as runs of samples below a sync threshold with
  approximately the expected spacing,
- tracks line period/phase with a proportional loop (a software
  flywheel, tolerant of missing pulses),
- resamples each line to a fixed pixel count (vectorized gather) and
  stacks ``lines_per_frame`` lines into frames,
- detects vsync as extended sync intervals to reset the frame row.

Works on blocks; state carries across calls.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class TVProcessorParams:
    sample_rate: float
    line_rate: float = 15625.0        # PAL: 625 lines × 25 fps
    lines_per_frame: int = 312        # one field
    pixels_per_line: int = 384
    sync_level: float = 0.15          # normalized threshold
    sync_min_fraction: float = 0.03   # hsync width ≳ 3% of a line
    vsync_fraction: float = 0.3       # sync longer than this → vsync
    loop_gain: float = 0.1
    invert: bool = False              # True when sync is at max level

    @property
    def samples_per_line(self) -> float:
        return self.sample_rate / self.line_rate


class TVProcessor:
    def __init__(self, params: TVProcessorParams) -> None:
        self.p = params
        self._phase = 0.0                  # samples into current line
        self._period = params.samples_per_line
        self._row = 0
        self._frame = np.zeros(
            (params.lines_per_frame, params.pixels_per_line), np.float32)
        self._carry = np.zeros(0, np.float32)
        self.frames: list[np.ndarray] = []
        self._agc_lo = 0.0
        self._agc_hi = 1.0

    def _normalize(self, x: np.ndarray) -> np.ndarray:
        lo = np.percentile(x, 1)
        hi = np.percentile(x, 99)
        self._agc_lo += 0.2 * (lo - self._agc_lo)
        self._agc_hi += 0.2 * (hi - self._agc_hi)
        span = max(self._agc_hi - self._agc_lo, 1e-9)
        v = (x - self._agc_lo) / span
        return 1.0 - v if self.p.invert else v

    def feed(self, samples: np.ndarray) -> list[np.ndarray]:
        """Feed demodulated luminance; returns any completed frames."""
        p = self.p
        x = np.concatenate([self._carry,
                            np.asarray(samples, np.float32)])
        v = self._normalize(x)
        spl = self._period
        done: list[np.ndarray] = []

        # sync runs below threshold
        sync = v < p.sync_level
        edges = np.flatnonzero(np.diff(sync.astype(np.int8)))
        starts = edges[::2] + 1 if not sync[0] else \
            np.concatenate([[0], edges[1::2] + 1])
        pos = 0.0
        # consume whole lines while enough samples remain
        while pos + spl * 1.5 < len(v):
            # expected sync near pos; search a window around it
            lo = int(max(0, pos - 0.1 * spl))
            hi = int(min(len(v), pos + 0.1 * spl))
            window = sync[lo:hi]
            if window.any():
                first = lo + int(np.argmax(window))
                # measure sync length for vsync detection
                end = first
                while end < len(sync) and sync[end]:
                    end += 1
                sync_len = end - first
                err = first - pos
                self._period = float(np.clip(
                    self._period + p.loop_gain * err * 0.05,
                    0.9 * p.samples_per_line, 1.1 * p.samples_per_line))
                pos = float(first)               # lock to measured edge
                if sync_len > p.vsync_fraction * spl:
                    # vsync: restart frame
                    if self._row > p.lines_per_frame // 2:
                        done.append(self._frame.copy())
                    self._row = 0
                    pos = end
                    continue
            # slice one line starting at pos (after sync)
            line_start = pos + p.sync_min_fraction * spl * 2
            idx = line_start + np.arange(p.pixels_per_line) * \
                (spl * 0.85 / p.pixels_per_line)
            ii = np.clip(idx.astype(np.int64), 0, len(v) - 1)
            self._frame[self._row] = v[ii]
            self._row += 1
            if self._row >= p.lines_per_frame:
                done.append(self._frame.copy())
                self._row = 0
            pos += self._period

        keep_from = int(max(0, pos - 2 * spl))
        self._carry = x[keep_from:]
        self._phase = pos - keep_from
        self.frames.extend(done)
        return done
