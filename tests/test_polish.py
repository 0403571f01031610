"""Round-2 polish: FATs registry + PSD TTL/lag mediator."""

from __future__ import annotations

import numpy as np

from sigdigger_tpu.analyzer.mediator import PSDMediator
from sigdigger_tpu.analyzer.messages import PSDMessage
from sigdigger_tpu.library import (
    FrequencyAllocation,
    FrequencyAllocationTable,
    Library,
)


# -- FATs (reference include/Suscan/Library.h:316-332) -----------------------

def test_builtin_fat_lookup(tmp_path):
    lib = Library(config_dir=str(tmp_path))
    hits = lib.find_allocations(100.0e6)
    assert any(a.name == "FM broadcast" for a in hits)
    assert any(a.use == "ISM" for a in lib.find_allocations(433.92e6))
    assert lib.find_allocations(5.0e6) == []


def test_register_custom_fat(tmp_path):
    lib = Library(config_dir=str(tmp_path))
    fat = FrequencyAllocationTable("local", [
        FrequencyAllocation(400e6, 410e6, "test band", "test")])
    lib.register_fat(fat)
    assert [a.name for a in lib.find_allocations(405e6)] == ["test band"]
    # range query for spectrum overlays
    spans = lib.fats["general"].in_range(80e6, 150e6)
    names = {a.name for a in spans}
    assert {"FM broadcast", "Airband", "2 m amateur"} <= names


# -- PSD mediator (reference UIMediator/SpectrumMediator.cpp:31-135) ---------

def _msg(ts: float) -> PSDMessage:
    return PSDMessage(timestamp=ts, fft_size=16,
                      data=np.zeros(16, np.float32))


def test_fresh_messages_pass():
    med = PSDMediator(ttl_s=0.1)
    for k in range(5):
        assert med.feed(_msg(100.0 + k), now=100.0 + k + 0.01)
    assert med.dropped == 0


def test_stale_burst_dropped():
    med = PSDMediator(ttl_s=0.1)
    med.feed(_msg(100.0), now=100.02)         # calibrate lag ~20 ms
    # consumer stalls; a backlog of old frames arrives at now=103 —
    # every one of them is ≥1 s old, so all must be dropped
    backlog = [_msg(100.0 + 0.1 * k) for k in range(1, 21)]
    assert med.drain(backlog, now=103.0) is None
    assert med.dropped == 20
    # a genuinely fresh frame right after the stall is accepted
    assert med.feed(_msg(103.0), now=103.02) is not None


def test_remote_clock_skew_calibrated():
    """Sender clock 500 s AHEAD of ours: raw age is negative, but the
    mediator must still drop frames that are old relative to the
    stream, not accept everything."""
    med = PSDMediator(ttl_s=0.1)
    skew = -500.0                      # msg.timestamp = now - skew
    now = 1000.0
    for k in range(10):                # healthy stream calibrates lag
        t = now + 0.05 * k
        assert med.feed(_msg(t - skew), now=t) is not None
    # a frame generated 3 s ago (by the sender's clock) arrives late
    stale = _msg((now - 3.0) - skew)
    assert med.feed(stale, now=now + 0.5) is None
    assert med.lag_s < -499.0          # calibrated the negative skew


def test_lag_floor_leaks_with_drift():
    med = PSDMediator(ttl_s=0.05)
    # early burst sets a very low floor
    med.feed(_msg(10.0), now=10.001)
    # link slows permanently by 30 ms; the leak must re-admit traffic
    dropped_then_ok = []
    for k in range(100):
        t = 11.0 + 0.05 * k
        dropped_then_ok.append(
            med.feed(_msg(t), now=t + 0.06) is not None)
    assert dropped_then_ok[-1]         # eventually accepted again
