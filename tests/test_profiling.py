"""Metering/profiling utilities."""

import time

from sigdigger_tpu.utils.profiling import SampleRateMeter, StageTimer


def test_sample_rate_meter():
    m = SampleRateMeter(alpha=1.0)
    m.feed(1000)
    time.sleep(0.05)
    rate = m.feed(1000)
    assert 10_000 < rate < 40_000
    assert m.total == 2000


def test_stage_timer():
    t = StageTimer()
    with t.stage("frame"):
        time.sleep(0.01)
    with t.stage("frame"):
        time.sleep(0.01)
    with t.stage("device"):
        pass
    rep = t.report()
    assert rep["frame"]["calls"] == 2
    assert rep["frame"]["mean_ms"] >= 9.0
    assert "device" in rep
