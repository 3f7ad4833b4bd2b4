"""DispatchWatch: degraded-session detection from host clocks
(SURVEY §5.3 failure-detection analog; PERF_NOTES.md failure mode)."""

import logging

from badslam_tpu.utils.watchdog import DispatchWatch


def _watch(**kw):
    kw.setdefault("warmup", 3)
    kw.setdefault("patience", 2)
    kw.setdefault("ratio", 50.0)
    kw.setdefault("floor_s", 0.05)
    return DispatchWatch("test", **kw)


def test_learns_baseline_and_stays_quiet_on_fast_samples():
    w = _watch()
    for _ in range(50):
        assert not w.sample(0.001)
    assert not w.tripped
    assert abs(w.baseline - 0.001) < 1e-9


def test_trips_once_on_sustained_slowdown(caplog):
    w = _watch()
    for _ in range(5):
        w.sample(0.001)
    with caplog.at_level(logging.WARNING, logger="badslam_tpu"):
        assert not w.sample(1.0)          # patience absorbs the first
        assert w.sample(1.0)              # second consecutive -> trip
        assert w.tripped
        assert not w.sample(1.0)          # warns ONCE only
    assert sum("DEGRADED" in r.message for r in caplog.records) == 1


def test_single_spike_does_not_trip():
    w = _watch()
    for _ in range(5):
        w.sample(0.001)
    assert not w.sample(2.0)              # GC pause / queue spike
    for _ in range(10):
        assert not w.sample(0.001)
    assert not w.tripped


def test_absolute_floor_suppresses_microsecond_jitter():
    # 1 us -> 300 us is a 300x ratio but far below any real degradation.
    w = _watch()
    for _ in range(5):
        w.sample(1e-6)
    for _ in range(10):
        assert not w.sample(3e-4)
    assert not w.tripped


def test_no_trip_during_warmup():
    w = _watch(warmup=10)
    for _ in range(10):
        assert not w.sample(5.0)          # cold compiles look slow
    assert not w.tripped
