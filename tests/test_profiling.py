"""Timing utilities: Stopwatch ring stats + TickTimer fixed timestep."""

import time

from livevisionkit_tpu.utils.profiling import Stopwatch, TickTimer


def test_stopwatch_average_deviation():
    sw = Stopwatch(history=4)
    for _ in range(6):  # ring: only last 4 retained
        sw.start()
        sw.stop()
    assert sw.count == 4
    assert sw.average() >= 0.0
    assert sw.deviation() >= 0.0


def test_ticktimer_delta_mode():
    t = TickTimer()
    d0 = t.tick()
    assert d0 == 0.0  # first tick has no previous
    time.sleep(0.01)
    d1 = t.tick()
    assert 0.005 < d1 < 1.0
    assert t.tick_count == 2


def test_ticktimer_fixed_timestep():
    t = TickTimer()
    t.tick(10.0)  # arm; huge timestep never elapses
    assert t.tick(10.0) is False
    t.reset()
    t.tick(0.0)  # zero timestep: every tick fires
    time.sleep(0.001)
    assert t.tick(1e-9) is True


def test_device_trace_captures_scopes(tmp_path):
    """jax.profiler trace integration (reference LVK_PROFILE /
    ScopedProfiler.cpp:26-37): DeviceTrace captures a trace directory with
    frame/scope annotations; scopes are no-ops when inactive."""
    import jax.numpy as jnp

    from livevisionkit_tpu.utils.profiling import (
        DeviceTrace,
        frame_scope,
        trace_scope,
    )

    # Inactive: plain no-op context managers.
    with frame_scope(0), trace_scope("tracker"):
        pass

    logdir = str(tmp_path / "trace")
    try:
        with DeviceTrace(logdir):
            for t in range(3):
                with frame_scope(t):
                    with trace_scope("work"):
                        jnp.sum(jnp.ones((64, 64)) * t).block_until_ready()
    except Exception as e:  # profiler backend unavailable in some builds
        import pytest

        pytest.skip(f"jax.profiler trace unsupported here: {e}")
    import os

    found = []
    for root, _, files in os.walk(logdir):
        found.extend(files)
    assert found, "trace produced no files"
