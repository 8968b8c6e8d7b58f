"""Pins for bench.py's noise-robust pin gate (r7).

The gate itself must be trustworthy: a redraw may only LOWER a recorded
time, every redraw must be disclosed, non-pinned / non-redrawable entries
must never be touched, and a genuine repeat-breach must still flag.
Spark-free — the rerun callable is injected.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import redraw_pin_breaches


def test_noise_blip_is_redrawn_and_passes():
    timings = {"q": 0.45}
    pins = {"q": 0.221}
    calls = []

    def rerun(name):
        calls.append(name)
        return 0.23

    redraws = redraw_pin_breaches(timings, pins, ["q"], rerun)
    assert calls == ["q"]  # stopped after the first passing draw
    assert timings["q"] == 0.23
    assert redraws == {"q": [0.45, 0.23]}


def test_real_regression_breaches_every_draw_and_still_flags():
    timings = {"q": 0.9}
    pins = {"q": 0.2}
    draws_given = iter([0.85, 0.88])

    def rerun(name):
        return next(draws_given)

    redraws = redraw_pin_breaches(timings, pins, ["q"], rerun)
    # max_redraws=2 exhausted, min recorded, still > 2x pin -> the caller's
    # regressions computation will flag it
    assert redraws == {"q": [0.9, 0.85, 0.88]}
    assert timings["q"] == 0.85
    assert timings["q"] > 2.0 * pins["q"]


def test_redraw_never_raises_a_recorded_time():
    timings = {"q": 0.5}
    pins = {"q": 0.2}

    def rerun(name):
        return 9.9  # redraw slower than the original draw

    redraw_pin_breaches(timings, pins, ["q"], rerun)
    assert timings["q"] == 0.5  # min of the draws, never the worse redraw


def test_passing_unpinned_and_unredrawable_entries_untouched():
    timings = {"ok": 0.3, "unpinned": 5.0, "b1_append_validate": 99.0}
    pins = {"ok": 0.2, "b1_append_validate": 4.8}
    called = []

    def rerun(name):
        called.append(name)
        return 0.0

    # b1 breaches its pin but is NOT in the redrawable list (stateful)
    redraws = redraw_pin_breaches(timings, pins, ["ok", "unpinned"], rerun)
    assert called == []
    assert redraws == {}
    assert timings == {"ok": 0.3, "unpinned": 5.0, "b1_append_validate": 99.0}
