"""Pins for bench.py's noise-robust pin gate (r7; median draws since r8).

The gate itself must be trustworthy: a breach always collects the full
draw count and records the MEDIAN (never the min — VERDICT r7 wrong #2:
min-of-draws was a downward-biased estimator invoked exactly when the
number looked bad), every redraw must be disclosed, non-pinned /
non-redrawable entries must never be touched, and a genuine repeat-breach
must still flag.  Spark-free — the rerun callable is injected.
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
    # a breach always collects the full draw count (no early stop: the
    # median needs all three)
    assert calls == ["q", "q"]
    assert timings["q"] == 0.23  # median of [0.45, 0.23, 0.23]
    assert redraws == {"q": [0.45, 0.23, 0.23]}


def test_real_regression_breaches_every_draw_and_still_flags():
    timings = {"q": 0.9}
    pins = {"q": 0.2}
    draws_given = iter([0.85, 0.88])

    def rerun(name):
        return next(draws_given)

    redraws = redraw_pin_breaches(timings, pins, ["q"], rerun)
    # median recorded, still > 2x pin -> the caller's regressions
    # computation will flag it
    assert redraws == {"q": [0.9, 0.85, 0.88]}
    assert timings["q"] == 0.88
    assert timings["q"] > 2.0 * pins["q"]


def test_median_not_min_is_recorded():
    """The unbiasedness property the r8 gate exists for: one fast outlier
    among the redraws must NOT become the recorded number."""
    timings = {"q": 0.5}
    pins = {"q": 0.2}
    draws_given = iter([0.1, 0.48])

    def rerun(name):
        return next(draws_given)

    redraws = redraw_pin_breaches(timings, pins, ["q"], rerun)
    assert redraws == {"q": [0.5, 0.1, 0.48]}
    assert timings["q"] == 0.48  # the median draw, not the lucky 0.1 min


def test_slow_redraws_raise_the_recorded_time():
    """Symmetry of the median: if the redraws come back SLOWER, the
    recorded time goes up — the gate no longer shops for the best draw."""
    timings = {"q": 0.5}
    pins = {"q": 0.2}

    def rerun(name):
        return 9.9

    redraw_pin_breaches(timings, pins, ["q"], rerun)
    assert timings["q"] == 9.9  # median of [0.5, 9.9, 9.9]


def test_odd_max_redraws_still_records_an_actual_draw():
    """ADVICE r8 (low): an odd ``max_redraws`` gives an EVEN draw count,
    where plain ``median`` would average the two middle draws — a number
    nobody observed.  ``median_high`` keeps the recorded value a real
    draw and picks the SLOWER middle one (conservative: biased against
    hiding a regression)."""
    timings = {"q": 0.5}
    pins = {"q": 0.2}
    draws_given = iter([0.30, 0.44, 0.46])

    def rerun(name):
        return next(draws_given)

    redraws = redraw_pin_breaches(timings, pins, ["q"], rerun, max_redraws=3)
    assert redraws == {"q": [0.5, 0.30, 0.44, 0.46]}
    # sorted draws [0.30, 0.44, 0.46, 0.5]: median_high = 0.46 (an actual
    # observed draw), NOT (0.44 + 0.46) / 2 = 0.45 (observed by nobody)
    assert timings["q"] == 0.46


def test_passing_entry_is_never_redrawn():
    timings = {"q": 0.39}
    pins = {"q": 0.2}

    def rerun(name):
        raise AssertionError("must not redraw a passing entry")

    assert redraw_pin_breaches(timings, pins, ["q"], rerun) == {}
    assert timings["q"] == 0.39


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
