"""The evidence-rotation window is MECHANICAL, not builder discretion
(VERDICT-r10 task 3): tools/staleness.py::validate_window derives the
required WINDOW_PREFIX shape from the CORRECTNESS_r*.json history —
new/modified queries first, then only the oldest-checked rows — and
this suite both runs it against the committed prefix and proves it
BITES on a drifted prefix (swap a fill row for a fresher one, drop a
modified row from the head).

CONSUMED state (VERDICT-r11 task 1): after the driver lands
CORRECTNESS_r{N}.json and before the builder rotates, the committed
window equals the newest round's key set — it just did its job, it is
not drifted. validate_window recognizes that state and validates the
window against the history it was BUILT from (rounds <= N-1). The
negative controls here pin ``as_of_round`` to that same view so they
fail with the intended message whether the suite runs pre- or
post-driver-run.
"""

from __future__ import annotations

import pytest

from tools.staleness import latest_checks, newest_round_keys, validate_window


def _committed_view():
    """The as_of_round under which the COMMITTED window is a valid
    plan: the previous round when the window is consumed, the newest
    round otherwise."""
    import ebike_spark.plans.registry as reg

    reg._load_all()
    newest_rnd, newest_keys = newest_round_keys()
    if newest_keys and set(reg.WINDOW_PREFIX[:50]) == newest_keys:
        return newest_rnd - 1
    return newest_rnd


def test_committed_window_follows_rotation_rule():
    validate_window()


def test_consumed_state_is_detected_not_failed():
    """When the committed prefix equals the newest round's keys,
    validate_window must PASS and report consumed=True (the r11 judge
    ran the suite in exactly this state and it was red)."""
    import ebike_spark.plans.registry as reg

    reg._load_all()
    newest_rnd, newest_keys = newest_round_keys()
    if set(reg.WINDOW_PREFIX[:50]) != newest_keys:
        pytest.skip("window already rotated past the newest driver run")
    assert validate_window() is True


def _drifted(monkeypatch, mutate):
    import ebike_spark.plans.registry as reg

    reg._load_all()
    latest, _ = latest_checks(as_of_round=_committed_view())
    window = list(reg.WINDOW_PREFIX[:50])
    rest = [n for n in reg.WINDOW_PREFIX[50:]]
    mutate(window, rest, latest, reg)
    monkeypatch.setattr(reg, "WINDOW_PREFIX", tuple(window + rest))


def test_validator_rejects_skipping_a_staler_row(monkeypatch):
    """Swapping the last fill row for a FRESHER out-of-window row (one
    whose latest check outranks some row left outside) must fail."""
    import ebike_spark.plans.registry as reg

    reg._load_all()
    view = _committed_view()
    latest, _ = latest_checks(as_of_round=view)

    def mutate(window, rest, latest, reg):
        outside = [n for n in reg.REGISTRY if n not in set(window)]
        stalest_out = min(latest.get(n, 0) for n in outside)
        fresher = max(outside, key=lambda n: latest.get(n, 0))
        if latest.get(fresher, 0) <= stalest_out:
            pytest.skip("no strictly fresher out-of-window row to swap in")
        dropped = window.pop()
        window.append(fresher)
        rest.insert(0, dropped)

    _drifted(monkeypatch, mutate)
    with pytest.raises(AssertionError, match="skips staler rows"):
        validate_window(as_of_round=view)


def test_validator_rejects_missing_modified_query(monkeypatch):
    """Demoting a MODIFIED_THIS_ROUND query out of the head block must
    fail (stale green would stand as evidence for new code)."""
    import ebike_spark.plans.registry as reg

    reg._load_all()
    if not reg.MODIFIED_THIS_ROUND:
        pytest.skip("no modified queries declared this round")
    view = _committed_view()

    def mutate(window, rest, latest, reg):
        # move the modified query from the head block to the very end
        # of the 50 — a fill row slides into the head in its place
        name = reg.MODIFIED_THIS_ROUND[0]
        window.remove(name)
        window.append(name)

    _drifted(monkeypatch, mutate)
    with pytest.raises(AssertionError, match="lead with new\\+modified"):
        validate_window(as_of_round=view)
