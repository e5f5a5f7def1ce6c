"""The evidence-rotation window is MECHANICAL, not builder discretion
(VERDICT-r10 task 3): tools/staleness.py::validate_window derives the
required WINDOW_PREFIX shape from the CORRECTNESS_r*.json history —
new/modified queries first, then only the oldest-checked rows — and
this suite both runs it against the committed prefix and proves it
BITES on a drifted prefix (swap a fill row for a fresher one, drop a
modified row from the head)."""

from __future__ import annotations

import pytest

from tools.staleness import latest_checks, validate_window


def test_committed_window_follows_rotation_rule():
    validate_window()


def _drifted(monkeypatch, mutate):
    import ebike_spark.plans.registry as reg

    reg._load_all()
    latest, _ = latest_checks()
    window = list(reg.WINDOW_PREFIX[:50])
    rest = [n for n in reg.WINDOW_PREFIX[50:]]
    mutate(window, rest, latest, reg)
    monkeypatch.setattr(reg, "WINDOW_PREFIX", tuple(window + rest))


def test_validator_rejects_skipping_a_staler_row(monkeypatch):
    """Swapping the last fill row for a FRESHER out-of-window row (one
    whose latest check outranks some row left outside) must fail."""
    import ebike_spark.plans.registry as reg

    reg._load_all()
    latest, _ = latest_checks()

    def mutate(window, rest, latest, reg):
        outside = [n for n in reg.REGISTRY if n not in set(window)]
        stalest_out = min(latest[n] for n in outside)
        fresher = max(outside, key=lambda n: latest[n])
        if latest[fresher] <= stalest_out:
            pytest.skip("no strictly fresher out-of-window row to swap in")
        dropped = window.pop()
        window.append(fresher)
        rest.insert(0, dropped)

    _drifted(monkeypatch, mutate)
    with pytest.raises(AssertionError, match="skips staler rows"):
        validate_window()


def test_validator_rejects_missing_modified_query(monkeypatch):
    """Demoting a MODIFIED_THIS_ROUND query out of the head block must
    fail (stale green would stand as evidence for new code)."""
    import ebike_spark.plans.registry as reg

    reg._load_all()
    if not reg.MODIFIED_THIS_ROUND:
        pytest.skip("no modified queries declared this round")

    def mutate(window, rest, latest, reg):
        # move the modified query from the head block to the very end
        # of the 50 — a fill row slides into the head in its place
        name = reg.MODIFIED_THIS_ROUND[0]
        window.remove(name)
        window.append(name)

    _drifted(monkeypatch, mutate)
    with pytest.raises(AssertionError, match="lead with new\\+modified"):
        validate_window()
