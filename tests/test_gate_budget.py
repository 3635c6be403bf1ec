"""Gate-budget ceiling (r12, VERDICT r11 Next #1): the driver's
correctness receipt went silent in r9/r10 and returned exactly when
the sf0.01 gate got cheap — check_all.py now FAILS a full run whose
cost regrows past the ceiling, and these tests pin the ceiling's
arithmetic and defaults without paying a gate run."""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts")
)


def test_budget_breaches_flags_slow_entry_and_suite():
    from check_all import budget_breaches

    rows = {"a": {"seconds": 10.0}, "b": {"seconds": 46.2}}
    br = budget_breaches(rows, 100.0, entry_ceil=45, suite_ceil=400)
    assert len(br) == 1 and "b" in br[0] and "46.2" in br[0]

    br = budget_breaches({"a": {"seconds": 1.0}}, 401.0,
                         entry_ceil=45, suite_ceil=400)
    assert len(br) == 1 and "suite" in br[0]

    assert budget_breaches(rows, 100.0, entry_ceil=50, suite_ceil=400) == []
    assert budget_breaches({}, 0.0, entry_ceil=45, suite_ceil=400) == []


def test_budget_default_ceilings_pinned():
    """45 s/entry, 400 s/suite at sf0.01 — chosen with ~1.5x headroom
    over the r11 tail (slowest entry ~29 s, suite ~213-287 s); a change
    here must be deliberate, not drift."""
    import check_all

    if "SPARKALL_GATE_ENTRY_CEIL" not in os.environ:
        assert check_all.ENTRY_CEIL_S == 45.0
    if "SPARKALL_GATE_SUITE_CEIL" not in os.environ:
        assert check_all.SUITE_CEIL_S == 400.0
