"""Driver-window rotation hygiene.

The driver's correctness harness verifies the FIRST 50 registry entries.
Round 7 shipped a 51-entry _PRIORITY whose comment claimed the whole r1
trio rotated while `unwind_part_words` silently fell out of the window.
These tests make that class of slip impossible: the list must be exactly
window-sized, duplicate-free, resolvable, and must actually occupy the
first-50 window after the tier sort.
"""

from __future__ import annotations

WINDOW = 50


def test_priority_is_exactly_window_sized():
    from nornicdb_spark.queries import _PRIORITY

    assert len(_PRIORITY) == WINDOW, (
        f"_PRIORITY has {len(_PRIORITY)} entries for a {WINDOW}-slot "
        "driver window — every entry past the window silently loses its "
        "stamp rotation (the r7 unwind_part_words slip)"
    )
    assert len(set(_PRIORITY)) == len(_PRIORITY), "duplicate _PRIORITY entry"


def test_priority_entries_resolve_and_land_in_window():
    from nornicdb_spark.queries import _PRIORITY, QUERIES

    missing = [n for n in _PRIORITY if n not in QUERIES]
    assert not missing, f"_PRIORITY names not in registry: {missing}"
    first = list(QUERIES)[:WINDOW]
    out_of_window = [n for n in _PRIORITY if n not in first]
    assert not out_of_window, (
        f"_PRIORITY entries sorted outside the first-{WINDOW} window: "
        f"{out_of_window}"
    )


def test_oracle_keys_subset_of_queries():
    from nornicdb_spark.queries import ORACLES, QUERIES

    assert set(ORACLES) <= set(QUERIES)
