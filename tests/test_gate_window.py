"""The driver verifies only the FIRST 50 entries of queries() — round 6
shipped 9 queries silently past that window (VERDICT r6 finding #1).
These tests make the window a checked invariant instead of a convention:
the deferred rotation is explicit, bounded, and everything not deferred
fits inside the verified window.
"""

import __spark_entry__ as entry

DRIVER_WINDOW = 50


def test_non_deferred_queries_fit_driver_window():
    names = list(entry.queries())
    deferred = set(entry.GATE_DEFERRED)
    verified = [n for n in names if n not in deferred]
    assert len(verified) <= DRIVER_WINDOW, (
        f"{len(verified)} non-deferred queries exceed the driver's "
        f"{DRIVER_WINDOW}-entry verification window — grow GATE_DEFERRED "
        "(only with names that were driver-green on unchanged code last "
        "round) or prune a redundant gate"
    )
    # the deferred block must actually sit at the tail, past the window
    assert names[: len(verified)] == verified


def test_deferred_names_exist_and_are_unique():
    names = list(entry.queries())
    assert len(names) == len(set(names))
    for n in entry.GATE_DEFERRED:
        assert n in names, f"GATE_DEFERRED lists unknown query {n!r}"
    assert len(entry.GATE_DEFERRED) == len(set(entry.GATE_DEFERRED))


def test_every_oracle_key_has_a_query():
    qs = set(entry.queries())
    for k in entry.oracle_sql():
        assert k in qs, f"oracle {k!r} has no queries() entry"
