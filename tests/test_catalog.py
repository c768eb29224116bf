"""CATALOG.md lockstep + driver-window rotation invariants.

The VERDICT r03 finding: five queries landed after the 50-entry driver
window filled and went three rounds with zero driver evidence. These
tests turn the rotation discipline from a comment in registry.py into
an asserted invariant: projecting the upcoming round's _DRIVER_WINDOW
onto the CORRECTNESS history, no registered query may be more than 2
rounds stale, and nothing outside the window may be stale enough to
have been forgotten.
"""

from __future__ import annotations

from gmall2021_flink_dw_spark.registry import _DRIVER_WINDOW, load_all

MAX_STALENESS = 2  # rounds a query may go without a fresh driver row


def test_catalog_is_current():
    import tools.gen_catalog as g

    with open("CATALOG.md") as f:
        on_disk = f.read()
    assert on_disk == g.render(), (
        "CATALOG.md is stale — run: python tools/gen_catalog.py"
    )


def test_window_is_driver_prefix_sized():
    reg = load_all()
    assert len(_DRIVER_WINDOW) == 50, len(_DRIVER_WINDOW)
    assert list(reg)[:50] == list(_DRIVER_WINDOW)
    assert len(set(_DRIVER_WINDOW)) == 50, "duplicate window entries"


def test_no_query_exceeds_staleness_bound():
    """With the upcoming round's window applied, every query's driver
    row is at most MAX_STALENESS rounds old. Queries in the window are
    projected to get a row in round latest+1; everything else keeps its
    newest recorded row. A failure here means the window rebuild
    neglected a query — fix _DRIVER_WINDOW, not this test."""
    import tools.gen_catalog as g

    reg = load_all()
    rounds = g.driver_rounds()
    latest = max(rounds.values(), default=0)
    upcoming = latest + 1
    window = set(_DRIVER_WINDOW)
    stale = {}
    for name in reg:
        projected = upcoming if name in window else rounds.get(name, 0)
        if upcoming - projected > MAX_STALENESS:
            stale[name] = rounds.get(name, None)
    assert not stale, (
        f"queries left > {MAX_STALENESS} rounds without a driver row "
        f"(name -> newest row): {stale}"
    )
