"""CATALOG.md must stay in lockstep with the registry."""

from __future__ import annotations


def test_catalog_is_current():
    import tools.gen_catalog as g

    with open("CATALOG.md") as f:
        on_disk = f.read()
    assert on_disk == g.render(), (
        "CATALOG.md is stale — run: python tools/gen_catalog.py"
    )
