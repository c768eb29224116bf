"""bench.py output-contract tests (no Spark needed).

The driver records only a ~2KB tail of bench stdout. BENCH_r03.json
recorded parsed=null because the single output line (75 query entries)
outgrew that tail. These tests pin the fix: the FINAL line is built from
the slowest-10 queries + 3 floors only, and even with the worst-case
(longest) registered names and maximal float widths it stays < 1500
chars — comfortably under the capture window.
"""

from __future__ import annotations

import json

import bench


def _worst_case_final_line() -> str:
    # Adversarial construction: the 10 longest query names with wide
    # float values, and the floor cap (10, the r05 self-certifying
    # rule) also filled with the longest names.
    by_len = sorted(bench.HEADLINE, key=len, reverse=True)
    slowest = {n: 9999.999 for n in by_len[:10]}
    floors = {n: 9999.999 for n in by_len[:10]}
    final = {
        "metric": "headline_queries_total",
        "value": 99999.999,
        "unit": "sec",
        "queries": slowest,
        "floors": floors,
        "sf": 100.0,
        "n_queries": len(bench.HEADLINE),
        "full": "BENCH_FULL.json",
    }
    return json.dumps(final, separators=(",", ":"))


def test_final_line_fits_driver_tail() -> None:
    line = _worst_case_final_line()
    assert len(line) < 1500, f"{len(line)} chars"


def test_final_line_parses_with_headline_total() -> None:
    parsed = json.loads(_worst_case_final_line())
    assert parsed["metric"] == "headline_queries_total"
    assert "value" in parsed and "sf" in parsed and "queries" in parsed
