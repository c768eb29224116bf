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
    # float values everywhere. floors / floors_unavailable PARTITION
    # the same <=10 floor set (bench.split_floors guarantees it) and
    # the final-line anchor is scoped to the unavailable names, so the
    # two length extremes are "all floors valid" vs "all floors
    # unavailable (names + anchor entries)"; take whichever renders
    # longer.
    by_len = sorted(bench.HEADLINE, key=len, reverse=True)
    slowest = {n: 9999.999 for n in by_len[:10]}

    def render(floors, unavailable, anchor):
        final = {
            "metric": "headline_queries_total",
            "value": 99999.999,
            "unit": "sec",
            "queries": slowest,
            "floors": floors,
            "floors_unavailable": unavailable,
            "floor_anchor": anchor,
            "sf": 100.0,
            "n_queries": len(bench.HEADLINE),
            "full": "BENCH_FULL.json",
        }
        return json.dumps(final, separators=(",", ":"))

    all_valid = render({n: 9999.999 for n in by_len[:10]}, [], {})
    all_unavail = render(
        {}, sorted(by_len[:10]), {n: 9999.999 for n in by_len[:10]}
    )
    return max(all_valid, all_unavail, key=len)


def test_final_line_fits_driver_tail() -> None:
    line = _worst_case_final_line()
    assert len(line) < 1500, f"{len(line)} chars"


def test_final_line_parses_with_headline_total() -> None:
    parsed = json.loads(_worst_case_final_line())
    assert parsed["metric"] == "headline_queries_total"
    assert "value" in parsed and "sf" in parsed and "queries" in parsed


def test_split_floors_inverted_regime() -> None:
    """VERDICT r05 item 3: a session floor ABOVE its own pass time
    (contention grew through the session — the r05 driver artifact's
    simhash 6.39 floor vs 5.04 pass) must be reported as unavailable,
    not as certification evidence."""
    times = {"dedup_simhash": 5.04, "corpus_filter_pipeline": 4.74,
             "dedup_clusters": 4.44}
    measured = {"dedup_simhash": 6.39,          # inverted: > pass
                "corpus_filter_pipeline": 5.30,  # inverted: > pass
                "dedup_clusters": 3.20}          # honest floor
    floors, unavailable = bench.split_floors(times, measured)
    assert floors == {"dedup_clusters": 3.20}
    assert unavailable == {"dedup_simhash": 6.39,
                           "corpus_filter_pipeline": 5.30}


def test_split_floors_equal_and_missing() -> None:
    # floor == pass counts as evidence (re-run reproduced the pass);
    # a floor for a query with no pass entry cannot be classified as
    # evidence and lands in unavailable.
    floors, unavailable = bench.split_floors(
        {"q": 2.0}, {"q": 2.0, "ghost": 1.0}
    )
    assert floors == {"q": 2.0}
    assert unavailable == {"ghost": 1.0}


def test_quadratic_anchor_gate_arithmetic() -> None:
    """Pins the size-gate arithmetic for the quadratic-by-role exact
    anchors (VERDICT r10 item 4): at the cap sf the cosine anchor's
    all-pairs GEMM is under the ceiling; one decade up it is past it
    and growing 100x per decade — which is exactly why ANCHOR_SF_CAP
    sits at the committed suite sf and must not rise silently."""
    macs_at_cap = bench.N_EMB_AT_CAP**2 * bench.EMB_DIM
    assert macs_at_cap < bench.ANCHOR_MAC_CEILING
    n_next_decade = bench.N_EMB_AT_CAP * 10
    assert n_next_decade**2 * bench.EMB_DIM > bench.ANCHOR_MAC_CEILING
    assert bench.ANCHOR_SF_CAP == 0.1  # the committed suite sf


def test_quadratic_anchor_gate_names_are_registered_exact_forms() -> None:
    """Every gated name exists in the registry and is an exact form
    (not one of the hashed/LSH scale paths, which must keep riding
    the suite at every sf)."""
    from gmall2021_flink_dw_spark.registry import load_all

    reg = load_all()
    for n in bench.QUADRATIC_ANCHORS:
        assert n in reg, n
        assert "hashed" not in n and "lsh" not in n
    # the scale paths stay unconditionally in HEADLINE
    for scale_path in ("dedup_substring_spans_hashed", "dedup_embedding_lsh"):
        assert scale_path in bench.HEADLINE
        assert scale_path not in bench.QUADRATIC_ANCHORS
