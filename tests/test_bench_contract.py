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
            # worst-case compact basis: the capped 4-entry map with
            # wide ratios + overflow marker (r14: the basis map rides
            # the final line so the driver artifact self-adjudicates;
            # bench._compact_basis guarantees the cap)
            "floors_basis": bench._compact_basis(
                {
                    n: {"basis": "below_pass", "band_ratio": 9999.999,
                        "in_band": False}
                    for n in by_len[:10]
                }
            ),
            "floors_unavailable": unavailable,
            "floor_anchor": anchor,
            # r15: ambience probe min/max rides the final line
            "probe": [9999.999, 9999.999],
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


def test_merge_floor_measurements_takes_per_query_min() -> None:
    """VERDICT r11 item 3 protocol change: the mid-session early floor
    and the end-of-session re-time are both honest uncontended samples
    of the same plan; evidence is the per-query MIN, and a query with
    only one sample keeps it."""
    early = {"sample_dsir": 1.41, "only_early": 0.9}
    late = {"sample_dsir": 2.30, "only_late": 3.1}
    merged = bench.merge_floor_measurements(early, late)
    assert merged == {
        "sample_dsir": 1.41,
        "only_early": 0.9,
        "only_late": 3.1,
    }
    # and an early floor never RAISES an end-of-session one
    assert bench.merge_floor_measurements({"q": 5.0}, {"q": 2.0}) == {
        "q": 2.0
    }


def test_early_floor_pins_are_registered_and_bounded() -> None:
    """Every pinned floor name must exist in HEADLINE (else the early
    pass never times it) and the early-floor gate only fires for
    genuinely fast queries — the end-of-session protocol remains the
    evidence path for everything expensive."""
    for n in bench.PINNED_FLOORS:
        assert n in bench.HEADLINE, n
    assert bench.EARLY_FLOOR_MAX_SEC == 2.0
    # inverted-regime guard still classifies merged floors: an early
    # floor above the final pass min is unavailable, not evidence
    floors, unavailable = bench.split_floors(
        {"sample_dsir": 1.2},
        bench.merge_floor_measurements({"sample_dsir": 1.5}, {}),
    )
    assert floors == {} and unavailable == {"sample_dsir": 1.5}


def test_split_floors_fast_query_noise_tolerance() -> None:
    """Sub-2s queries: a solo re-time within FAST_FLOOR_TOL of the pass
    reproduces it and certifies (the r10-r12 sample_dsir inversions
    were 2-4% — pure sampling noise); beyond the tolerance, or for any
    query at/over the fast bound, the strict inverted-regime rule
    stands."""
    times = {"fast_ok": 1.40, "fast_bad": 1.40, "slow": 5.0}
    measured = {
        "fast_ok": 1.45,   # +3.6% on a 1.4s pass: reproduces
        "fast_bad": 1.60,  # +14%: beyond tolerance, unavailable
        "slow": 5.2,       # +4% on a 5s pass: strict rule, unavailable
    }
    floors, unavailable = bench.split_floors(times, measured)
    assert floors == {"fast_ok": 1.45}
    assert unavailable == {"fast_bad": 1.60, "slow": 5.2}
    # boundary: pass exactly AT the fast bound gets no tolerance
    f, u = bench.split_floors(
        {"edge": bench.EARLY_FLOOR_MAX_SEC},
        {"edge": bench.EARLY_FLOOR_MAX_SEC * 1.05},
    )
    assert f == {} and "edge" in u


def test_ledger_priors_ignore_slow_committed_artifact(tmp_path) -> None:
    """VERDICT r12 item 2 contract: a slow committed artifact must not
    raise any query's certification band. The priors come from the
    monotone ledger; a same-dir BENCH_FULL.json carrying inflated
    values is ignored whenever the ledger has entries."""
    ledger = {"resets": {}, "sf0.1": {"q_a": 1.0, "q_b": 0.5}}
    (tmp_path / "BENCH_MINS.json").write_text(json.dumps(ledger))
    slow_artifact = {"sf": 0.1, "queries": {"q_a": 3.0, "q_b": 2.2}}
    (tmp_path / "BENCH_FULL.json").write_text(json.dumps(slow_artifact))

    priors = bench.load_certification_priors(0.1, str(tmp_path))
    assert priors == {"q_a": 1.0, "q_b": 0.5}
    # the 2x floor-selection predicate now flags the drifted pass
    times = {"q_a": 2.5, "q_b": 0.6}
    flagged = {n for n in times if times[n] > 2 * priors.get(n, float("inf"))}
    assert flagged == {"q_a"}


def test_ledger_fallback_to_artifact_when_unseeded(tmp_path) -> None:
    """Pre-seed trees (no ledger, or no entries for this sf) fall back
    to the same-sf prior artifact — never a cross-sf one."""
    artifact = {"sf": 0.1, "queries": {"q_a": 3.0}}
    (tmp_path / "BENCH_FULL.json").write_text(json.dumps(artifact))
    assert bench.load_certification_priors(0.1, str(tmp_path)) == {"q_a": 3.0}
    # sf mismatch: the sf1.0 lookup must not read the sf0.1 artifact
    assert bench.load_certification_priors(1.0, str(tmp_path)) == {}


def test_ledger_update_is_monotone(tmp_path) -> None:
    """update_ledger_mins only ever lowers values: a slow run (committed
    or not) cannot raise a band; new queries enter; resets survive."""
    ledger = {
        "resets": {"q_r": {"round": 13, "reason": "plan change"}},
        "sf0.1": {"q_a": 1.0, "q_b": 0.5},
    }
    path = tmp_path / "BENCH_MINS.json"
    path.write_text(json.dumps(ledger))

    out = bench.update_ledger_mins(
        0.1, {"q_a": 2.9, "q_b": 0.4, "q_new": 7.5}, str(tmp_path)
    )
    assert out["q_a"] == 1.0  # slow evidence ignored
    assert out["q_b"] == 0.4  # faster evidence lowers
    assert out["q_new"] == 7.5  # first evidence enters

    doc = json.loads(path.read_text())
    assert doc["sf0.1"] == out
    assert doc["resets"] == ledger["resets"]  # resets preserved
    # a second slow run still cannot raise anything
    out2 = bench.update_ledger_mins(0.1, {"q_b": 9.9}, str(tmp_path))
    assert out2["q_b"] == 0.4


def test_committed_ledger_is_seeded_and_consistent() -> None:
    """The committed BENCH_MINS.json must exist, carry sf0.1 entries
    for every headline query that has ever been benched, and respect
    its own monotone contract against the committed artifact."""
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH_MINS.json")) as f:
        doc = json.load(f)
    mins = doc.get("sf0.1") or {}
    assert len(mins) >= 100
    assert all(isinstance(v, float) and v > 0 for v in mins.values())
    # every ledger min is <= the committed artifact's value for that
    # query (the artifact is one sample; the ledger is the history min)
    with open(os.path.join(repo, "BENCH_FULL.json")) as f:
        art = json.load(f)
    if art.get("sf") == 0.1:
        for q, v in (art.get("queries") or {}).items():
            if q in mins:
                assert mins[q] <= v + 1e-9, (q, mins[q], v)


def test_split_floors_ledger_band_accepts_inverted_retime() -> None:
    """r13 clause: a solo re-time inside the 2x-of-ledger band is floor
    evidence even when it lands above the (equally noisy) pass — but a
    re-time outside the band AND above the pass stays unavailable."""
    times = {"q_fast": 1.109, "q_slow": 10.0, "q_bad": 3.0}
    measured = {"q_fast": 1.31, "q_slow": 12.0, "q_bad": 2.9}
    priors = {"q_fast": 0.954, "q_slow": 4.0}
    floors, unavailable = bench.split_floors(times, measured, priors)
    # q_fast: 1.31 <= 2*0.954 -> certified despite 18% pass inversion
    assert floors["q_fast"] == 1.31
    # q_slow: 12.0 > 2*4.0 and > pass -> still unavailable
    assert unavailable["q_slow"] == 12.0
    # q_bad has no prior; 2.9 <= pass -> ordinary floor
    assert floors["q_bad"] == 2.9
    # and without priors, q_fast inverts as before (backward compat)
    f2, u2 = bench.split_floors(times, measured)
    assert "q_fast" in u2 and "q_bad" in f2


def test_classify_floors_bases_and_band_ratio() -> None:
    """VERDICT r13 item 3: the artifact must classify every floor by
    the clause that admitted it plus its ratio to the ledger anchor —
    the r13 artifact listed dedup_simhash's 6.772 in `floors` (below
    its own pass) while sitting at 2.21x of its ledger min, and only
    git archaeology revealed it."""
    times = {"below": 5.0, "fast": 1.4, "band": 1.109, "inv": 3.0,
             "simhash": 7.0}
    measured = {"below": 4.0,      # <= pass
                "fast": 1.45,      # sub-2s within tolerance
                "band": 1.31,      # > pass but inside 2x ledger band
                "inv": 3.5,        # > pass, no anchor: inverted
                "simhash": 6.772}  # <= pass but OUTSIDE its band
    priors = {"below": 3.0, "band": 0.954, "simhash": 3.069}
    basis = bench.classify_floors(times, measured, priors)
    assert basis["below"] == {
        "basis": "below_pass", "band_ratio": 1.333, "in_band": True}
    assert basis["fast"]["basis"] == "fast_tol"
    assert basis["fast"]["band_ratio"] is None
    assert basis["fast"]["in_band"] is False
    assert basis["band"] == {
        "basis": "in_band", "band_ratio": 1.373, "in_band": True}
    assert basis["inv"] == {
        "basis": "inverted", "band_ratio": None, "in_band": False}
    # the r13 ambiguity, now self-adjudicating: admitted below_pass,
    # visibly out of band
    assert basis["simhash"]["basis"] == "below_pass"
    assert basis["simhash"]["band_ratio"] == 2.207
    assert basis["simhash"]["in_band"] is False
    # classification agrees with split_floors' partition
    floors, unavailable = bench.split_floors(times, measured, priors)
    for n, b in basis.items():
        assert (b["basis"] != "inverted") == (n in floors)


def test_ledger_update_corrupt_ledger_not_clobbered(tmp_path) -> None:
    """ADVICE r13: a present-but-corrupt BENCH_MINS.json must not be
    overwritten with only this run's evidence (that would wipe every
    other sf bucket, all history minima, and the resets section); the
    evidence goes to a side file and the ledger stays for recovery."""
    path = tmp_path / "BENCH_MINS.json"
    path.write_text("{corrupt json!")
    out = bench.update_ledger_mins(0.1, {"q_a": 1.5}, str(tmp_path))
    assert out == {}
    assert path.read_text() == "{corrupt json!"  # untouched
    side = json.loads((tmp_path / "BENCH_MINS.json.rejected").read_text())
    assert side == {"sf0.1": {"q_a": 1.5}}
    # a MISSING ledger still seeds fresh (first-run path unchanged)
    fresh_dir = tmp_path / "fresh"
    fresh_dir.mkdir()
    out2 = bench.update_ledger_mins(0.1, {"q_a": 1.5}, str(fresh_dir))
    assert out2 == {"q_a": 1.5}


def test_warn_if_tree_dirty(tmp_path, capsys) -> None:
    """ADVICE r13: the ledger merge logs a warning when non-artifact
    files are modified (uncommitted-plan evidence entering the
    monotone ledger); artifact/ledger churn alone stays quiet."""
    import subprocess

    def git(*a):
        subprocess.run(["git", *a], cwd=tmp_path, check=True,
                       capture_output=True)

    git("init", "-q")
    git("config", "user.email", "t@t")
    git("config", "user.name", "t")
    (tmp_path / "plan.py").write_text("x = 1\n")
    (tmp_path / "BENCH_MINS.json").write_text("{}\n")
    git("add", "-A")
    git("commit", "-qm", "seed")
    assert bench.warn_if_tree_dirty(str(tmp_path)) is False
    # artifact-only churn (what bench itself writes): no warning
    (tmp_path / "BENCH_MINS.json").write_text("{\"sf0.1\": {}}\n")
    (tmp_path / "BENCH_FULL_sf0.01.json").write_text("{}\n")
    assert bench.warn_if_tree_dirty(str(tmp_path)) is False
    # a modified plan file: warn
    (tmp_path / "plan.py").write_text("x = 2\n")
    assert bench.warn_if_tree_dirty(str(tmp_path)) is True
    assert "uncommitted" in capsys.readouterr().err
    # non-repo dir (pytest's parent tmp dir is outside any repo):
    # quiet no-op
    assert bench.warn_if_tree_dirty(str(tmp_path.parent)) is False


def test_gen_bench_mins_rejects_unresolvable_reset_commit() -> None:
    """ADVICE r13: a reset whose commit doesn't resolve used to apply
    NO reset silently (order.get(..., -1) falsified the drop),
    resurrecting pre-reset minima — it must be a hard error."""
    import sys
    sys.path.insert(0, "tools")
    try:
        import gen_bench_mins as g
    finally:
        sys.path.pop(0)
    import pytest

    with pytest.raises(SystemExit, match="does not resolve"):
        g._resolve_commit("not-a-real-ref-xyz")
    # a real sha resolves to itself (full form)
    import subprocess
    head = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=g.REPO,
        capture_output=True, text=True, check=True).stdout.strip()
    assert g._resolve_commit(head[:10]) == head


def test_committed_ledger_resets_are_recorded_and_resolvable() -> None:
    """VERDICT r13 item 2: queries replanned since their anchor commit
    carry `resets` entries (round + full-sha commit + reason), each
    commit resolvable in history — an unresolvable reset must never
    silently apply no reset (see gen_bench_mins._resolve_commit)."""
    import os
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH_MINS.json")) as f:
        doc = json.load(f)
    resets = doc.get("resets", {})
    # the r13-adjudicated set: the two judge-named queries plus the
    # r12-replan anchors the audit (tools/audit_ledger_resets.py)
    # found predating their plan-change commits
    for q in ("dedup_simhash", "streaming_cdc_upsert",
              "kafka_wire_events", "dedup_semantic", "corpus_clean",
              "dedup_clusters", "dedup_paragraphs", "ann_topk",
              "ann_bucketed"):
        assert q in resets, q
    for q, r in resets.items():
        assert r.get("reason") and isinstance(r.get("round"), int), q
        sha = r.get("commit", "")
        assert len(sha) == 40, (q, sha)
        out = subprocess.run(
            ["git", "rev-parse", "--verify", f"{sha}^{{commit}}"],
            cwd=repo, capture_output=True, text=True)
        assert out.returncode == 0 and out.stdout.strip() == sha, q


def test_solo_cli_dispatch(monkeypatch) -> None:
    """VERDICT r13 item 4: `bench.py --solo NAME [reps]` is the
    fresh-process floor protocol for streaming-tagged queries; main()
    must route to it without touching the suite path."""
    import sys

    calls = []
    monkeypatch.setattr(bench, "solo_main", lambda n, r: calls.append((n, r)))
    monkeypatch.setattr(sys, "argv", ["bench.py", "--solo", "q_x"])
    bench.main()
    monkeypatch.setattr(sys, "argv", ["bench.py", "--solo", "q_y", "6"])
    bench.main()
    assert calls == [("q_x", 3), ("q_y", 6)]


def test_compact_basis_ranks_and_caps() -> None:
    """The compact final-line basis map carries the entries a reader
    most needs — out-of-band first, highest band-ratio first — capped
    with an explicit overflow marker."""
    fb = {
        "ok1": {"basis": "below_pass", "band_ratio": 1.1, "in_band": True},
        "ok2": {"basis": "in_band", "band_ratio": 1.9, "in_band": True},
        "bad_hi": {"basis": "below_pass", "band_ratio": 2.8, "in_band": False},
        "bad_lo": {"basis": "inverted", "band_ratio": 2.2, "in_band": False},
        "no_anchor": {"basis": "inverted", "band_ratio": None,
                      "in_band": False},
    }
    out = bench._compact_basis(fb, cap=4)
    names = [n for n in out if n != "+"]
    # all three out-of-band entries present, worst ratio first,
    # anchorless last within the out-of-band group
    assert names[:3] == ["bad_hi", "bad_lo", "no_anchor"]
    assert out["bad_hi"] == "bp:2.8"
    assert out["no_anchor"] == "inv"
    assert out["+"] == "1"  # one in-band entry overflowed the cap
    # no marker when everything fits
    assert "+" not in bench._compact_basis(fb, cap=5)


def test_box_probe_returns_positive_seconds() -> None:
    # VERDICT r14 item 1: the ambience probe must be a real measurement
    # (positive, sub-minute) and cheap enough to run between passes.
    p = bench.box_probe(iters=100_000)
    assert 0.0 <= p < 60.0
