"""Seed/rebuild BENCH_MINS.json — the monotone committed-minima ledger.

VERDICT r12 item 2: bench.py's 2x floor-selection rule and early-floor
gate used to read the *immediately prior committed artifact* as the
certification prior, so committing one ambience-degraded artifact
ratcheted every query's band upward (r12: seven queries sat >2x their
all-history committed min yet drew no floor, and sample_dsir's
early-floor gate read a 2.177 s prior and never fired). The fix is a
per-query ALL-HISTORY committed-minimum ledger, updated monotonically
downward, reset for a query only when its plan changes.

This tool rebuilds the ledger from git history: every committed version
of BENCH_FULL.json / BENCH_FULL_sf*.json contributes its per-query
times, floors, and floors_early; the ledger takes the min per (sf,
query). Resets are honored by dropping history BEFORE the reset commit
for the named query (the `resets` section of the existing ledger is
preserved verbatim and re-applied).

Existing ledger entries for NON-reset queries are min-merged in, not
discarded: bench.py min-merges live evidence on every run, so the
ledger can hold honest minima that no committed artifact carries (two
runs between commits keep only the last artifact but both ledger
merges); a pure artifact rebuild would silently RAISE those queries'
anchors. A query named in `resets` is the one case where the existing
entry is deliberately dropped — it is old-plan evidence by
adjudication, and its anchor comes from post-reset history alone.

Run from the repo root: python tools/gen_bench_mins.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEDGER = os.path.join(REPO, "BENCH_MINS.json")


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, check=True, capture_output=True, text=True
    ).stdout


def committed_versions(path: str) -> list[tuple[str, dict]]:
    """Every committed version of `path`, oldest first: (sha, parsed)."""
    shas = _git(
        "log", "--follow", "--format=%H", "--reverse", "--", path
    ).split()
    out: list[tuple[str, dict]] = []
    for sha in shas:
        try:
            blob = _git("show", f"{sha}:{path}")
            out.append((sha, json.loads(blob)))
        except (subprocess.CalledProcessError, ValueError):
            continue  # renamed/deleted at this commit, or unparsable
    return out


def _resolve_commit(ref: str) -> str:
    """Resolve a reset's commit ref to a full sha, or die loudly.

    ADVICE r13: a reset whose commit is missing, abbreviated, or not in
    history silently applied NO reset (order.get(..., -1) made the drop
    condition false), resurrecting pre-reset minima from the old plan —
    the exact band-poisoning failure the resets mechanism exists to
    prevent. An unresolvable reset is a hard error, never a no-op."""
    try:
        return _git("rev-parse", "--verify", f"{ref}^{{commit}}").strip()
    except subprocess.CalledProcessError:
        raise SystemExit(
            f"reset commit {ref!r} does not resolve to a commit in this "
            "repo — fix the `resets` entry in BENCH_MINS.json (full sha "
            "of the plan-change commit) and rerun"
        )


def main() -> None:
    resets: dict[str, dict] = {}
    existing: dict[str, dict] = {}
    if os.path.exists(LEDGER):
        with open(LEDGER) as f:
            existing = json.load(f)
        resets = existing.get("resets", {})

    # commit order index, to honor resets (history strictly BEFORE the
    # reset commit is dropped for that query)
    all_shas = _git("log", "--format=%H", "--reverse").split()
    order = {sha: i for i, sha in enumerate(all_shas)}

    # Resolve every reset commit UP FRONT (full sha, must be in this
    # history) so a typo cannot silently disable the reset.
    reset_order: dict[str, int] = {}
    for q, r in resets.items():
        sha = _resolve_commit(str(r.get("commit", "")))
        if sha not in order:
            raise SystemExit(
                f"reset commit {sha} for {q!r} resolves but is not in "
                "`git log` history — wrong branch or garbage ref"
            )
        reset_order[q] = order[sha]

    mins: dict[str, dict[str, float]] = {}
    artifact_names = sorted(
        n
        for n in set(
            _git("log", "--format=", "--name-only", "--diff-filter=A").split()
        )
        if n.startswith("BENCH_FULL") and n.endswith(".json")
    )
    for art in artifact_names:
        for sha, doc in committed_versions(art):
            sf = doc.get("sf")
            if not isinstance(sf, (int, float)) or sf <= 0:
                continue
            key = f"sf{sf}"
            bucket = mins.setdefault(key, {})
            evidence: dict[str, float] = {}
            for section in ("queries", "floors", "floors_early"):
                for q, v in (doc.get(section) or {}).items():
                    if isinstance(v, (int, float)) and v > 0:
                        evidence[q] = min(evidence.get(q, float("inf")), v)
            for q, v in evidence.items():
                if q in reset_order and order.get(sha, 0) < reset_order[q]:
                    continue  # pre-reset evidence: the old plan's min
                bucket[q] = round(min(bucket.get(q, float("inf")), v), 3)

    # Min-merge existing ledger entries for non-reset queries (live
    # bench evidence that never reached a committed artifact — see
    # module docstring); reset queries keep post-reset history only.
    for key, prior_bucket in existing.items():
        if not key.startswith("sf") or not isinstance(prior_bucket, dict):
            continue
        bucket = mins.setdefault(key, {})
        for q, v in prior_bucket.items():
            if q in resets or not isinstance(v, (int, float)) or v <= 0:
                continue
            bucket[q] = round(min(bucket.get(q, float("inf")), v), 3)

    doc = {
        "_doc": (
            "Monotone committed-minima ledger (VERDICT r12 item 2): "
            "per-sf per-query all-history committed min across every "
            "BENCH_FULL* artifact version in git. bench.py reads it as "
            "the certification prior for the 2x floor-selection rule "
            "and the early-floor gate, and min-merges each run's "
            "evidence back in — values only ever go DOWN. To reset a "
            "query after an intentional plan change, add an entry to "
            "`resets` ({query: {round, commit, reason}}), delete the "
            "query from the sf maps, and rerun tools/gen_bench_mins.py."
        ),
        "resets": resets,
        **{k: dict(sorted(v.items())) for k, v in sorted(mins.items())},
    }
    with open(LEDGER, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=False)
        f.write("\n")
    for k, v in mins.items():
        print(f"{k}: {len(v)} queries", file=sys.stderr)
    print(f"wrote {LEDGER}", file=sys.stderr)


if __name__ == "__main__":
    main()
