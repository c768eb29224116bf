"""Audit BENCH_MINS.json anchors against plan-change history.

VERDICT r13 "What's wrong" #1: the ledger was seeded from ALL git
history with `resets` empty, so queries replanned in r05-r12 carry
anchors measured on plans that no longer exist (dedup_simhash's sf0.1
anchor 3.069 traces to the round-4 artifact; its plan was replaced in
r05 and again in r12 — deliberately trading sf0.1 time for a 5x win at
10x). The ledger's own contract says an intentional plan slowdown
resets history; none were recorded.

This tool, for every (sf, query, min) in the ledger:
  1. finds the ORIGIN commit — the earliest committed BENCH_FULL*
     version whose evidence (queries/floors/floors_early min) equals
     the ledger min (3dp) — and that commit's date;
  2. reports the query's CURRENT best evidence at that sf (the newest
     committed artifact's pass + floors, same min rule) and the ratio
     current-best / anchor — a query whose current plan still lands
     near its anchor needs no reset regardless of replans; one whose
     best same-plan evidence sits far above an old anchor is a reset
     candidate to adjudicate against the replan record in BASELINE.md.

Output: one line per candidate (ratio >= THRESH, default 1.25),
sorted by ratio descending, plus a summary. Read-only — resets are
added to BENCH_MINS.json by hand (with round/commit/reason) and
tools/gen_bench_mins.py re-applies them.

Run from the repo root: python tools/audit_ledger_resets.py [THRESH]
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


def artifact_history() -> list[tuple[str, str, dict]]:
    """Every committed BENCH_FULL* version, oldest first:
    (sha, date, parsed)."""
    names = sorted(
        n
        for n in set(
            _git("log", "--format=", "--name-only", "--diff-filter=A").split()
        )
        if n.startswith("BENCH_FULL") and n.endswith(".json")
    )
    out: list[tuple[str, str, dict]] = []
    for name in names:
        lines = _git(
            "log", "--follow", "--format=%H %cs", "--reverse", "--", name
        ).splitlines()
        for ln in lines:
            sha, date = ln.split()
            try:
                out.append((sha, date, json.loads(_git("show", f"{sha}:{name}"))))
            except (subprocess.CalledProcessError, ValueError):
                continue
    return out


def evidence_of(doc: dict) -> dict[str, float]:
    ev: dict[str, float] = {}
    for section in ("queries", "floors", "floors_early"):
        for q, v in (doc.get(section) or {}).items():
            if isinstance(v, (int, float)) and v > 0:
                ev[q] = min(ev.get(q, float("inf")), round(float(v), 3))
    return ev


def main() -> None:
    thresh = float(sys.argv[1]) if len(sys.argv) > 1 else 1.25
    with open(LEDGER) as f:
        ledger = json.load(f)
    resets = ledger.get("resets", {})

    history = artifact_history()
    # index: sf -> list of (sha, date, evidence) oldest-first
    by_sf: dict[str, list[tuple[str, str, dict[str, float]]]] = {}
    for sha, date, doc in history:
        sf = doc.get("sf")
        if isinstance(sf, (int, float)) and sf > 0:
            by_sf.setdefault(f"sf{sf}", []).append((sha, date, evidence_of(doc)))

    candidates = []
    for key, bucket in ledger.items():
        if not key.startswith("sf") or not isinstance(bucket, dict):
            continue
        hist = by_sf.get(key, [])
        if not hist:
            continue
        newest_ev = hist[-1][2]
        for q, anchor in bucket.items():
            origin = next(
                (
                    (sha, date)
                    for sha, date, ev in hist
                    if abs(ev.get(q, -1) - anchor) < 5e-4
                ),
                None,
            )
            cur = newest_ev.get(q)
            ratio = round(cur / anchor, 3) if cur else None
            if q in resets:
                continue  # already adjudicated
            if ratio is not None and ratio >= thresh:
                candidates.append(
                    {
                        "sf": key,
                        "query": q,
                        "anchor": anchor,
                        "origin": origin[0][:10] if origin else "?",
                        "origin_date": origin[1] if origin else "?",
                        "current_best": cur,
                        "ratio": ratio,
                    }
                )
    candidates.sort(key=lambda c: -c["ratio"])
    for c in candidates:
        print(
            f"{c['sf']:8s} {c['query']:36s} anchor {c['anchor']:8.3f} "
            f"@ {c['origin']} ({c['origin_date']})  current "
            f"{c['current_best']:8.3f}  ratio {c['ratio']:.2f}x"
        )
    print(
        f"\n{len(candidates)} candidates at >= {thresh}x "
        "(current committed evidence vs ledger anchor); adjudicate each "
        "against its replan history before adding a reset",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
