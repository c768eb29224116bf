"""Summarize plan-shape signals across captured explain files.

Usage: python tools/audit_plans.py plans/r14 [_before]

For each <query><suffix>.txt: counts of Exchange / SortMergeJoin /
BroadcastHashJoin / ShuffledHashJoin / CartesianProduct /
BatchEvalPython / ArrowEvalPython / MapInPandas-family nodes, plus scans
whose ReadSchema is wide (>6 fields) and filters that did not push down
(scan with PushedFilters: [] while the plan holds a Filter directly
above it). Sorted so the most suspicious rows print first.
"""

from __future__ import annotations

import os
import re
import sys


def audit_file(path: str) -> dict:
    text = open(path).read()
    sig = {
        "exchanges": len(re.findall(r"\bExchange\b", text)),
        "smj": text.count("SortMergeJoin"),
        "bhj": text.count("BroadcastHashJoin"),
        "shj": text.count("ShuffledHashJoin"),
        "bnlj": text.count("BroadcastNestedLoopJoin"),
        "cartesian": text.count("CartesianProduct"),
        "batch_py": text.count("BatchEvalPython"),
        "arrow_py": text.count("ArrowEvalPython"),
        "map_py": text.count("MapInPandas") + text.count("MapInArrow")
        + text.count("FlatMapGroupsInPandas"),
        "rowtocol": text.count("RowToColumnar"),
        "sorts": len(re.findall(r"\(\d+\) Sort\b", text)),
        "failed": text.startswith("CAPTURE FAILED"),
    }
    wide_scans = 0
    for m in re.finditer(r"ReadSchema: struct<([^\n]*)", text):
        nfields = m.group(1).count(":")
        if nfields > 6:
            wide_scans += 1
    sig["wide_scans"] = wide_scans
    return sig


def main() -> None:
    plan_dir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "_before"
    rows = []
    for fn in sorted(os.listdir(plan_dir)):
        if not fn.endswith(suffix + ".txt"):
            continue
        name = fn[: -len(suffix) - 4]
        rows.append((name, audit_file(os.path.join(plan_dir, fn))))
    sus = lambda s: (  # noqa: E731
        s["cartesian"] * 100
        + s["bnlj"] * 10
        + s["batch_py"] * 10
        + s["smj"] * 2
        + s["exchanges"]
        + s["wide_scans"]
    )
    rows.sort(key=lambda kv: -sus(kv[1]))
    hdr = (
        "query/exch/smj/bhj/shj/bnlj/cart/batchPy/arrowPy/mapPy/sorts/wide"
    )
    print(hdr)
    for name, s in rows:
        if s["failed"]:
            print(f"{name:42s} CAPTURE-FAILED")
            continue
        print(
            f"{name:42s} {s['exchanges']:3d} {s['smj']:3d} {s['bhj']:3d} "
            f"{s['shj']:3d} {s['bnlj']:3d} {s['cartesian']:3d} "
            f"{s['batch_py']:3d} {s['arrow_py']:3d} {s['map_py']:3d} "
            f"{s['sorts']:3d} {s['wide_scans']:3d}"
        )


if __name__ == "__main__":
    main()
