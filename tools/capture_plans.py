"""Capture .explain("formatted") for registered queries into plans/<tag>/.

Usage: python tools/capture_plans.py <out_dir> [suffix] [name ...]

Writes <out_dir>/<query><suffix>.txt for every requested query (default:
every non-streaming-tagged registered query; streaming-tagged queries
execute a full micro-batch pipeline inside fn() and their returned
DataFrame is just a memory-sink scan, so a static explain is not
meaningful for them — they are profiled per-stage instead, see
BASELINE.md).

The explain is captured BEFORE any action runs (initial AQE plan,
isFinalPlan=false) — the same thing `df.explain("formatted")` prints.
Queries whose builders run eager actions (df-cap counts, persisted index
materialization) pay those actions; this tool is untimed by design.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmall2021_flink_dw_spark.registry import load_all
from gmall2021_flink_dw_spark.session import get_spark


def formatted_plan(df) -> str:
    jdf = df._jdf
    sc = df.sparkSession._jvm
    mode = sc.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jdf.queryExecution().explainString(mode)


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "_before"
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_all()
    if not names:
        names = [n for n, s in registry.items() if "streaming" not in s.tags]
    spark = get_spark("plan-capture")
    for name in names:
        t0 = time.perf_counter()
        try:
            df = registry[name].fn(spark, sf_dir)
            text = formatted_plan(df)
            status = "ok"
        except Exception as ex:  # noqa: BLE001 — record and continue
            text = f"CAPTURE FAILED: {type(ex).__name__}: {ex}\n"
            status = "FAIL"
        with open(os.path.join(out_dir, f"{name}{suffix}.txt"), "w") as f:
            f.write(text)
        print(
            f"[capture] {name} {status} {time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
            flush=True,
        )
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
