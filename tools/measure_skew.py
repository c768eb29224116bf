"""Measure AQE skew-join ON vs OFF at a data size where skew hurts
(VERDICT r06 item 7 — the measured row behind tests/test_skew.py's
plan assert).

Setup: a sort-merge join with a 90%-hot key — `fact` has N rows with
90% on key 0 plus a ~200-byte payload (so the hot shuffle partition is
hundreds of MB, well past the default 256MB skew threshold), `dim` has
one row per key. Broadcast is disabled so the join MUST shuffle both
sides (the production regime where skew exists at all — a broadcast
dim join never skews). Everything else is the shipped session config:
default skew thresholds, default advisory size — production rules, not
the shrunken test thresholds.

Protocol: min-of-3 per mode, alternating modes, same generated input
persisted to parquet first so scan cost is identical. Run SOLO.

Usage: python tools/measure_skew.py [--rows 20000000] [--keys 2000]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F

from gmall2021_flink_dw_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=40_000_000)
    ap.add_argument("--keys", type=int, default=2_000)
    ap.add_argument("--out", default="/tmp/skew_measure")
    args = ap.parse_args()

    spark = get_spark("skew-measure")
    fact_path = os.path.join(args.out, "fact")
    dim_path = os.path.join(args.out, "dim")
    if not os.path.exists(fact_path):
        # 90% of rows on key 0, the rest uniform over the other keys;
        # the payload makes the hot partition big in BYTES (what the
        # skew rules measure), not just rows
        # payload must be INCOMPRESSIBLE: the skew rule reads
        # COMPRESSED map-output sizes, and a repeated-constant payload
        # lz4-compresses to ~nothing, keeping the hot partition under
        # the 256MB threshold (measured: no skew marking at all)
        fact = (
            spark.range(args.rows)
            .select(
                F.when(F.col("id") % 10 < 9, F.lit(0))
                .otherwise(F.col("id") % args.keys)
                .alias("k"),
                F.col("id").alias("v"),
                F.concat(
                    F.md5(F.col("id").cast("string")),
                    F.md5((F.col("id") * 31).cast("string")),
                    F.md5((F.col("id") * 97).cast("string")),
                    F.md5((F.col("id") * 193).cast("string")),
                ).alias("payload"),
            )
        )
        fact.write.mode("overwrite").parquet(fact_path)
        dim = spark.range(args.keys).select(
            F.col("id").alias("k"), (F.col("id") * 7).alias("dv")
        )
        dim.write.mode("overwrite").parquet(dim_path)

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def run_once() -> float:
        fact = spark.read.parquet(fact_path)
        dim = spark.read.parquet(dim_path)
        # Two traps this harness had to step around, both worth keeping
        # on record because they are exactly what a user hits:
        # (1) an aggregate referencing only k/v lets Catalyst prune the
        #     payload at the scan — the hot partition shrinks ~13x and
        #     the skew vanishes (first cut measured a fake 1.03x);
        # (2) a groupBy on the JOIN KEY downstream makes the SMJ output
        #     partitioning required, so OptimizeSkewedJoin legally
        #     refuses to split the hot partition (second cut: 1.02x,
        #     both modes equal). That regime needs
        #     spark.sql.adaptive.forceOptimizeSkewedJoin or a salted
        #     aggregate (dws_salted_agg) instead.
        # (3) the payload had to be incompressible — see the generator.
        # So: measure the JOIN itself — enrich, project, and drain via
        # a global partial agg (no distribution requirement), never a
        # same-key aggregate.
        joined = fact.join(dim, "k").select(
            "k", "v", (F.col("dv") + F.length("payload")).alias("w")
        )
        probe = joined.agg(F.sum("w").alias("s"))
        t0 = time.perf_counter()
        probe.collect()
        dt = time.perf_counter() - t0
        plan = probe._jdf.queryExecution().executedPlan().toString()
        marked = "skew=true" in plan
        print(f"  skew-marked in executed plan: {marked}")
        return dt

    results: dict[str, float] = {}
    for mode, flag in [("skew_on", "true"), ("skew_off", "false")] * 3:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", flag)
        dt = run_once()
        results[mode] = min(results.get(mode, float("inf")), dt)
        print(f"{mode}: {dt:.2f}s (min {results[mode]:.2f})")
    print(
        f"FINAL rows={args.rows} keys={args.keys} "
        f"skew_on={results['skew_on']:.2f}s "
        f"skew_off={results['skew_off']:.2f}s "
        f"speedup={results['skew_off'] / results['skew_on']:.2f}x"
    )
    spark.stop()
    shutil.rmtree(args.out, ignore_errors=True)


if __name__ == "__main__":
    main()
