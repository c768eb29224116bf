"""Dedup-family skew audit + per-stage profile (VERDICT r14 item 3).

Guide §1 (measure first) + §2.5 (skew): before touching the dedup
family, measure (a) where the wall time of each heavy query actually
goes, stage by stage, and (b) the posting-list length distribution of
every inverted index the family self-joins on — the join fan-out is
sum(df^2) per key, so a handful of hot keys would dominate and salting
would pay; if the df cap already bounds every list, the skew claim is
settled by data instead of vibes.

Usage (run SOLO on a quiet box):
    python tools/profile_dedup.py /tmp/testdata_sf1 [--stages] [--hist]

Prints a report to stdout; paste/commit the relevant parts into
OPTIMIZATION_r15.md.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F

from gmall2021_flink_dw_spark.session import get_spark, ensure_workers_can_import


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _timed(spark, label, build):
    """Build + materialize through the noop sink, labeled in the UI."""
    spark.sparkContext.setJobDescription(label)
    t0 = time.perf_counter()
    _noop(build())
    el = time.perf_counter() - t0
    spark.sparkContext.setJobDescription(None)
    print(f"  {label:55s} {el:7.3f}s", flush=True)
    return el


def _df_histogram(spark, e, key_cols, label):
    """Posting-list stats for an inverted index: df quantiles, max,
    sum(df) and sum(df^2) (= self-join fan-out), top-10 hottest keys."""
    counts = e.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("df"))
    stats = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("df").alias("sum_df"),
        F.sum(F.col("df") * F.col("df")).alias("sum_df2"),
        F.max("df").alias("max_df"),
        F.expr("percentile_approx(df, array(0.5,0.9,0.99,0.999), 10000)").alias("q"),
    ).first()
    top = [r["df"] for r in counts.orderBy(F.desc("df")).limit(10).collect()]
    med = stats["q"][0]
    print(
        f"  {label}: keys={stats['n_keys']:,} sum_df={stats['sum_df']:,} "
        f"fanout(sum_df^2)={stats['sum_df2']:,} max_df={stats['max_df']} "
        f"p50/p90/p99/p999={list(stats['q'])} top10={top} "
        f"max/median={stats['max_df']/max(med,1):.1f}x",
        flush=True,
    )
    return stats


def audit_histograms(spark, sf_dir):
    from gmall2021_flink_dw_spark.datapipe.dedup import (
        DF_CAP_CEIL,
        LSH_BANDS,
        LSH_ROWS,
        SIMHASH_BLOCKS,
        _signatures_from_exploded,
        doc_shingles,
        simhash,
    )
    from gmall2021_flink_dw_spark.plans.datapipe import load_table
    import itertools

    docs = load_table(spark, sf_dir, "documents")
    print("posting-list histograms (join fan-out = sum over keys of df^2):")

    # 1. shingle inverted index, pre-cap and post-cap (the jaccard /
    #    clusters / ngram / minhash verify family)
    e = doc_shingles(docs, n=5)
    _df_histogram(spark, e, ["shingle"], "shingle index PRE-cap ")
    n_docs = e.select(F.count_distinct("doc_id")).first()[0]
    cap = max(5, min(-(-n_docs // 100), DF_CAP_CEIL))  # ceil(0.01n), ceil 500
    counts = e.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    kept = e.join(counts.filter(F.col("df") <= cap).select("shingle"), "shingle")
    _df_histogram(spark, kept, ["shingle"], f"shingle index POST-cap (cap={cap})")

    # 2. winnow fingerprint index (dedup_winnow_pairs)
    from gmall2021_flink_dw_spark.datapipe.text import winnow_fingerprint_rows

    w = winnow_fingerprint_rows(docs)
    _df_histogram(spark, w, ["h"], "winnow index PRE-cap  ")
    wc = w.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    wkept = w.join(wc.filter(F.col("df") <= cap).select("h"), "h")
    _df_histogram(spark, wkept, ["h"], f"winnow index POST-cap (cap={cap})")

    # 3. simhash combo-key index (dedup_simhash candidate buckets)
    sh = simhash(docs)
    nb, m = SIMHASH_BLOCKS, SIMHASH_BLOCKS - 5  # max_hamming=5 -> 3-block keys

    def combo_key(combo):
        val = F.lit(0).cast("long")
        for i in combo:
            val = val * 256 + F.col(f"block{i}")
        return val

    blocks = sh.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(ci).alias("blk"), combo_key(c).alias("val"))
                    for ci, c in enumerate(itertools.combinations(range(nb), m))
                ]
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.blk").alias("blk"), F.col("b.val").alias("val"))
    _df_histogram(spark, blocks, ["blk", "val"], "simhash combo index   ")

    # 4. LSH band index (dedup_minhash_lsh candidates)
    ex = doc_shingles(docs, n=5)
    sigs = _signatures_from_exploded(ex)
    bands = []
    for band in range(LSH_BANDS):
        cols = [f"s{band * LSH_ROWS + r}" for r in range(LSH_ROWS)]
        bands.append(
            F.struct(
                F.lit(band).alias("band"),
                F.xxhash64(*[F.col(c) for c in cols]).alias("bhash"),
            )
        )
    bx = sigs.select("doc_id", F.explode(F.array(*bands)).alias("b")).select(
        "doc_id", F.col("b.band").alias("band"), F.col("b.bhash").alias("bhash")
    )
    _df_histogram(spark, bx, ["band", "bhash"], "minhash band index    ")


def profile_stages(spark, sf_dir):
    from gmall2021_flink_dw_spark.cache import tracked_persist
    from gmall2021_flink_dw_spark.datapipe.dedup import (
        connected_components,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        shingle_grams,
        simhash,
        simhash_pairs,
    )
    from gmall2021_flink_dw_spark.datapipe.text import with_tokens
    from gmall2021_flink_dw_spark.plans.datapipe import load_table

    docs_raw = load_table(spark, sf_dir, "documents")

    print("dedup_simhash stage walls:")
    docs = tracked_persist(
        with_tokens(docs_raw).select("doc_id", "__tokens")
    )
    _timed(spark, "tokenize+persist corpus", lambda: docs)
    _timed(
        spark,
        "exact jaccard@0.95 side (capped inverted index)",
        lambda: ngram_jaccard_pairs(
            docs, n=5, threshold=0.95, max_df_frac=0.01, df_floor=5
        ),
    )
    _timed(spark, "simhash signatures (Arrow tile)", lambda: simhash(docs))
    _timed(
        spark,
        "simhash_pairs total (index+join+verify)",
        lambda: simhash_pairs(docs, max_hamming=5),
    )
    spark.catalog.clearCache()

    print("dedup_clusters stage walls:")
    _timed(
        spark,
        "jaccard@0.5 pairs",
        lambda: ngram_jaccard_pairs(
            docs_raw, n=5, threshold=0.5, max_df_frac=0.01, df_floor=5
        ),
    )
    pairs = ngram_jaccard_pairs(
        docs_raw, n=5, threshold=0.5, max_df_frac=0.01, df_floor=5
    )
    _timed(
        spark,
        "connected_components over pairs",
        lambda: connected_components(pairs.select("doc_a", "doc_b")),
    )
    spark.catalog.clearCache()

    print("dedup_minhash_lsh stage walls:")
    docs2 = with_tokens(docs_raw).select("doc_id", "__tokens")
    grams = shingle_grams(docs2, n=5)
    _timed(spark, "shingle grams persist", lambda: grams)
    _timed(
        spark,
        "lsh pairs (sig+bands+verify)",
        lambda: minhash_lsh_pairs(docs2, n=5, threshold=0.5, grams=grams),
    )
    spark.catalog.clearCache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("--stages", action="store_true")
    ap.add_argument("--hist", action="store_true")
    args = ap.parse_args()
    spark = get_spark("profile-dedup")
    ensure_workers_can_import(spark)
    t0 = time.perf_counter()
    if args.hist or not args.stages:
        audit_histograms(spark, args.sf_dir)
    if args.stages or not args.hist:
        profile_stages(spark, args.sf_dir)
    print(f"total {time.perf_counter() - t0:.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
