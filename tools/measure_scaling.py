"""Reproduce the BASELINE.md scaling-decade measurements.

Times registered queries (solo, min-of-3, noop sink, cache cleared
between queries) at two data directories and prints per-query ratios.
The committed second/third-decade tables in BASELINE.md were produced
with exactly this protocol over tools/gen_scale_data.py outputs:

    python tools/gen_scale_data.py --mult 1   --out /tmp/testdata_g01
    python tools/gen_scale_data.py --mult 10  --out /tmp/testdata_sf1
    python tools/gen_scale_data.py --mult 100 --out /tmp/testdata_g10
    python tools/measure_scaling.py /tmp/testdata_g01 /tmp/testdata_sf1 \
        dedup_simhash dedup_clusters dedup_minhash_lsh streaming_cdc_upsert \
        dedup_ngram_jaccard ann_ivf vocab_top_tokens text_quality
    python tools/measure_scaling.py /tmp/testdata_sf1 /tmp/testdata_g10 \
        text_quality vocab_top_tokens text_repetition dedup_exact \
        corpus_train_pipeline ann_ivf ann_pq streaming_cdc_upsert

Run SOLO — any co-running JVM inflates readings 2-4x (BASELINE.md
methodology). Generated dirs carry only documents/embeddings/orders, so
only queries over those tables are measurable against them.
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from gmall2021_flink_dw_spark.registry import load_all
from gmall2021_flink_dw_spark.session import get_spark


def time_query(spark, fn, sf_dir: str, runs: int = 3) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    spark.catalog.clearCache()
    return round(best, 3)


def main() -> None:
    if len(sys.argv) < 4:
        raise SystemExit(
            "usage: measure_scaling.py <dir_small> <dir_large> <query> [query...]"
        )
    d_small, d_large, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    reg = load_all()
    unknown = [n for n in names if n not in reg]
    if unknown:
        raise SystemExit(f"not registered: {unknown}")
    spark = get_spark("measure-scaling")
    # warm the JVM so the first timed query doesn't pay session startup
    reg[names[0]].fn(spark, d_small).write.format("noop").mode(
        "overwrite"
    ).save()
    small = {n: time_query(spark, reg[n].fn, d_small) for n in names}
    large = {n: time_query(spark, reg[n].fn, d_large) for n in names}
    print(f"| query | {d_small} s | {d_large} s | ratio |")
    print("| --- | --- | --- | --- |")
    for n in names:
        r = large[n] / small[n] if small[n] else float("nan")
        print(f"| {n} | {small[n]} | {large[n]} | {r:.1f} |")
    spark.stop()


if __name__ == "__main__":
    main()
