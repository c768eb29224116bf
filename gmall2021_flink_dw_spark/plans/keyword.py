"""Keyword stats: tokenizer UDTF + windowed word counts (SURVEY A5/D1/P10).

Re-expresses KeywordStatsApp: SQL filter on the page stream
(KeywordStatsApp.java:45-52), word segmentation via UDTF lateral join
(:56-61), then count(*) per word per window (:64-75). Here the
`documents` table is the text source; the lateral UDTF becomes
explode(tokenize(text)); the nondeterministic UNIX_TIMESTAMP() stamp
(:71) is replaced by a deterministic per-source grouping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall2021_flink_dw_spark.functions.tokenizer import TOKEN_RE, tokenize, tokenize_udf
from gmall2021_flink_dw_spark.registry import register
from gmall2021_flink_dw_spark.session import ensure_workers_can_import
from gmall2021_flink_dw_spark.sources.batch import load_table


@register(
    "dws_keyword_stats",
    oracle=f"""
    SELECT word AS keyword, 'search' AS source,
           count(*) AS ct,
           count(DISTINCT doc_id) AS doc_ct
    FROM (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS word
      FROM documents
      WHERE lang = 'en'
    )
    GROUP BY word
    """,
    doc="A5+D1: filter (P10, KeywordStatsApp.java:45-52) -> tokenizer "
    "UDTF lateral (D1, :56-61) -> per-word count agg (:64-75). JVM-side "
    "regexp tokenizer (whole-stage codegen) — no Python in the hot path.",
    tags=("dws", "udtf", "agg", "text"),
)
def dws_keyword_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    # two-phase distinct: pre-aggregate on (word, doc_id) then count the
    # doc groups — no Expand doubling the exploded-token shuffle, and
    # both phases stack on the explicit repartition (one shuffle).
    pre = (
        docs.select("doc_id", F.explode(tokenize("text")).alias("word"))
        .repartition(F.col("word"))
        .groupBy("word", "doc_id")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    return (
        pre.groupBy("word")
        .agg(
            F.sum("_c").alias("ct"),
            F.count(F.lit(1)).alias("doc_ct"),
        )
        .select(
            F.col("word").alias("keyword"),
            F.lit("search").alias("source"),
            "ct",
            "doc_ct",
        )
    )


@register(
    "dws_keyword_stats_udf",
    oracle=f"""
    SELECT word AS keyword, count(*) AS ct
    FROM (
      SELECT unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS word
      FROM documents
      WHERE lang = 'en'
    )
    GROUP BY word
    """,
    doc="D1 slow-path variant: the same tokenization through the Arrow-"
    "batched pandas UDF (SplitFunction.java parity incl. on-error emit-"
    "input). Same oracle as the codegen path — proves both agree.",
    tags=("dws", "udtf", "udf", "text"),
)
def dws_keyword_stats_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_workers_can_import(spark)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    return (
        docs.select(F.explode(tokenize_udf("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("ct"))
        .select(F.col("word").alias("keyword"), "ct")
    )
