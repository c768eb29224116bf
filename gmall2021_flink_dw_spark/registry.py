"""Central query registry.

Every capability claimed from SURVEY.md §2 registers here as a
:class:`QuerySpec`: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus
(where SQL-expressible) the equivalent DuckDB oracle SQL over the same
parquet tables. ``__spark_entry__.py`` exposes this registry to the
driver; ``tests/test_oracle_parity.py`` runs the identical comparison
locally, so the pytest suite and the driver's correctness gate are the
same check.

Determinism rules (so value-hashes match across engines):
- money/double aggregates are computed in DECIMAL(18,2) (exact, order
  independent) then cast to DOUBLE in BOTH engines;
- timestamps in outputs are formatted 'yyyy-MM-dd HH:mm:ss' strings;
- every computed column is explicitly aliased identically on both sides;
- ORDER BY ... LIMIT queries use a total order (tie-broken by key).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => driver does rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}

# Modules that register queries on import. Import order no longer
# drives driver visibility — _DRIVER_WINDOW below explicitly orders the
# correctness-gate prefix each round; modules just need to all load.
_QUERY_MODULES = (
    "gmall2021_flink_dw_spark.plans.datapipe",
    "gmall2021_flink_dw_spark.plans.cdc_routing",
    "gmall2021_flink_dw_spark.plans.streaming_queries",
    "gmall2021_flink_dw_spark.plans.keyword",
    "gmall2021_flink_dw_spark.plans.stats",
    "gmall2021_flink_dw_spark.plans.union_stats",
    "gmall2021_flink_dw_spark.plans.log_pipeline",
    "gmall2021_flink_dw_spark.plans.order_pipeline",
    "gmall2021_flink_dw_spark.plans.ads",
    "gmall2021_flink_dw_spark.plans.advanced",
    "gmall2021_flink_dw_spark.plans.tpch",
    "gmall2021_flink_dw_spark.plans.tpch_extra",
    "gmall2021_flink_dw_spark.plans.tpch_full",
)


def register(
    name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")

        def entry(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Every query entry opens a new cache epoch — reclaims the
            # previous query's tracked persists (see cache.py); that
            # result is consumed by the time the next query runs.
            from gmall2021_flink_dw_spark.cache import open_cache_epoch

            open_cache_epoch()
            return fn(spark, sf_dir)

        entry.__name__ = fn.__name__
        entry.__doc__ = fn.__doc__
        REGISTRY[name] = QuerySpec(
            name=name, fn=entry, oracle=oracle, doc=doc, tags=tags
        )
        return fn

    return deco


# Driver-visibility rotation (VERDICT r02 item 2): the driver's
# correctness gate records a bounded PREFIX of the order queries()
# returns (50 entries in r01/r02), so every round this list is rebuilt
# to front-load (a) queries whose plan changed since their latest
# CORRECTNESS row, (b) brand-new queries, then (c) the queries whose
# newest driver row is oldest. Names listed here are surfaced first, in
# order; everything else follows in registration order.
#
# r04 window: (a) the five r03 late-landers that have NEVER had a
# driver row (VERDICT r03 item 1 — streaming_cdc_upsert also has a plan
# change this round: log-structured merge-on-read), (b) queries new this
# round, then (c) every query whose newest driver row is r01/r02 —
# r03 touched shared helpers (datapipe/text.py, functions/tokenizer.py,
# sources/batch.py) that transitively feed the whole r02 cohort, so all
# 44 r02 rows plus the one r01 row (dws_sales_cube) are stale. The r03
# cohort (50 fresh rows) rotates out for one round. Total = 50.
_DRIVER_WINDOW = (
    # (a) never driver-checked (and streaming_cdc_upsert replanned r04)
    "streaming_cdc_upsert",
    "sample_training_mix",
    "corpus_summary",
    "multimodal_resize",
    "text_token_counts",
    # (b) new this round
    "corpus_train_pipeline",
    "sample_mix_allocator",
    "text_boilerplate",
    "streaming_keyword_stats",
    "sample_curriculum_rank",
    # (c) newest driver row r01 then r02, oldest-first
    "dws_sales_cube",
    "text_stats",
    "lang_id",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "ann_topk",
    "multimodal_decode",
    "dedup_embedding_cosine",
    "text_quality",
    "doc_winnow_fingerprint",
    "multimodal_frame_sample",
    # sample_hash_bucket yields its slot to sample_curriculum_rank: its
    # md5 per-mille gate is the identical mechanism exercised by the
    # in-window sample_stratified (grouped form) and sample_training_mix
    # (weighted form).
    "text_redact",
    "corpus_clean",
    "sample_stratified",
    "vocab_top_tokens",
    "dedup_clusters",
    "corpus_contamination",
    "tfidf_top_terms",
    "pack_sequences",
    "dedup_survivors_by_quality",
    "cdc_changelog",
    "cdc_route",
    # cdc_route_projected yields its slot to streaming_keyword_stats:
    # it is the projection variant of cdc_route (same route plan + a
    # column projection), covered by the primary's fresh row.
    "cdc_snapshot_at",
    "cdc_dim_snapshot",
    "streaming_visitor_stats",
    "streaming_exact_distinct",
    "streaming_new_user_flag",
    "streaming_interval_join",
    "streaming_uv_dedup",
    "dws_keyword_stats",
    # dws_keyword_stats_udf + dws_product_stats_approx yield their slots
    # to the two new r04 queries: each is a same-plan variant of an
    # in-window primary (Arrow twin of dws_keyword_stats; sketch variant
    # of dws_product_stats), so the primary's fresh row covers the
    # shared path and their staleness stays within the asserted 2-round
    # bound.
    "dws_visitor_stats",
    "dws_product_stats",
    "dws_province_stats",
    "dws_order_quantiles_approx",
    "dws_promo_window_stats",
    "dws_event_measures",
    "dwd_clean_events",
    "dwd_event_split_counts",
    "dwm_unique_visit",
    "dwd_new_user_flag",
    # dws_visitor_stats_compat yields its slot to corpus_train_pipeline:
    # it is the pv-quirk twin of dws_visitor_stats (same plan, one
    # projection differs), so the primary's fresh row covers the shared
    # path; its staleness stays within the 2-round bound asserted by
    # tests/test_catalog.py.
)


def load_all() -> dict[str, QuerySpec]:
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    missing = [n for n in _DRIVER_WINDOW if n not in REGISTRY]
    if missing:  # not assert: must survive python -O (ADVICE r03)
        raise ValueError(f"_DRIVER_WINDOW names not registered: {missing}")
    ordered = {n: REGISTRY[n] for n in _DRIVER_WINDOW}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    return ordered
