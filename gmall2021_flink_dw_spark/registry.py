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
    "gmall2021_flink_dw_spark.plans.bpe",
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
# returns (50 entries per round), so every round this list is rebuilt
# to front-load (a) queries whose newest driver row is oldest, (b)
# brand-new queries and queries whose plan changed since their latest
# CORRECTNESS row, then (c) oldest-first among the rest. Names listed
# here are surfaced first, in order; everything else follows in
# registration order.
#
# _WINDOW_ROUND pins the round this window was built FOR. CATALOG.md and
# the rotation tests (tests/test_catalog.py) read only driver artifacts
# from rounds < _WINDOW_ROUND, so the tree stays green by construction
# when the driver drops CORRECTNESS_r{_WINDOW_ROUND}.json after the last
# commit (VERDICT r04 item 1: the handover state must be green; the
# forcing function moves to the start-of-round bump, asserted by
# test_window_round_is_bumped).
_WINDOW_ROUND = 14

# r14 window (VERDICT r13 item 1): executes the rebuild the r13 judge
# mandated, led by the 25-name list pre-committed in r13 (commit
# 8f51e25). Census entering r14: 159 registered queries (held, VERDICT
# r13 item 7); staleness bound stays at ceil(159/50) - 1 = 3
# successful driver rounds.
#
# Layout: (a) the 25 names whose newest driver row is r10, effective
# staleness 3 entering r14, AT the bound (spilled from the r13
# rebuild, pre-committed there to lead this one): the 17 TPC-H shapes
# plus sample_leakage_free_split, dws_keyword_stats_zh,
# cdc_asof_enrich, dws_funnel_conversion, dws_retention_cohorts,
# ads_top_parts_per_brand, dws_sales_rollup, ads_order_quantiles;
# (b) the remaining 25 slots fill from the 34-name r11 cohort in
# registration order. The 9 r11 names that do not fit sit at
# effective staleness 3 after r14 (exactly the bound, still legal)
# and MUST lead the r15 rebuild: cdc_scd2, streaming_visitor_stats,
# streaming_exact_distinct, streaming_interval_join,
# streaming_session_window, streaming_keyword_stats,
# dws_keyword_stats, dws_visitor_stats, dws_product_stats.
_DRIVER_WINDOW = (
    # (a) newest driver row r10, at the staleness bound of 3
    "sample_leakage_free_split",
    "dws_keyword_stats_zh",
    "cdc_asof_enrich",
    "dws_funnel_conversion",
    "dws_retention_cohorts",
    "tpch_q5",
    "tpch_q6",
    "tpch_q4_semi",
    "tpch_q16_anti",
    "tpch_q12_caseagg",
    "tpch_q14_promo",
    "tpch_q18_bigorders",
    "tpch_q19_disjunct",
    "ads_top_parts_per_brand",
    "dws_sales_rollup",
    "ads_order_quantiles",
    "tpch_q2_mincost",
    "tpch_q8_marketshare",
    "tpch_q9_profit",
    "tpch_q11_importance",
    "tpch_q13_custdist",
    "tpch_q17_smallqty",
    "tpch_q21_waiting",
    "tpch_q22_inactive",
    "tpch_q20_excess",
    # (b) the r11 cohort, registration order; the 9 spilled names
    # listed above MUST lead the r15 rebuild
    "text_stats",
    "lang_id",
    "dedup_exact",
    "multimodal_decode",
    "multimodal_decode_real",
    "quality_classifier",
    "text_perplexity",
    "sample_hash_bucket",
    "dedup_embedding_lsh",
    "multimodal_embed",
    "sample_curriculum_rank",
    "streaming_dedup_ingest",
    "corpus_length_histogram",
    "corpus_filter_pipeline",
    "sample_ccnet_buckets",
    "dedup_substring_clean_hashed",
    "dedup_substring_keepfirst_hashed",
    "tokenizer_train_bpe",
    "tokenizer_apply_bpe",
    "tokenizer_tokenize_docs",
    "cdc_changelog",
    "cdc_route",
    "cdc_route_projected",
    "cdc_snapshot_at",
    "cdc_dim_snapshot",
)

# Queries registered AFTER the upcoming round's 50-slot window filled.
# These carry local oracle parity but zero driver evidence yet, and
# MUST be the first (b)-section entries of the NEXT window rebuild.
# tests/test_catalog.py projects them to round _WINDOW_ROUND + 1 and
# caps how many may wait. New r12 queries appended as they land.
_PENDING_FIRST_WINDOW: tuple[str, ...] = ()


def load_all() -> dict[str, QuerySpec]:
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    missing = [n for n in _DRIVER_WINDOW if n not in REGISTRY]
    if missing:  # not assert: must survive python -O (ADVICE r03)
        raise ValueError(f"_DRIVER_WINDOW names not registered: {missing}")
    ordered = {n: REGISTRY[n] for n in _DRIVER_WINDOW}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    return ordered
