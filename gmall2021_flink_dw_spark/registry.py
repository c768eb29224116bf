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
_WINDOW_ROUND = 9

# r09 window (ADVICE r08 item 1): the r08 driver run CRASHED at
# load_all() — an unregistered placeholder name in this list —
# so CORRECTNESS_r08.json is empty and NOTHING was refreshed in r08.
# Staleness is therefore counted in SUCCESSFUL driver rounds
# (artifacts with >=1 row; see tests/test_catalog.py): the crashed
# round provided no evidence and consumed no rotation capacity, and
# counting it as a calendar round would make the invariant
# unsatisfiable (28 newest=r5 + 48 newest=r6 = 76 stale > 50 slots).
# Effective sequence entering r09: [r1..r7, r9].
#
# This window re-runs the r08 plan: (a) the 28 queries whose newest
# driver row is r05 — effective staleness 3, MUST front-load;
# (b) multimodal_decode_mixed (registered in r08, zero driver
# evidence) plus any queries new or replanned this round — new
# queries swap in as they land, displacing tail fill; (c) fill from
# the r06 cohort (48 queries) in registration order.
# CAPACITY NOTE (end of r09): the census reached 152 registered
# queries, past the 150 = 3x50 ceiling that made a staleness bound of
# 2 feasible; tests/test_catalog.py now derives the bound as
# ceil(N/50)-1 (= 3 at 152, floored at 2). The r10 rebuild MUST place
# the _PENDING_FIRST_WINDOW names (zero driver evidence) first, then
# fill the remaining 46 slots from the 48-name r06 cohort below,
# oldest-first; the ~2 spilled names sit at effective staleness 3 (the
# new bound, still legal) and lead r11 together with the r07 cohort.
# The r06-cohort names left out are effective staleness exactly 2
# at r09 — within bound — and front-load r10:
# corpus_summary, corpus_train_pipeline, sample_mix_allocator,
# dedup_paragraphs, dws_keyword_stats_zh, cdc_asof_enrich, tpch_q5, tpch_q6,
# tpch_q4_semi, tpch_q16_anti, tpch_q12_caseagg, tpch_q14_promo,
# tpch_q18_bigorders, tpch_q19_disjunct, ads_top_parts_per_brand,
# dws_sales_rollup, ads_order_quantiles, tpch_q2_mincost,
# tpch_q8_marketshare, tpch_q9_profit, tpch_q11_importance,
# tpch_q13_custdist, tpch_q17_smallqty, tpch_q21_waiting, tpch_q22_inactive,
# tpch_q20_excess, sample_training_mix, text_token_counts,
# multimodal_resize, dedup_survivors_by_quality, tfidf_top_terms,
# pack_sequences, dedup_clusters, corpus_contamination, corpus_clean,
# sample_stratified, vocab_top_tokens, doc_winnow_fingerprint,
# multimodal_frame_sample, text_redact, text_quality,
# dedup_embedding_cosine, multimodal_decode, ann_topk, text_stats,
# lang_id, dedup_exact, dedup_ngram_jaccard (the last
# twenty-one displaced by the twenty-one r09 new queries; the 22nd
# r09 query, embedding_pca_power, did not fit the 50-slot window and
# front-loads r10 with the staleness-2 cohort:
# multimodal_audio_features, dedup_substring_spans,
# multimodal_image_stats, dedup_substring_clean,
# dedup_substring_spans_hashed, dedup_substring_clean_keepfirst,
# source_jsonl_events, source_orc_events, source_csv_docs,
# text_normalize, shard_balance, source_schema_evolution,
# lake_compact_events, dws_event_pivot, ads_gmv_trailing_7d,
# source_variant_props, cdc_incremental_agg, text_heavy_hitters,
# sample_dsir, lake_zorder_layout, embedding_gram).
# Total = 50.
_DRIVER_WINDOW = (
    # (a) newest=r05, at the staleness bound
    "streaming_late_data_drop",
    "streaming_dws_sink",
    "streaming_gmv_dashboard",
    "streaming_gmv_update_log",
    "dws_keyword_stats_udf",
    "dws_product_stats_approx",
    "dws_visitor_stats_compat",
    "kafka_wire_events",
    "dwm_user_jump",
    "dwm_session_stats",
    "dwm_order_wide",
    "dwm_order_wide_missdrop",
    "dwm_payment_wide",
    "ads_gmv_by_day",
    "ads_top_brands",
    "ads_top_types",
    "ads_top_parts",
    "dws_session_window",
    "dws_salted_agg",
    "tpch_q10_returns",
    "tpch_q15_topsupplier",
    "tpch_q7_volume",
    "dws_hopping_stats",
    "dws_uv_sketch_rollup",
    "tpch_q1",
    "tpch_q3",
    "streaming_topic_router",
    "streaming_hopping_stats",
    # (b) new this round / zero driver evidence — swapped in as they land
    "multimodal_decode_mixed",
    "multimodal_audio_features",
    "dedup_substring_spans",
    "multimodal_image_stats",
    "dedup_substring_clean",
    "dedup_substring_spans_hashed",
    "dedup_substring_clean_keepfirst",
    "source_jsonl_events",
    "source_orc_events",
    "source_csv_docs",
    "text_normalize",
    "shard_balance",
    "source_schema_evolution",
    "lake_compact_events",
    "dws_event_pivot",
    "ads_gmv_trailing_7d",
    "source_variant_props",
    "cdc_incremental_agg",
    "text_heavy_hitters",
    "sample_dsir",
    "lake_zorder_layout",
    "embedding_gram",
)

# Queries registered AFTER the upcoming round's 50-slot window filled
# (22 new queries landed in r09 against 22 free slots). These carry
# local oracle parity but zero driver evidence yet, and MUST be the
# first (b)-section entries of the NEXT window rebuild — the same
# pre-commitment the VERDICT r03 rotation fix introduced for displaced
# cohort names. tests/test_catalog.py projects them to round
# _WINDOW_ROUND + 1 and caps how many may wait.
_PENDING_FIRST_WINDOW = (
    "embedding_pca_power",
    "sample_leakage_free_split",
    "dws_funnel_conversion",
    "dws_retention_cohorts",
    "streaming_heavy_hitters",
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
