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
_WINDOW_ROUND = 11

# r11 window (VERDICT r10 item 1): executes the rebuild pre-committed
# at the end of r10. Census entering r11: 156 registered queries, so
# the staleness bound derived by tests/test_catalog.py stays at
# ceil(156/50) - 1 = 3 successful driver rounds. Effective round
# sequence entering r11: [r1..r7, r9, r10] (r08 crashed, zero
# evidence, consumed no rotation capacity).
#
# Layout: (a) the three _PENDING_FIRST_WINDOW names from r10 — the
# only registered queries with ZERO driver evidence — go first;
# (b) the six names whose newest driver row is r06 (effective
# staleness 3 entering r11 — AT the bound; three spilled from the r10
# rebuild, three displaced by r10's replanned-query exception);
# (c) the remaining 41 slots fill from the 50-name r07 cohort in
# registration order. The 9 spilled r07 names — dws_province_stats,
# dws_order_quantiles_approx, dws_promo_window_stats,
# dws_event_measures, dwd_clean_events, dwd_event_split_counts,
# dwm_unique_visit, dwd_new_user_flag, dws_sales_cube — sit at
# effective staleness 3 after r11 (exactly the bound, still legal)
# and MUST lead the r12 rebuild. NOTE (r11 mid-round): the bigram-LM
# core shared by text_perplexity and sample_ccnet_buckets is being
# replanned this round (VERDICT r10 item 2); both names are already
# inside this window ((a) and (c) sections), so the changed plans
# re-verify without a displacement exception.
_DRIVER_WINDOW = (
    # (a) zero driver evidence — pre-committed in r10's
    # _PENDING_FIRST_WINDOW; front-loaded verbatim
    "sample_ccnet_buckets",
    "dedup_substring_clean_hashed",
    "dedup_substring_keepfirst_hashed",
    # (b) newest driver row r06 — at the staleness bound of 3
    "text_stats",
    "lang_id",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "ann_topk",
    "multimodal_decode",
    # (c) the r07 cohort, registration order; first 41 of 50 (the 9
    # names listed in the header comment spill to r12 at staleness 3)
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_bucketed",
    "multimodal_decode_real",
    "quality_classifier",
    "text_perplexity",
    "dedup_winnow_pairs",
    "ann_ivf",
    "ann_pq",
    "sample_hash_bucket",
    "dedup_embedding_lsh",
    "dedup_semantic",
    "multimodal_embed",
    "text_boilerplate",
    "sample_curriculum_rank",
    "text_repetition",
    "streaming_dedup_ingest",
    "corpus_length_histogram",
    "corpus_ngram_novelty",
    "corpus_filter_pipeline",
    "tokenizer_train_bpe",
    "tokenizer_apply_bpe",
    "tokenizer_tokenize_docs",
    "cdc_changelog",
    "cdc_route",
    "cdc_route_projected",
    "cdc_snapshot_at",
    "cdc_dim_snapshot",
    "cdc_scd2",
    "streaming_cdc_upsert",
    "streaming_visitor_stats",
    "streaming_exact_distinct",
    "streaming_new_user_flag",
    "streaming_interval_join",
    "streaming_uv_dedup",
    "streaming_jump_detect",
    "streaming_session_window",
    "streaming_keyword_stats",
    "dws_keyword_stats",
    "dws_visitor_stats",
    "dws_product_stats",
)

# Queries registered AFTER the upcoming round's 50-slot window filled.
# These carry local oracle parity but zero driver evidence yet, and
# MUST be the first (b)-section entries of the NEXT window rebuild.
# tests/test_catalog.py projects them to round _WINDOW_ROUND + 1 and
# caps how many may wait. New r11 queries appended as they land.
_PENDING_FIRST_WINDOW: tuple[str, ...] = (
    "multimodal_decode_jpeg_ac",
    "vocab_coverage",
    "sample_weighted",
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
