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
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc, tags=tags)
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
# r03 window: the six sketch queries rewritten into the
# exact-rows+pinned-flag form this round, the six new queries (CJK
# golden, SCD2, native session windows, HLL sketch rollup, streaming
# hopping, multimodal embed), then the 39 queries whose only driver row is r01 (TPC-H
# shape set, ADS, advanced windows, order/log DWM). Total = 50.
_DRIVER_WINDOW = (
    # (a) plan changed this round
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_bucketed",
    "ann_ivf",
    "dedup_embedding_lsh",
    "streaming_jump_detect",
    # (b) new this round
    "dws_keyword_stats_zh",
    "cdc_scd2",
    "streaming_session_window",
    "dws_uv_sketch_rollup",
    "streaming_hopping_stats",
    "multimodal_embed",
    # (c) newest driver row = r01
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q4_semi",
    "tpch_q16_anti",
    "tpch_q12_caseagg",
    "tpch_q14_promo",
    "tpch_q18_bigorders",
    "tpch_q19_disjunct",
    "tpch_q2_mincost",
    "tpch_q7_volume",
    "tpch_q8_marketshare",
    "tpch_q9_profit",
    "tpch_q10_returns",
    "tpch_q11_importance",
    "tpch_q13_custdist",
    "tpch_q15_topsupplier",
    "tpch_q17_smallqty",
    "tpch_q20_excess",
    "tpch_q21_waiting",
    "tpch_q22_inactive",
    "dwm_user_jump",
    "dwm_session_stats",
    "dwm_order_wide",
    "dwm_order_wide_missdrop",
    "dwm_payment_wide",
    "ads_gmv_by_day",
    "ads_top_brands",
    "ads_top_types",
    "ads_top_parts",
    "ads_top_parts_per_brand",
    "ads_order_quantiles",
    "cdc_asof_enrich",
    "dws_session_window",
    "dws_salted_agg",
    "dws_hopping_stats",
    "dws_sales_rollup",
    # dws_sales_cube yields its slot to multimodal_embed: it is the
    # grouping-set twin of dws_sales_rollup (same aggregate, wider
    # grouping sets), so rollup's fresh row covers the shared path.
    # r04 rotation TODO: multimodal_resize, text_token_counts,
    # streaming_cdc_upsert, sample_training_mix and corpus_summary landed after the
    # window filled — front-load them next round.
)


def load_all() -> dict[str, QuerySpec]:
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    missing = [n for n in _DRIVER_WINDOW if n not in REGISTRY]
    assert not missing, f"_DRIVER_WINDOW names not registered: {missing}"
    ordered = {n: REGISTRY[n] for n in _DRIVER_WINDOW}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    return ordered
