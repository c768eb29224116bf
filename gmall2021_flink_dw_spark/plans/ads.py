"""ADS serving-layer queries (SURVEY §2.5 A6-A7, §2.7, §3.3).

The reference serves these from ClickHouse via MyBatis-annotated SQL
(ProductStatsMapper.java:15-38, SugarController defaults limit=10/4/20):
GMV grand total and group-by + SUM + HAVING + ORDER BY DESC + LIMIT
top-N. Here they are plain spark.sql over registered views — Catalyst
plans TakeOrderedAndProject for the top-N (no full sort).

Top-N ties are broken by the group key so the LIMIT is a total order
(the reference's bare ORDER BY amount is nondeterministic on ties).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gmall2021_flink_dw_spark.registry import register
from gmall2021_flink_dw_spark.sources.batch import load_table

_DISC_AMOUNT = (
    "cast(l_extendedprice as decimal(18,2)) * (1 - cast(l_discount as decimal(4,2)))"
)


def _sql(spark: SparkSession, sf_dir: str, tables: list[str], sql: str) -> DataFrame:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(sql)


_GMV_SQL = """
SELECT strftime(o_orderdate, '%Y-%m-%d') AS dt,
       cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS gmv,
       count(*) AS order_ct
FROM orders
WHERE o_orderdate >= timestamp '1997-03-01' AND o_orderdate < timestamp '1997-04-01'
GROUP BY 1
"""


@register(
    "ads_gmv_by_day",
    oracle=_GMV_SQL,
    doc="A6 GMV grand total (ProductStatsMapper.java:15-17: sum(order_"
    "amount) where toYYYYMMDD(stt)=#{date}) — per-day GMV over one month.",
    tags=("ads", "agg", "sql"),
)
def ads_gmv_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark's date_format uses JVM patterns; keep SQL otherwise verbatim.
    sql = _GMV_SQL.replace("strftime(o_orderdate, '%Y-%m-%d')", "date_format(o_orderdate, 'yyyy-MM-dd')")
    return _sql(spark, sf_dir, ["orders"], sql)


@register(
    "ads_top_brands",
    oracle=f"""
    SELECT p_brand,
           cast(sum({_DISC_AMOUNT}) as double) AS order_amount
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    HAVING sum({_DISC_AMOUNT}) > 0
    ORDER BY order_amount DESC, p_brand
    LIMIT 10
    """,
    doc="A7 trademark top-N (ProductStatsMapper.java:34-38): GROUP BY + "
    "SUM + HAVING>0 + ORDER BY DESC + LIMIT 10 (SugarController default).",
    tags=("ads", "agg", "topn", "sql"),
)
def ads_top_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        ["lineitem", "part"],
        f"""
        SELECT p_brand,
               cast(sum({_DISC_AMOUNT}) as double) AS order_amount
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
        HAVING sum({_DISC_AMOUNT}) > 0
        ORDER BY order_amount DESC, p_brand
        LIMIT 10
        """,
    )


@register(
    "ads_top_types",
    oracle=f"""
    SELECT p_type,
           cast(sum({_DISC_AMOUNT}) as double) AS order_amount,
           count(DISTINCT l_orderkey) AS order_ct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_type
    HAVING sum({_DISC_AMOUNT}) > 0
    ORDER BY order_amount DESC, p_type
    LIMIT 4
    """,
    doc="A7 category3 top-N analog (limit 4 = SugarController.java:118 "
    "default); p_type stands in for category.",
    tags=("ads", "agg", "topn", "sql"),
)
def ads_top_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        ["lineitem", "part"],
        f"""
        SELECT p_type,
               cast(sum({_DISC_AMOUNT}) as double) AS order_amount,
               count(DISTINCT l_orderkey) AS order_ct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_type
        HAVING sum({_DISC_AMOUNT}) > 0
        ORDER BY order_amount DESC, p_type
        LIMIT 4
        """,
    )


@register(
    "ads_top_parts",
    oracle=f"""
    SELECT p_partkey, p_name,
           cast(sum({_DISC_AMOUNT}) as double) AS order_amount
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_partkey, p_name
    HAVING sum({_DISC_AMOUNT}) > 0
    ORDER BY order_amount DESC, p_partkey
    LIMIT 20
    """,
    doc="A7 spu top-N analog (limit 20 = SugarController.java:159 default).",
    tags=("ads", "agg", "topn", "sql"),
)
def ads_top_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        ["lineitem", "part"],
        f"""
        SELECT p_partkey, p_name,
               cast(sum({_DISC_AMOUNT}) as double) AS order_amount
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_partkey, p_name
        HAVING sum({_DISC_AMOUNT}) > 0
        ORDER BY order_amount DESC, p_partkey
        LIMIT 20
        """,
    )
