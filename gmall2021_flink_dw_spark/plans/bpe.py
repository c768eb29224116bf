"""Distributed BPE tokenizer training (VERDICT r05 item 4).

The last standard LLM-pretraining-data operator the repo lacked:
byte-pair-encoding vocabulary TRAINING (Sennrich et al., ACL 2016) as a
bounded iterative Spark job, plus an apply query that tokenizes the
corpus with the learned merges. The reference has no tokenizer-training
surface (its text path is IKAnalyzer segmentation for keyword stats,
KeywordUtil.java:13-35); this extends the repo's LLM-datapipe family.

Algorithm (classic corpus BPE, expressed Spark-first):
- Pre-tokenize once into a DISTINCT-word frequency table — the working
  set is vocabulary-bounded (Heaps' law: ~unique words, not corpus
  size), so the per-round work is tiny relative to the corpus no matter
  the scale factor. One shuffle, map-side combined.
- Each round: explode adjacent symbol pairs (weighted by word count),
  two-phase aggregate to the single most-frequent pair (ties broken by
  pair text ascending — with a ' ' separator that sorts below [a-z],
  string order == (lhs, rhs) tuple order), then rewrite every word's
  symbol string with a greedy left-to-right fold (SQL `aggregate`
  higher-order function, JVM codegen — no Python row path).
- The per-round argmax is collected as a ONE-ROW driver scalar: each
  round's input depends on the previous round's winner, so the scalar
  is inherent to the fixpoint-style loop (same accepted class as
  connected-components' convergence flag, datapipe/dedup.py). Keeping
  the winner lazy instead (crossJoin per round) doubles the logical
  plan per round — exponential plan growth by round 20.
- Lineage is cut with a tracked persist every few rounds so round k
  recomputes O(words) from the nearest persist, not O(k * words).

100 TB design: the corpus-sized work is exactly one pre-tokenization
pass; every round after that runs on the distinct-word table (millions
of rows at web scale — a per-round shuffle of a few MB after map-side
combine). This is the textbook distributed-BPE layout; merge apply is
a narrow per-row fold with no shuffle at all.

Cross-engine determinism: symbols are always [a-z]+ (pre-tokenization
keeps 1-16 char lowercase words), the separator is a single space, all
counts are exact integers, and the DuckDB oracle replays the identical
greedy fold + argmax via an UNROLLED 20-stage CTE chain (`list_reduce`
with the same accumulator algebra), so the learned merge sequence is
bit-identical by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall2021_flink_dw_spark.cache import tracked_persist
from gmall2021_flink_dw_spark.registry import register
from gmall2021_flink_dw_spark.sources.batch import load_table

N_MERGES = 20
_PERSIST_EVERY = 4

# ---------------------------------------------------------------- Spark side


def _word_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> distinct (s, cnt): s = word as space-joined symbols."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w")
    ).filter(F.length("w").between(1, 16))
    counts = words.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    return counts.select(
        F.array_join(F.split("w", ""), " ").alias("s"), "cnt"
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-symbol pair totals, two-phase (explode is map-side)."""
    pairs = words.select(
        F.explode(
            F.expr(
                "CASE WHEN size(split(s, ' ')) < 2 THEN array() "
                "ELSE transform(sequence(1, size(split(s, ' ')) - 1), "
                "i -> concat(element_at(split(s, ' '), i), ' ', "
                "element_at(split(s, ' '), i + 1))) END"
            )
        ).alias("pair"),
        "cnt",
    )
    return pairs.groupBy("pair").agg(F.sum("cnt").alias("total"))


def _merge_expr(lhs: str, rhs: str) -> F.Column:
    """Greedy left-to-right merge of adjacent (lhs, rhs) in s.

    Fold over the symbol list with a string accumulator: merging means
    the accumulator's last symbol is lhs and the incoming symbol is
    rhs — append WITHOUT the separator. The merged symbol lhs||rhs can
    never re-match lhs as a suffix boundary within the same pass, which
    is exactly BPE's non-overlapping greedy semantics ('aaaa' + (a,a)
    -> 'aa aa', not 'aa a a').
    """
    # lhs/rhs are [a-z]+ driver scalars from the previous round's argmax
    return F.expr(
        "aggregate(slice(split(s, ' '), 2, size(split(s, ' ')) - 1), "
        "element_at(split(s, ' '), 1), "
        "(acc, x) -> CASE WHEN (acc = '{a}' OR endswith(acc, ' {a}')) "
        "AND x = '{b}' THEN concat(acc, x) "
        "ELSE concat(acc, ' ', x) END)".format(a=lhs, b=rhs)
    )


def _train_merges(
    spark: SparkSession, sf_dir: str, n_merges: int = N_MERGES
) -> tuple[list[tuple[int, str, str, str, int]], DataFrame]:
    """Run the merge loop; return (merge table rows, final word table)."""
    words = tracked_persist(_word_symbols(spark, sf_dir))
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        top = (
            _pair_counts(words)
            .orderBy(F.col("total").desc(), "pair")
            .limit(1)
            .collect()
        )
        if not top:
            break
        pair, total = top[0]["pair"], int(top[0]["total"])
        lhs, rhs = pair.split(" ")
        merges.append((rank, lhs, rhs, lhs + rhs, total))
        words = words.select(_merge_expr(lhs, rhs).alias("s"), "cnt")
        if rank % _PERSIST_EVERY == 0:
            words = tracked_persist(words)
    return merges, words


# --------------------------------------------------------------- oracle side


def _duck_stage(i: int) -> str:
    """One unrolled (argmax pair -> rewrite words) oracle stage.

    Every stage is MATERIALIZED: DuckDB inlines plain CTEs per
    reference, and each w{{i}} is referenced twice (pair stage + merge
    stage), so un-materialized stages expand 2^N-fold — the oracle
    would try to open documents.parquet a million times by stage 20.
    (The Spark side avoids the same blowup with the per-round driver
    scalar + tracked persists.)
    """
    return f"""
    p{i} AS MATERIALIZED (
      SELECT pair, CAST(sum(cnt) AS BIGINT) AS total FROM (
        SELECT unnest(list_transform(
                 generate_series(1, greatest(len(sl) - 1, 0)),
                 i -> sl[i] || ' ' || sl[i + 1])) AS pair, cnt
        FROM (SELECT string_split(s, ' ') AS sl, cnt FROM w{i - 1})
      ) GROUP BY pair ORDER BY total DESC, pair LIMIT 1
    ),
    w{i} AS MATERIALIZED (
      SELECT CASE WHEN p.pair IS NULL THEN w.s
        ELSE list_reduce(string_split(w.s, ' '), (acc, x) ->
          CASE WHEN (acc = split_part(p.pair, ' ', 1)
                     OR ends_with(acc, ' ' || split_part(p.pair, ' ', 1)))
                    AND x = split_part(p.pair, ' ', 2)
               THEN acc || x ELSE acc || ' ' || x END)
        END AS s, w.cnt
      FROM w{i - 1} w LEFT JOIN p{i} p ON TRUE
    )"""


def _duck_ctes(n_merges: int = N_MERGES) -> str:
    base = """
    w0 AS MATERIALIZED (
      SELECT rtrim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS s, cnt
      FROM (
        SELECT w, count(*) AS cnt FROM (
          SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS w
          FROM documents
        ) WHERE len(w) BETWEEN 1 AND 16
        GROUP BY w
      )
    )"""
    return base + "," + ",".join(_duck_stage(i) for i in range(1, n_merges + 1))


_TRAIN_ORACLE = (
    "WITH "
    + _duck_ctes()
    + "\n    SELECT * FROM (\n"
    + "\n      UNION ALL ".join(
        f"SELECT {i} AS merge_rank, split_part(pair, ' ', 1) AS lhs, "
        f"split_part(pair, ' ', 2) AS rhs, replace(pair, ' ', '') AS merged, "
        f"total FROM p{i}"
        for i in range(1, N_MERGES + 1)
    )
    + "\n    )"
)

_APPLY_ORACLE = (
    "WITH "
    + _duck_ctes()
    + f"""
    SELECT token, CAST(sum(cnt) AS BIGINT) AS total
    FROM (SELECT unnest(string_split(s, ' ')) AS token, cnt FROM w{N_MERGES})
    GROUP BY token ORDER BY total DESC, token LIMIT 40"""
)


# ------------------------------------------------------------------- queries


@register(
    "tokenizer_train_bpe",
    oracle=_TRAIN_ORACLE,
    doc="Distributed BPE tokenizer TRAINING (Sennrich et al. 2016): "
    f"{N_MERGES} most-frequent-pair merges learned over the documents "
    "corpus. Corpus-sized work is one pre-tokenization shuffle into a "
    "vocabulary-bounded distinct-word table; each round is a tiny "
    "two-phase pair count + a narrow greedy-fold rewrite, with the "
    "per-round argmax as a 1-row driver scalar (inherent to the "
    "iterative fixpoint, like connected components). The oracle replays "
    "the identical argmax + greedy fold as an unrolled 20-stage CTE "
    "chain, so the learned merge sequence matches bit-exactly.",
    tags=("datapipe", "text", "tokenizer", "iterative"),
)
def tokenizer_train_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges, _ = _train_merges(spark, sf_dir)
    return spark.createDataFrame(
        merges, "merge_rank int, lhs string, rhs string, merged string, "
        "total bigint"
    )


@register(
    "tokenizer_apply_bpe",
    oracle=_APPLY_ORACLE,
    doc="Apply the learned BPE merges to the corpus: the final symbol "
    "state of the distinct-word table IS the tokenization of every "
    "word, so apply explodes it weighted by word frequency — top-40 "
    "BPE tokens by total occurrences (TakeOrderedAndProject, no global "
    "sort). Merge application is a per-row fold with zero shuffles "
    "beyond the shared pre-tokenization.",
    tags=("datapipe", "text", "tokenizer", "topn"),
)
def tokenizer_apply_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, words = _train_merges(spark, sf_dir)
    toks = words.select(
        F.explode(F.split("s", " ")).alias("token"), "cnt"
    )
    return (
        toks.groupBy("token")
        .agg(F.sum("cnt").cast("bigint").alias("total"))
        .orderBy(F.col("total").desc(), "token")
        .limit(40)
    )
