"""Misra-Gries heavy-hitters sketch as a two-pass exact top-k plan.

The reference's aggregation layer keeps exact per-key state for every
key it counts (e.g. the HashSet accumulators of ProductStats.java:74-84
and the keyed windowed reduces of ProductStatsApp.java) — which is fine
when the key space is dimensions, and fatal when it is an open token /
n-gram space at corpus scale: a plain ``groupBy(key).count()`` over
100 TB of character n-grams builds a hash table per map task whose size
is the local key cardinality, and the shuffle carries one record per
distinct key per task.

The classic fix (Misra & Gries 1982; merged-summary form per Agarwal et
al., "Mergeable Summaries", PODS 2012) bounds BOTH to ``m`` counters:

  pass 1  per-partition MG summary (capacity m) over the token stream,
          Arrow-batched: each batch is counted vectorized
          (``value_counts``), merged into the running dict, and when the
          dict exceeds m the (len-m)-th smallest count q is subtracted
          from every counter and non-positive ones dropped.  Subtracting
          q from >= m+1 counters removes >= q*(m+1) stream mass, so the
          TOTAL undercount of any key is <= N/(m+1) over the whole
          stream — the textbook MG bound survives batching.
  merge   union + sum of the per-partition summaries (<= parts*m rows).
          Summed lower bounds stay lower bounds; any key with true count
          > N/(m+1) has a positive merged count, so the merged summary
          is a guaranteed SUPERSET of every such key.
  pass 2  exact recount restricted to the candidate set (broadcast
          semi-join), so emitted counts are exact integers — the sketch
          decides WHICH keys to count, never the values.

Result: exact top-k whenever the k-th true count exceeds N/(m+1), with
state and shuffle bounded by m instead of the key cardinality.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

def _mg_shrink(counts: dict, m: int) -> None:
    """Decrement-and-drop so at most m counters remain (in place)."""
    excess = len(counts) - m
    if excess <= 0:
        return
    # q = the excess-th smallest counter value: subtracting q from all
    # counters zeroes out at least `excess` of them.
    q = sorted(counts.values())[excess - 1]
    for k in list(counts):
        nv = counts[k] - q
        if nv > 0:
            counts[k] = nv
        else:
            del counts[k]


def mg_partition_summaries(
    keys: DataFrame, m: int, key_type: str = "string"
) -> DataFrame:
    """Per-partition Misra-Gries summaries of a 1-column key DataFrame.

    Arrow-batched: the generator persists the MG dict across the
    partition's batches, counts each batch vectorized, and emits the
    final <=m (key, lower-bound) rows once the partition is exhausted.

    ``key_type`` sets the key column's Spark type. The hot form is
    ``bigint`` over JVM-side xxhash64 of the real key: Arrow then ships
    fixed-width ints instead of strings (measured ~2x on the trigram
    stream), and a 64-bit collision can only MERGE two counters — a
    merged count dominates each constituent's true count, so the
    guaranteed-superset property of the candidate set is unaffected
    (the exact recount happens on the real key anyway).
    """

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        for batch in batches:
            for key, n in batch.iloc[:, 0].value_counts().items():
                counts[key] = counts.get(key, 0) + int(n)
            _mg_shrink(counts, m)
        if counts:
            yield pd.DataFrame(
                {"key": list(counts.keys()), "c": list(counts.values())}
            )

    return keys.mapInPandas(summarize, schema=f"key {key_type}, c long")
