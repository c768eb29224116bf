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
          from every counter and non-positive ones dropped.  Peak state
          during a merge is therefore O(m + distinct keys in the batch)
          — batch-bounded, collapsing back to <= m counters between
          batches (shrinking mid-merge would buy a strict m bound at
          the cost of re-sorting per insertion).  Subtracting
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


# ---------------------------------------------------------------------
# Vectorized character-trigram kernel. Exploding trigrams JVM-side is
# LINEAR but alloc-bound: codegen materializes a 3-char UTF8String per
# trigram (measured: the explode alone costs 173 s at 150M trigrams /
# 500k docs, dwarfing the sketch). Shipping the RAW doc strings through
# Arrow (~150 MB, three orders of magnitude fewer rows) and windowing
# in numpy is ~10x cheaper end to end: each batch's text is decoded to
# UTF-32 (one uint32 per CHARACTER — identical semantics to DuckDB
# substr and Spark substring, which index characters, not bytes), and a
# trigram becomes three 21-bit codepoints packed into one int64
# (max 0x10FFFF < 2^21, so ids stay under 2^63). np.unique gives the
# per-batch counts. The same precedent as the simhash Arrow tile
# hasher: a vectorized kernel replacing a per-row-allocating codegen
# form, bit-identical by construction.


def _trigram_ids(texts) -> "np.ndarray":
    """int64 trigram ids for every character trigram in a batch of
    strings (windows never cross document boundaries). NULL/None
    entries yield no trigrams — matching the SQL oracles, where a NULL
    text row contributes zero rows to the trigram stream (ADVICE r11:
    None.encode used to raise, diverging from the DuckDB side)."""
    import numpy as np

    bufs = [t.encode("utf-32-le") for t in texts if t is not None]
    if not bufs:
        return np.empty(0, dtype=np.int64)
    cp = np.frombuffer(b"".join(bufs), dtype=np.uint32)
    if cp.size < 3:
        return np.empty(0, dtype=np.int64)
    ids = (
        cp[:-2].astype(np.int64)
        | (cp[1:-1].astype(np.int64) << 21)
        | (cp[2:].astype(np.int64) << 42)
    )
    # mask windows that straddle a document boundary: the last two
    # window positions of each doc (and every position of a doc
    # shorter than 3) are invalid
    ends = np.cumsum(np.fromiter((len(b) // 4 for b in bufs), dtype=np.int64))
    valid = np.ones(ids.size, dtype=bool)
    for off in (1, 2):
        idx = ends - off
        idx = idx[(idx >= 0) & (idx < ids.size)]
        valid[idx] = False
    return ids[valid]


def decode_trigram_id(tid: int) -> str:
    """Inverse of the 21-bit packing in _trigram_ids."""
    return (
        chr(tid & 0x1FFFFF)
        + chr((tid >> 21) & 0x1FFFFF)
        + chr(tid >> 42)
    )


def trigram_mg_summaries(docs: DataFrame, m: int) -> DataFrame:
    """Per-partition MG summaries over character trigrams of a 1-column
    string DataFrame, without ever materializing the trigram stream as
    rows. Emits (key bigint, c long) — key is the packed trigram id."""
    import numpy as np

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        for batch in batches:
            ids, n = np.unique(
                _trigram_ids(batch.iloc[:, 0].tolist()), return_counts=True
            )
            for key, k in zip(ids.tolist(), n.tolist()):
                counts[key] = counts.get(key, 0) + k
            _mg_shrink(counts, m)
        if counts:
            yield pd.DataFrame(
                {"key": list(counts.keys()), "c": list(counts.values())}
            )

    return docs.mapInPandas(summarize, schema="key bigint, c long")


def trigram_count_partials(docs: DataFrame) -> DataFrame:
    """Per-BATCH distinct (key, c) trigram-count partials over a
    1-column string DataFrame — the full-spectrum counterpart of
    `trigram_exact_counts` (no candidate filter). Emitting per batch
    (not per partition) keeps kernel state batch-bounded on an OPEN
    key space; Spark's map-side partial aggregation merges batch
    partials before the vocabulary-sized groupBy shuffle — the same
    output-reducing contract as bigram_model_partials (the rows that
    leave Python are bounded by distinct-per-batch, not by the
    trigram instance stream)."""
    import numpy as np

    def count(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            u, n = np.unique(
                _trigram_ids(batch.iloc[:, 0].tolist()), return_counts=True
            )
            if u.size:
                yield pd.DataFrame({"key": u, "c": n})

    return docs.mapInPandas(count, schema="key bigint, c long")


def trigram_exact_counts(docs: DataFrame, candidate_ids) -> DataFrame:
    """Exact per-partition partial counts restricted to the candidate
    trigram ids (same kernel, np.isin filter); sum the partials with a
    candidate-sized groupBy to get exact global counts."""
    import numpy as np

    cand = np.asarray(sorted(candidate_ids), dtype=np.int64)

    def count(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        for batch in batches:
            ids = _trigram_ids(batch.iloc[:, 0].tolist())
            ids = ids[np.isin(ids, cand)]
            u, n = np.unique(ids, return_counts=True)
            for key, k in zip(u.tolist(), n.tolist()):
                counts[key] = counts.get(key, 0) + k
        if counts:
            yield pd.DataFrame(
                {"key": list(counts.keys()), "c": list(counts.values())}
            )

    return docs.mapInPandas(count, schema="key bigint, c long")


# ---------------------------------------------------------------------
# Vectorized rolling-hash window kernel (r10). The substring-dedup
# scale path needs a 64-bit key for EVERY L-char window of every doc
# (126M windows at the third decade). Generating those keys JVM-side
# (explode + substr + xxhash64) is linear but alloc-bound — codegen
# materializes a 50-char UTF8String per window just to hash it
# (measured 9.6 s of the plan's 16 s at g10). Same cure as the trigram
# kernel above: ship the RAW doc strings through Arrow once (three
# orders of magnitude fewer rows) and compute all window hashes in
# numpy with O(total_chars) work via a rolling polynomial hash —
# prefix sums in the Binv^j basis make every window hash one
# subtract-and-multiply, no per-window string ever exists.
#
# Hash contract: h(w) = mix(sum_j w_j * B^(L-1-j) mod 2^64) with B odd
# (invertible mod 2^64, so the prefix-basis trick is exact) and a
# splitmix64 finalizer for bit diffusion. Equal windows ALWAYS hash
# equal (determinism is the correctness requirement); unequal windows
# collide with ~n^2/2^65 odds — the same contract the xxhash64 form
# carried, checked the same way (the driver oracle recomputes exact
# strings, so a collision at checked scale surfaces as a mismatch).
# numpy uint64 arithmetic wraps mod 2^64 by construction.

_ROLL_B = 0x9E3779B97F4A7C15  # odd (golden-ratio constant)
_ROLL_BINV = pow(_ROLL_B, -1, 1 << 64)


def _rolling_window_hashes(doc_ids, texts, L: int):
    """(doc_id int64, pos int32, k int64) arrays for every L-char
    window of every text, windows never crossing doc boundaries.
    Character indexing is UTF-32 (identical to Spark substring /
    DuckDB substr semantics)."""
    import numpy as np

    bufs = [t.encode("utf-32-le") for t in texts]
    lens = np.fromiter(
        (len(b) // 4 for b in bufs), dtype=np.int64, count=len(bufs)
    )
    counts = np.maximum(lens - L + 1, 0)
    total = int(counts.sum())
    if total == 0:
        return (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int32),
            np.empty(0, dtype=np.int64),
        )
    cp = np.frombuffer(b"".join(bufs), dtype=np.uint32).astype(np.uint64)
    n = cp.size
    B = np.uint64(_ROLL_B)
    with np.errstate(over="ignore"):
        bpow = np.ones(n, dtype=np.uint64)
        if n > 1:
            np.cumprod(np.full(n - 1, B, dtype=np.uint64), out=bpow[1:])
        binvpow = np.ones(n, dtype=np.uint64)
        if n > 1:
            np.cumprod(
                np.full(n - 1, np.uint64(_ROLL_BINV), dtype=np.uint64),
                out=binvpow[1:],
            )
        s0 = np.zeros(n + 1, dtype=np.uint64)
        np.cumsum(cp * binvpow, out=s0[1:])

        offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
        doc_rep = np.repeat(np.asarray(doc_ids, dtype=np.int64), counts)
        local = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        g = np.repeat(offsets, counts) + local
        h = (s0[g + L] - s0[g]) * bpow[g + L - 1]
        # splitmix64 finalizer
        h ^= h >> np.uint64(30)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(27)
        h *= np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(31)
    return doc_rep, local.astype(np.int32), h.view(np.int64)


def window_hash_stream(docs: DataFrame, L: int) -> DataFrame:
    """(doc_id long, pos int, k long) for every L-char window of a
    (doc_id, text) DataFrame, via the Arrow rolling-hash kernel."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            d, p, k = _rolling_window_hashes(
                batch["doc_id"].to_numpy(), batch["text"].tolist(), L
            )
            yield pd.DataFrame({"doc_id": d, "pos": p, "k": k})

    return docs.mapInPandas(gen, schema="doc_id long, pos int, k long")
