"""Dictionary-encoding Arrow kernels for the self-trained bigram LM
(the text_perplexity / sample_ccnet_buckets scoring core).

Replaces the JVM explode+shuffle plan (r07-r10 `_bigram_doc_scores`:
one corpus shuffle to per-(doc, bigram) counts, a second corpus-sized
exchange joining the model back on the bigram, a third grouping back
to the doc) with the DSIR kernel pattern (datapipe/dsir.py, VERDICT
r10 item 2): ZERO corpus shuffles.

  pass 1 (fit)    each Arrow batch is dictionary-encoded
                  (pd.factorize); bigram instances become int code
                  pairs (u1 * V + u2) and np.unique(return_counts)
                  collapses them to per-batch DISTINCT (w1, w2, k)
                  rows before anything leaves Python. The emitted
                  partials are distinct-bigram-bounded per batch (not
                  instance-bounded); Spark's map-side partial
                  aggregation merges them further before the ONE
                  vocabulary-sized shuffle builds the model counts.
                  Distinct tokens ride along as (tk, NULL, 0) rows so
                  the vocabulary size needs no separate corpus pass.
  pass 2 (score)  the fitted model (cb per bigram, cu per leading
                  word, v) is broadcast to the workers; the same
                  dictionary encoding maps each batch's distinct
                  pairs to ln((cb+1)/(cu+v)) with ONE dict lookup per
                  DISTINCT pair, and per-(doc, pair) integer counts k
                  multiply the ln term before the per-doc bincount
                  sum — the SQL oracle's own `sum(k * ln(...))`
                  association. One (doc_id, lp, n_bigrams) row per
                  doc leaves the kernel; no shuffle at all.

Worst case (every bigram of every batch distinct) degrades to one
dict-op per instance — the same work the JVM join form does, just in
Python — and the win scales with corpus redundancy (Zipf), which is
exactly the 100 TB regime. This is the output-reducing side of the
Arrow-kernel criterion both r10 kernels validated: the fit emits
distinct-bounded partials and the scorer one row per doc, unlike the
row-for-row substring stream where the JVM form won.

Model-size contract (the bounded-collect rule): the fitted model is
VOCABULARY-sized — distinct bigrams + distinct tokens, not corpus-
sized — and the fit collects it to the driver for broadcast. That is
the published architecture of perplexity filtering at scale: CCNet
ships a trained, pruned KenLM artifact to every worker; the in-plan
self-trained fit stands in for that artifact. MAX_MODEL_ENTRIES caps
the collect so an un-Zipf-like corpus fails loudly with a pruning
hint instead of silently flattening the driver.

Float shape: lnterm = np.log((cb + 1) / (cu + v)) — the divide is a
single correctly-rounded IEEE op in every engine; np.log and the
engines' libm ln may differ in the last ulp, and the per-doc
bincount-weights sum order differs from both engines' hash orders,
so cross-engine parity rests (as before the kernel, and as in
DSIR/sample_ccnet_buckets) on the consumers' round(,6) emission grid
and epsilon-guarded gates.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# Ceiling on collected model rows (distinct bigrams + distinct
# tokens). Generously above any self-trained run this repo performs
# (test vocab ~31 tokens -> <1k rows) and at the scale where a real
# deployment switches to a pre-trained pruned artifact anyway.
MAX_MODEL_ENTRIES = 1 << 23


def _flatten_factorize(token_lists):
    """Flatten a batch of token lists and dictionary-encode it.

    Returns (doc_idx, codes, uniq): per-instance batch-row index,
    per-instance int code, and the distinct-token object array the
    codes index. Empty batch -> three empty arrays."""
    import numpy as np

    n_docs = len(token_lists)
    lens = np.fromiter(
        (len(t) for t in token_lists), dtype=np.int64, count=n_docs
    )
    total = int(lens.sum())
    if total == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e, np.empty(0, dtype=object)
    flat = np.empty(total, dtype=object)
    pos = 0
    for toks in token_lists:
        flat[pos : pos + len(toks)] = toks
        pos += len(toks)
    codes, uniq = pd.factorize(flat)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    return doc_idx, codes, np.asarray(uniq, dtype=object)


def _batch_pairs(doc_idx, codes, v: int):
    """Adjacent same-doc code pairs of a flattened batch: returns
    (pair_doc_idx, pair_codes) with pair_code = left * v + right."""
    import numpy as np

    if codes.size < 2:
        e = np.empty(0, dtype=np.int64)
        return e, e
    same_doc = doc_idx[:-1] == doc_idx[1:]
    left = codes[:-1][same_doc]
    right = codes[1:][same_doc]
    return doc_idx[:-1][same_doc], left * v + right


def bigram_model_partials(docs: DataFrame) -> DataFrame:
    """Per-batch distinct (w1, w2, k) bigram-count partials plus
    (tk, NULL, 0) distinct-token rows over a (__tokens, ...) frame.

    Fully vectorized — the pair collapse is np.unique over int codes
    and the string materialization is object fancy-indexing over the
    batch vocabulary; no per-instance Python. Spark's map-side
    partial aggregation merges batch partials within each partition
    before the vocabulary-sized groupBy shuffle."""
    import numpy as np

    def fit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            toks = batch["__tokens"].tolist()
            doc_idx, codes, uniq = _flatten_factorize(toks)
            v = len(uniq)
            if v == 0:
                continue
            yield pd.DataFrame(
                {
                    "w1": uniq,
                    "w2": np.full(v, None, dtype=object),
                    "k": np.zeros(v, dtype=np.int64),
                }
            )
            _, pair_codes = _batch_pairs(doc_idx, codes, v)
            if pair_codes.size:
                pu, counts = np.unique(pair_codes, return_counts=True)
                yield pd.DataFrame(
                    {
                        "w1": uniq[pu // v],
                        "w2": uniq[pu % v],
                        "k": counts,
                    }
                )

    return docs.mapInPandas(fit, schema="w1 string, w2 string, k long")


def bigram_lm_scores(docs: DataFrame, model_bcast) -> DataFrame:
    """(doc_id, lp, n_bigrams) per document with >= 1 bigram, scored
    against a broadcast (cb: dict[(w1,w2)->int], cu: dict[w1->int],
    v: int) add-one bigram model. lp is the UNROUNDED mean log
    P(w2|w1); consumers apply their emission contracts.

    Model lookups use [] (not .get): the model is fitted on the same
    corpus, so a missing pair is a bug and must fail loudly."""
    import numpy as np

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cb, cu, v_tot = model_bcast.value
        for batch in batches:
            toks = batch["__tokens"].tolist()
            doc_idx, codes, uniq = _flatten_factorize(toks)
            v = len(uniq)
            if v == 0:
                continue
            pair_doc, pair_codes = _batch_pairs(doc_idx, codes, v)
            if pair_codes.size == 0:
                continue
            pu, pair_inv = np.unique(pair_codes, return_inverse=True)
            # one model lookup per DISTINCT pair / leading word
            cu_by_code = np.empty(v, dtype=np.float64)
            for i, tk in enumerate(uniq.tolist()):
                cu_by_code[i] = cu.get(tk, 0)
            w1s = uniq[pu // v]
            cb_u = np.empty(len(pu), dtype=np.float64)
            w2s = uniq[pu % v]
            for i in range(len(pu)):
                cb_u[i] = cb[(w1s[i], w2s[i])]
            lnterm = np.log((cb_u + 1.0) / (cu_by_code[pu // v] + v_tot))
            # per-(doc, pair) integer k, multiplied BEFORE the per-doc
            # sum — the oracle's sum(k * ln(...)) association
            dp = pair_doc * len(pu) + pair_inv
            dpu, k = np.unique(dp, return_counts=True)
            contrib = k * lnterm[dpu % len(pu)]
            n_docs = len(toks)
            lp_sum = np.bincount(
                dpu // len(pu), weights=contrib, minlength=n_docs
            )
            n_bi = np.bincount(pair_doc, minlength=n_docs)
            has = n_bi > 0
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].to_numpy()[has],
                    "lp": lp_sum[has] / n_bi[has],
                    "n_bigrams": n_bi[has],
                }
            )

    return docs.mapInPandas(
        score, schema="doc_id long, lp double, n_bigrams long"
    )


def fit_bigram_model(docs: DataFrame):
    """Run the fit pass and return (cb, cu, v) as plain Python
    objects, guarded by MAX_MODEL_ENTRIES. cu is summed driver-side
    from the collected cb rows (exact integer arithmetic, order-
    free), so the model needs exactly ONE vocabulary-sized shuffle.

    Guard ORDER matters (VERDICT r11 item 2): the cap is probed with a
    LocalLimit count on the persisted aggregate BEFORE collect(), so a
    pathologically un-Zipf corpus raises while the driver holds zero
    model rows — a guard after the collect would only fire after the
    over-cap model had already flattened driver memory. The persist
    makes the probe ~free: the first action materializes the aggregate
    executor-side, the collect re-reads the cache (no second shuffle).
    """
    from gmall2021_flink_dw_spark.cache import tracked_persist

    agg = tracked_persist(
        bigram_model_partials(docs).groupBy("w1", "w2").sum("k")
    )
    probe = agg.limit(MAX_MODEL_ENTRIES + 1).count()
    if probe > MAX_MODEL_ENTRIES:
        raise ValueError(
            f"bigram model exceeds {MAX_MODEL_ENTRIES} entries; "
            "prune the LM (KenLM-style) or raise MAX_MODEL_ENTRIES "
            "before broadcasting"
        )
    rows = agg.collect()
    cb: dict[tuple[str, str], int] = {}
    cu: dict[str, int] = {}
    v = 0
    for r in rows:
        if r[1] is None:
            v += 1
        else:
            cb[(r[0], r[1])] = r[2]
            cu[r[0]] = cu.get(r[0], 0) + r[2]
    return cb, cu, v
