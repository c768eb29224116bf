"""DSIR hashed-n-gram kernels (Xie et al., NeurIPS 2023).

The operator's per-feature work is one md5 bucket per unigram/bigram
INSTANCE — and the instance stream is ~80x the document count, so
computing the hash instance-wise (JVM `md5(tk)` inside an explode or a
fold) is the measured bottleneck: ~40 s per corpus pass at the third
decade (126M chars / 72M feature instances), paid twice (model fit +
scoring). Both kernels here exploit the one distributional fact every
real corpus shares — Zipf vocabulary, distinct features << feature
instances — by DICTIONARY-ENCODING each Arrow batch (pd.factorize) and
hashing each distinct feature ONCE:

  unigrams   factorize the flattened token stream -> md5 per distinct
             token (vocabulary-sized, not stream-sized).
  bigrams    never materialize instance strings: a bigram instance is
             a PAIR OF INT CODES (u1 * V + u2); np.unique the pair
             codes and build + hash only the distinct pair strings.

Worst case (every feature unique) degrades to one md5 per instance —
the same work the JVM form does, just in hashlib — and the win scales
with corpus redundancy, which is exactly when 100 TB runs happen.

Bucket function is the cross-engine contract (registry.py float
rules): int(md5(utf8)[:8 hex], 16) % B == Spark conv(substring(
md5(tk),1,8),16,10) % B == DuckDB ('0x'||substr(md5(tk),1,8))::BIGINT
% B.

Scoring keeps the ORACLE's float shape as closely as numpy allows:
per-(doc, bucket) integer counts k_b (bincount), then
logw = sum_b k_b * w_b as one counts-matrix GEMV over the
512-double weight vector — multiplication by integer k before
summation, as in the SQL oracle's `sum(k * (ln - ln))`. The GEMV
dispatches to BLAS, whose accumulation order (blocked/SIMD,
possibly FMA) is NOT guaranteed left-to-right, so the association
can differ from both engines' ordered sums at the sub-ulp level;
cross-engine parity therefore rests on the round(,6) emission grid
(residual risk: a sub-ulp flip landing exactly on the 1e-6 grid —
the same documented contract as sample_ccnet_buckets).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

B_BUCKETS = 512


def _bucket_of_strings(strings, B: int):
    """md5-bucket each string in an object ndarray (one hash per
    DISTINCT input; callers pass already-uniqued values)."""
    import numpy as np

    out = np.empty(len(strings), dtype=np.int64)
    for i, s in enumerate(strings):
        out[i] = (
            int.from_bytes(
                hashlib.md5(s.encode("utf-8")).digest()[:4], "big"
            )
            % B
        )
    return out


def _batch_feature_buckets(token_lists, B: int):
    """(doc_index int64, bucket int64) arrays for every unigram AND
    bigram instance of a batch of token lists, hashing each distinct
    feature once. doc_index refers to the batch row."""
    import numpy as np

    n_docs = len(token_lists)
    lens = np.fromiter(
        (len(t) for t in token_lists), dtype=np.int64, count=n_docs
    )
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    flat = np.empty(total, dtype=object)
    pos = 0
    for toks in token_lists:
        flat[pos : pos + len(toks)] = toks
        pos += len(toks)
    codes, uniq = pd.factorize(flat)
    uniq = np.asarray(uniq, dtype=object)
    v = len(uniq)
    uni_bucket = _bucket_of_strings(uniq, B)

    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    # bigram instances: adjacent code pairs within one doc
    same_doc = doc_idx[:-1] == doc_idx[1:] if total > 1 else np.empty(
        0, dtype=bool
    )
    left = codes[:-1][same_doc]
    right = codes[1:][same_doc]
    pair_codes = left * v + right
    pair_uniq, pair_inv = np.unique(pair_codes, return_inverse=True)
    pair_strings = np.empty(len(pair_uniq), dtype=object)
    for i, pc in enumerate(pair_uniq.tolist()):
        pair_strings[i] = uniq[pc // v] + " " + uniq[pc % v]
    bi_bucket_u = _bucket_of_strings(pair_strings, B)

    inst_doc = np.concatenate([doc_idx, doc_idx[:-1][same_doc]])
    inst_bucket = np.concatenate(
        [uni_bucket[codes], bi_bucket_u[pair_inv]]
    )
    return inst_doc, inst_bucket


def dsir_model_partials(docs: DataFrame, B: int = B_BUCKETS) -> DataFrame:
    """Per-partition (b, cr, ct) bucket histograms over the uni+bigram
    feature stream of a (doc_id, lang, __tokens) frame — cr counts all
    instances, ct only lang='en' ones. State is two 512-long arrays per
    partition; emitted rows <= B per partition, so the downstream
    groupBy('b') shuffles B rows per task regardless of corpus size."""
    import numpy as np

    def fit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cr = np.zeros(B, dtype=np.int64)
        ct = np.zeros(B, dtype=np.int64)
        for batch in batches:
            toks = batch["__tokens"].tolist()
            doc_idx, bucket = _batch_feature_buckets(toks, B)
            if bucket.size == 0:
                continue
            cr += np.bincount(bucket, minlength=B)
            is_en = (batch["lang"] == "en").to_numpy()
            en_mask = is_en[doc_idx]
            if en_mask.any():
                ct += np.bincount(bucket[en_mask], minlength=B)
        nz = (cr > 0) | (ct > 0)
        if nz.any():
            b = np.nonzero(nz)[0]
            yield pd.DataFrame(
                {"b": b, "cr": cr[b], "ct": ct[b]}
            )

    return docs.mapInPandas(fit, schema="b int, cr long, ct long")


def dsir_scores(
    docs: DataFrame, weights, B: int = B_BUCKETS
) -> DataFrame:
    """(doc_id, logw, n_feats) per document with >= 1 token: per-doc
    per-bucket integer counts via bincount, then logw = counts @ w —
    the oracle's own sum_b k_b * w_b association. Zero shuffles; one
    row per doc leaves the kernel."""
    import numpy as np

    w = np.asarray(weights, dtype=np.float64)
    assert w.shape == (B,)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            toks = batch["__tokens"].tolist()
            doc_idx, bucket = _batch_feature_buckets(toks, B)
            if bucket.size == 0:
                continue
            n_docs = len(toks)
            counts = np.bincount(
                doc_idx * B + bucket, minlength=n_docs * B
            ).reshape(n_docs, B)
            n_feats = counts.sum(axis=1)
            has = n_feats > 0
            logw = counts[has].astype(np.float64) @ w
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].to_numpy()[has],
                    "logw": logw,
                    "n_feats": n_feats[has],
                }
            )

    return docs.mapInPandas(
        score, schema="doc_id long, logw double, n_feats long"
    )
