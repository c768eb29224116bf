"""Training-data pipeline queries: dedup / similarity / text / multimodal.

Every query here carries a DuckDB oracle. The exact ones (exact dedup,
n-gram Jaccard, text stats, lang-ID, brute-force ANN, multimodal
metadata) are oracle-checked directly; the approximate ones (MinHash
LSH, SimHash, bucketed/IVF ANN, embedding LSH) use the driver-checkable
form (_recall_checked): rows are the exact counterpart's result and the
sketch contributes pinned recall/precision flags, so the driver's
hash-match distinguishes a broken sketch from a working one. Tighter
per-method recall bounds stay in tests/test_datapipe.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall2021_flink_dw_spark.cache import tracked_persist

from gmall2021_flink_dw_spark.datapipe.ann import (
    as_double,
    brute_force_topk,
    bucketed_topk,
)
from gmall2021_flink_dw_spark.datapipe.dedup import (
    DF_CAP_CEIL,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from gmall2021_flink_dw_spark.datapipe.multimodal import (
    attach_payload,
    decode_features,
)
from gmall2021_flink_dw_spark.datapipe.text import (
    DUCK_BIGRAMS_SQL,
    DUCK_WINNOW_CTES,
    STOPWORDS,
    TOKENS_SQL,
    bigram_pairs,
    duck_marker_hits,
    duck_predict_lang,
    duck_shingles,
    let,
    marker_hits,
    max_token_repetition,
    predict_lang,
    with_tokens,
)
from gmall2021_flink_dw_spark.registry import register
from gmall2021_flink_dw_spark.session import ensure_workers_can_import
from gmall2021_flink_dw_spark.sources.batch import load_table, spread_scan


@register(
    "text_stats",
    oracle=f"""
    SELECT doc_id, lang, source,
           len(w) AS n_tokens,
           len(list_distinct(w)) AS n_uniq_tokens,
           {duck_marker_hits("w", STOPWORDS)} AS stopword_hits,
           round({duck_marker_hits("w", STOPWORDS)}::double / len(w), 6) AS stopword_ratio,
           md5(text) AS fingerprint
    FROM (SELECT *, {TOKENS_SQL} AS w FROM documents)
    WHERE len(w) > 0
    """,
    doc="Text quality metrics per document: token counts, stopword ratio, "
    "content fingerprint — all codegen'd array functions, no Python.",
    tags=("datapipe", "text"),
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    t = F.col("__tokens")
    hits = marker_hits(t, STOPWORDS)
    return docs.filter(F.size(t) > 0).select(
        "doc_id",
        "lang",
        "source",
        F.size(t).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(t)).cast("bigint").alias("n_uniq_tokens"),
        hits.alias("stopword_hits"),
        F.round(hits.cast("double") / F.size(t), 6).alias("stopword_ratio"),
        F.md5("text").alias("fingerprint"),
    )


@register(
    "lang_id",
    oracle=f"""
    SELECT lang AS labeled_lang, {duck_predict_lang("w")} AS predicted_lang,
           count(*) AS n
    FROM (SELECT lang, {TOKENS_SQL} AS w FROM documents)
    GROUP BY 1, 2
    """,
    doc="Language-ID heuristic (marker-word argmax, deterministic "
    "tie-break) — confusion matrix against the labeled lang column.",
    tags=("datapipe", "text"),
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    return (
        docs.select(
            F.col("lang").alias("labeled_lang"),
            predict_lang(F.col("__tokens")).alias("predicted_lang"),
        )
        .groupBy("labeled_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "dedup_exact",
    oracle="""
    SELECT doc_id, fingerprint, group_size
    FROM (
      SELECT doc_id, md5(text) AS fingerprint,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn,
             count(*) OVER (PARTITION BY md5(text)) AS group_size
      FROM documents
    ) WHERE rn = 1
    """,
    doc="Exact dedup: hash-groupBy on content fingerprint, min-doc_id "
    "survivor per group. One shuffle, linear in corpus size.",
    tags=("datapipe", "dedup"),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    survivors = exact_dedup(load_table(spark, sf_dir, "documents"))
    return survivors.select("doc_id", "fingerprint", "group_size")


# shared CTE block: tokenized 5-gram shingles, df-capped inverted index
_SHINGLE_CTES = f"""g AS (
      SELECT doc_id, {duck_shingles(5)} AS grams
      FROM (SELECT doc_id, {TOKENS_SQL} AS w FROM documents)
      WHERE len(w) >= 5
    ), e0 AS (
      SELECT doc_id, len(grams) AS n_grams, unnest(grams) AS shingle FROM g
    ), hot AS (
      SELECT shingle FROM e0 GROUP BY shingle
      HAVING count(*) > greatest(5, least(
             ceil(0.01 * (SELECT count(DISTINCT doc_id) FROM e0)),
             {DF_CAP_CEIL}))
    ), e AS (
      SELECT e0.* FROM e0 ANTI JOIN hot USING (shingle)
    )"""

def _recall_checked(
    exact: DataFrame,
    approx: DataFrame,
    keys: tuple[str, ...],
    out_cols: list,
    flag_name: str,
    bound: float,
) -> DataFrame:
    """Exact-derived rows + a driver-checkable recall flag.

    Output rows are EXACTLY the exact ground-truth rows (SQL-oracle
    reproducible); the approximate result contributes one aggregated
    boolean column: recall = |approx ∩ exact| / |exact| >= bound, the
    same constant on every row, which the oracle pins TRUE. This is the
    dws_product_stats_approx pattern (plans/stats.py) applied to the
    sketch family: the unverifiable approximation becomes a green
    hash-match row instead of a rows-only check. The tighter per-method
    recall numbers stay asserted in tests/test_datapipe.py."""
    hit = (
        approx.select(*keys)
        .dropDuplicates(list(keys))
        .withColumn("_hit", F.lit(1))
    )
    joined = exact.join(hit, list(keys), "left")
    stats = joined.agg(
        (F.count("_hit").cast("double") / F.count(F.lit(1))).alias("_recall")
    )
    return joined.crossJoin(F.broadcast(stats)).select(
        *out_cols, (F.col("_recall") >= bound).alias(flag_name)
    )


def _jaccard_pairs_sql(threshold: float) -> str:
    """Capped-inverted-index exact Jaccard pairs at the given threshold
    (DuckDB side of datapipe/dedup.py::ngram_jaccard_pairs)."""
    return f"""
    WITH {_SHINGLE_CTES}
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           count(*) AS inter,
           any_value(a.n_grams) AS na, any_value(b.n_grams) AS nb,
           round(count(*)::double /
                 (any_value(a.n_grams) + any_value(b.n_grams) - count(*)), 6)
             AS jaccard
    FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING count(*)::double /
           (any_value(a.n_grams) + any_value(b.n_grams) - count(*)) >= {threshold}
"""


_JACCARD_ORACLE = _jaccard_pairs_sql(0.5)


@register(
    "dedup_ngram_jaccard",
    oracle=_JACCARD_ORACLE,
    doc="Near-dup pairs: word-5-gram shingles, inverted-index self-join "
    "(cost ~ sum df^2 per shingle, not n^2 all-pairs), exact Jaccard "
    ">= 0.5. Ships with the df cap ON (shingles in > max(5, 1% of "
    "corpus) docs are dropped pre-join) — the fan-out bound that keeps "
    "the plan finite at 100x data; the oracle replicates the cap "
    "exactly, and recall vs the uncapped pairs is asserted in "
    "tests/test_datapipe.py. The ground truth the LSH variants are "
    "measured against.",
    tags=("datapipe", "dedup", "join"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"),
        n=5,
        threshold=0.5,
        max_df_frac=0.01,
        df_floor=5,
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        "inter",
        F.col("na").cast("bigint").alias("na"),
        F.col("nb").cast("bigint").alias("nb"),
        F.round("jaccard", 6).alias("jaccard"),
    )


@register(
    "dedup_minhash_lsh",
    oracle=f"""
    SELECT doc_a, doc_b, jaccard, TRUE AS recall_ok
    FROM ({_jaccard_pairs_sql(0.5)})
    """,
    doc="MinHash (k=32) + banded LSH (8x4) near-dup candidates verified "
    "with exact Jaccard on candidates only — the 100 TB dedup path. "
    "Driver-checkable form: rows are the exact capped-Jaccard pairs "
    "(oracle-reproducible) plus recall_ok = LSH found >= 95% of them "
    "(measured 100% at sf0.01/sf0.1 — the sketch is deterministic, "
    "seeds fixed). The exact side is the verification harness; the LSH "
    "path alone is what runs at 100 TB.",
    tags=("datapipe", "dedup", "lsh"),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall2021_flink_dw_spark.datapipe.dedup import shingle_grams

    # tokenize once for both the exact side and the LSH side
    # (with_tokens is idempotent; both helpers reuse this column).
    # NOT persisted (r12, ADVICE r11): after the r11 shingle_grams
    # refactor both sides read grams/exploded, so the tokenized table
    # has exactly ONE consumer — shingle_grams' own tracked_persist is
    # the shared cached intermediate; caching this too pinned a
    # corpus-sized table that was never re-read.
    docs = with_tokens(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "__tokens"
    )
    # shingle arrays built ONCE (r11): the LSH side consumes the arrays
    # and the exact side consumes their explode — previously each side
    # re-ran the array build over the tokenized corpus.
    grams = shingle_grams(docs, n=5)
    exploded = grams.select(
        "doc_id", "n_grams", F.explode("grams").alias("shingle")
    )
    exact = ngram_jaccard_pairs(
        docs,
        n=5,
        threshold=0.5,
        max_df_frac=0.01,
        df_floor=5,
        exploded=exploded,
        # corpus count from the cached per-doc grams table (one row per
        # >=n-token doc) instead of a distinct over the exploded index
        per_doc=grams,
    ).select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    lsh = minhash_lsh_pairs(docs, n=5, threshold=0.5, grams=grams)
    return _recall_checked(
        exact,
        lsh,
        ("doc_a", "doc_b"),
        ["doc_a", "doc_b", "jaccard"],
        "recall_ok",
        0.95,
    )


@register(
    "dedup_simhash",
    oracle=f"""
    SELECT doc_a, doc_b, jaccard, TRUE AS recall_ok
    FROM ({_jaccard_pairs_sql(0.95)})
    """,
    doc="SimHash 64-bit near-dup pairs (hamming <= 5) with a "
    "3-of-8-block combination index for candidate generation "
    "(pigeonhole exact-recall guarantee; r05 — the single-block index's "
    "candidate set grew n^2/256 per position, the one super-linear "
    "term in the dedup family at 10x scale). The radius is CALIBRATED, "
    "not assumed: the hamming distribution of the true >=0.95-Jaccard "
    "pairs reaches 5 on this short-doc corpus (10-100 tokens — one "
    "appended token flips several sign-sums), so Manku et al. WWW'07's "
    "web-scale k=3 would recall only 62% here; k=5 recalls 100% at "
    "sf0.01 / 97.7% at sf0.1 (measured, BASELINE.md r05). "
    "Signatures computed in an Arrow mapInPandas tile (bit-identical "
    "to the codegen aggregate form, 3.4x faster — see "
    "datapipe/dedup.py::simhash). Driver-checkable form: rows are the "
    "exact near-identical pairs (capped Jaccard >= 0.95, "
    "oracle-reproducible) plus recall_ok = simhash found >= 90% of "
    "them (measured 100% at sf0.01 — simhash targets near-identical "
    "docs, so high-Jaccard pairs are its ground truth; it additionally "
    "surfaces looser pairs by design, which a recall flag correctly "
    "does not penalize). Property-tested in tests/test_datapipe.py.",
    tags=("datapipe", "dedup", "lsh"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_workers_can_import(spark)
    # shared tokenized corpus: the exact-high-Jaccard side shingles it,
    # the simhash side hashes its tokens — one regexp pass, persisted
    docs = tracked_persist(
        # project before persisting: caching the full row would pin
        # the raw text alongside the tokens (2x cache bytes) and
        # widen every downstream exchange. Spread first (r15): the
        # single-row-group scan would otherwise tokenize on 1 task AND
        # leave a 1-partition cache that serializes every consumer.
        with_tokens(load_table(spark, sf_dir, "documents")).select(
            "doc_id", "__tokens"
        )
    )
    exact_hi = ngram_jaccard_pairs(
        docs, n=5, threshold=0.95, max_df_frac=0.01, df_floor=5
    ).select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    sh = simhash_pairs(docs, max_hamming=5)
    return _recall_checked(
        exact_hi,
        sh,
        ("doc_a", "doc_b"),
        ["doc_a", "doc_b", "jaccard"],
        "recall_ok",
        0.90,
    )


_ANN_ORACLE = """
    WITH v AS (
      SELECT vec_id, embedding,
             sqrt(list_sum(list_transform(range(1, len(embedding)+1),
                  i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE))) AS nrm
      FROM embeddings
    ), q AS (
      SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm FROM v
      WHERE vec_id < 10
    ), scored AS (
      SELECT q.q_id, e.vec_id,
             list_sum(list_transform(range(1, len(e.embedding)+1),
                      i -> e.embedding[i]::DOUBLE * q.q_emb[i]::DOUBLE))
             / (e.nrm * q.q_nrm) AS sim
      FROM v e CROSS JOIN q
      WHERE e.vec_id <> q.q_id
    )
    SELECT q_id, vec_id, rank, round(sim, 6) AS sim
    FROM (
      SELECT q_id, vec_id, sim,
             row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank
      FROM scored
    ) WHERE rank <= 5
"""


@register(
    "ann_topk",
    oracle=_ANN_ORACLE,
    doc="Exact cosine top-5 per query (query set = vec_id < 10, "
    "broadcast): per-row norms hoisted out of the pair loop, one "
    "zip_with/aggregate dot fold per pair — the baseline the bucketed "
    "ANN is measured against.",
    tags=("datapipe", "ann"),
)
def ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", as_double("embedding").alias("emb"))
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), as_double("embedding").alias("q_emb")
    )
    return brute_force_topk(base, queries, k=5)


@register(
    "ann_bucketed",
    oracle=f"""
    SELECT q_id, vec_id, rank, sim, TRUE AS recall_ok
    FROM ({_ANN_ORACLE})
    """,
    doc="Sign-bucket ANN (2^6 buckets on leading-dim signs, multi-probe): "
    "query scans only its probe buckets — bucket id doubles as the "
    "partition key at scale. Driver-checkable form: rows are the exact "
    "brute-force top-5 (oracle-reproducible) plus recall_ok = bucketed "
    "search recovered >= 40% of them. The bound is honest about the "
    "corpus: the synthetic embeddings are RANDOM, the adversarial worst "
    "case for any locality index (no cluster structure; measured 0.54 "
    "at sf0.01 scanning ~11% of the corpus — 5x better than scan-share, "
    "which is what an LSH index can promise on isotropic data). "
    "Per-method recall also asserted in tests/test_datapipe.py.",
    tags=("datapipe", "ann"),
)
def ann_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", as_double("embedding").alias("emb"))
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), as_double("embedding").alias("q_emb")
    )
    exact = brute_force_topk(base, queries, k=5)
    approx = bucketed_topk(base, queries, k=5)
    return _recall_checked(
        exact,
        approx,
        ("q_id", "vec_id"),
        ["q_id", "vec_id", "rank", "sim"],
        "recall_ok",
        0.40,
    )


@register(
    "multimodal_decode",
    oracle="""
    SELECT doc_id,
           octet_length(text::BLOB) AS payload_len,
           md5(text) AS content_hash,
           'text-bytes' AS modality,
           (octet_length(text::BLOB) % 640) + 1 AS width,
           (octet_length(text::BLOB) % 480) + 1 AS height
    FROM documents
    """,
    doc="Multimodal plumbing: opaque binary payload + typed metadata, "
    "decoded through a real mapInPandas (Arrow-batched) stage with a "
    "deterministic stub decoder (heavyweight codec libs absent; the "
    "real-codec lane is multimodal_decode_real).",
    tags=("datapipe", "multimodal", "udf"),
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_workers_can_import(spark)
    docs = load_table(spark, sf_dir, "documents")
    return decode_features(attach_payload(docs))


@register(
    "multimodal_decode_real",
    oracle="""
    SELECT doc_id,
           54 + ((3 * (doc_id % 13 + 1) + 3) // 4) * 4 * (doc_id % 7 + 1)
             AS payload_len,
           (doc_id % 13 + 1)::INT AS width,
           (doc_id % 7 + 1)::INT AS height,
           24 AS bpp,
           3 * (doc_id % 13 + 1) * (doc_id % 7 + 1)
             * ('0x' || substr(md5(text), 1, 2))::BIGINT AS pixel_sum
    FROM documents
    """,
    doc="REAL media codec lane (VERDICT r06 item 6): each doc is "
    "encoded as an actual uncompressed 24-bit BMP (standard Windows "
    "DIB headers + padded BGR rows — any viewer opens the bytes), "
    "then decode_real struct-parses the headers and checksums the "
    "pixel array, all inside the same Arrow mapInPandas plumbing the "
    "stub queries use. The generated image is a solid color derived "
    "from md5(text) with dims from doc_id, so the oracle recomputes "
    "payload_len (54 + 4-byte-aligned stride x height) and pixel_sum "
    "(3 x w x h x color_byte; padding bytes are zero) in closed form "
    "— the decoder's output is checked against real-format bytes, "
    "not a fake. Reference anchor: the reference has no media path; "
    "this is the repo's LLM-datapipe extension "
    "(datapipe/multimodal.py:encode_bmp/decode_real).",
    tags=("datapipe", "multimodal", "udf", "codec"),
)
def multimodal_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall2021_flink_dw_spark.datapipe.multimodal import (
        attach_bmp_payload,
        decode_bmp_features,
    )

    ensure_workers_can_import(spark)
    docs = load_table(spark, sf_dir, "documents")
    return decode_bmp_features(attach_bmp_payload(docs))


@register(
    "multimodal_decode_mixed",
    oracle="""
    SELECT doc_id,
      CASE WHEN doc_id % 8 = 4 THEN 'jpeg'
           WHEN doc_id % 4 = 0 THEN 'bmp' WHEN doc_id % 4 = 1 THEN 'png'
           WHEN doc_id % 4 = 2 THEN 'wav' ELSE 'gif' END AS fmt,
      CASE WHEN doc_id % 8 = 4 THEN (8 * (doc_id % 3 + 1))::INT
           WHEN doc_id % 4 = 0 THEN (doc_id % 13 + 1)::INT
           WHEN doc_id % 4 = 1 THEN (doc_id % 11 + 1)::INT
           WHEN doc_id % 4 = 3 THEN (doc_id % 9 + 1)::INT END AS width,
      CASE WHEN doc_id % 8 = 4 THEN (8 * (doc_id % 5 + 1))::INT
           WHEN doc_id % 4 = 0 THEN (doc_id % 7 + 1)::INT
           WHEN doc_id % 4 = 1 THEN (doc_id % 5 + 1)::INT
           WHEN doc_id % 4 = 3 THEN (doc_id % 6 + 1)::INT END AS height,
      CASE WHEN doc_id % 4 = 2 THEN 16000::INT END AS sample_rate,
      CASE WHEN doc_id % 4 = 2
           THEN (doc_id % 100 + 10)::INT END AS n_samples,
      CASE
        WHEN doc_id % 8 = 4 THEN
             CAST(list_sum(list_transform(
                 range(0, (doc_id % 3 + 1) * (doc_id % 5 + 1)),
                 b -> 64 * ((doc_id * 7 + b * 13) % 256))) AS BIGINT)
        WHEN doc_id % 4 = 0 THEN 3 * (doc_id % 13 + 1) * (doc_id % 7 + 1)
                    * ('0x' || substr(md5(text), 1, 2))::BIGINT
        WHEN doc_id % 4 = 1 THEN 3 * (doc_id % 11 + 1) * (doc_id % 5 + 1)
                    * ('0x' || substr(md5(text), 1, 2))::BIGINT
        WHEN doc_id % 4 = 3 THEN 3 * (doc_id % 9 + 1) * (doc_id % 6 + 1)
                    * ('0x' || substr(md5(text), 1, 2))::BIGINT
        ELSE CAST(list_sum(list_transform(range(0, doc_id % 100 + 10),
             i -> ((doc_id * 31 + i * 7) % 65536) - 32768)) AS BIGINT)
      END AS checksum
    FROM documents
    """,
    doc="MIXED-modality real-codec lane (VERDICT r07 item 6): doc_id%4 "
    "picks the format — real 24-bit BMP, real 8-bit truecolor PNG "
    "(stdlib zlib deflate; the encoder cycles all five PNG filter "
    "types so decode exercises full filter reversal, with chunk CRC "
    "validation), real RIFF/WAVE PCM-16 (ramp samples), or real GIF87a "
    "(r09: full variable-code-width LZW, palette mapping); r10 carves "
    "half the BMP slot (doc_id%8==4) into real BASELINE-DCT grayscale "
    "JPEG — full DQT/SOF0/DHT/SOS parse, canonical Huffman entropy "
    "decode, dequant, dezigzag, float IDCT — generated as flat 8x8 "
    "blocks with DC quant step 8, the provably-lossless JPEG subset, "
    "so the per-pixel closed form survives the lossy codec. ONE "
    "mapInPandas decode stage dispatches on magic bytes, the shape of "
    "a heterogeneous media lake where a directory is never one format. "
    "All generated parameters derive from doc_id and md5(text), so "
    "width/height/sample_rate/n_samples/checksum all have closed forms "
    "the oracle recomputes (PNG/BMP/GIF checksum = sum of decoded RGB "
    "bytes = 3*w*h*color; WAV checksum = sum of the deterministic "
    "int16 ramp). datapipe/multimodal.py:encode_png/decode_png/"
    "encode_wav/decode_wav/encode_gif/decode_gif/decode_mixed_batch.",
    tags=("datapipe", "multimodal", "udf", "codec"),
)
def multimodal_decode_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall2021_flink_dw_spark.datapipe.multimodal import (
        attach_mixed_payload,
        decode_mixed_features,
    )

    ensure_workers_can_import(spark)
    docs = load_table(spark, sf_dir, "documents")
    return decode_mixed_features(attach_mixed_payload(docs))


@register(
    "multimodal_decode_jpeg_ac",
    oracle="""
    SELECT doc_id,
      (8 * (doc_id % 3 + 1))::INT AS width,
      (8 * (doc_id % 5 + 1))::INT AS height,
      CAST(list_sum(list_transform(
          range(0, (doc_id % 3 + 1) * (doc_id % 5 + 1)),
          b -> 64 * (16 + (doc_id * 7 + b * 13) % 224))) AS BIGINT)
        AS pixel_sum,
      CAST(list_sum(list_transform(
          range(0, (doc_id % 3 + 1) * (doc_id % 5 + 1)),
          b -> 64 * ((16 + (doc_id * 7 + b * 13) % 224)
                     * (16 + (doc_id * 7 + b * 13) % 224)
                     + 4 * ((doc_id + 5 * b) % 15 - 7)
                         * ((doc_id + 5 * b) % 15 - 7)))) AS BIGINT)
        AS pixel_sq_sum,
      CAST(list_sum(list_transform(
          range(0, (doc_id % 3 + 1) * (doc_id % 5 + 1)),
          b -> 128 * ((doc_id + 5 * b) % 15 - 7))) AS BIGINT)
        AS ac44_sum
    FROM documents
    """,
    doc="AC-EXERCISING JPEG decode lane (VERDICT r10 item 5): the r10 "
    "flat-block corpus only ever drove the decoder's DC fast path; "
    "this twin generates real baseline JPEGs whose every block also "
    "carries a quantized AC(4,4) coefficient, so the driver hash now "
    "covers the full Huffman run/size (ZRL x2 + run-6) -> dezigzag -> "
    "float-IDCT path. The (4,4) basis is +-1/2 at every sample, so "
    "with AC qstep 16 the contribution is the exact integer "
    "2*qA*s(x)s(y) — lossless by construction, keeping the oracle "
    "closed-form. Three features pin distinct failure modes: "
    "pixel_sum (DC — the AC pattern cancels), pixel_sq_sum (AC "
    "magnitude via Parseval), ac44_sum (the (4,4) projection = "
    "128*sum(qA) — zero under wrong-position or wrong-sign decode). "
    "100 TB shape: embarrassingly parallel mapInPandas, no shuffle. "
    "datapipe/multimodal.py:encode_jpeg_gray_blocks_ac/"
    "jpeg_ac_features_batch.",
    tags=("datapipe", "multimodal", "udf", "codec"),
)
def multimodal_decode_jpeg_ac(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall2021_flink_dw_spark.datapipe.multimodal import (
        attach_jpeg_ac_payload,
        jpeg_ac_features,
    )

    ensure_workers_can_import(spark)
    # The full-IDCT decode is the rare CPU-BOUND Python stage: the
    # sf0.1 documents table is one parquet file -> one partition, so
    # without this round-robin exchange (8-byte doc_id rows — KBs) the
    # whole Huffman+IDCT pipeline serializes onto a single core
    # (measured 6.2 s -> ~0.6 s at sf0.1). At 100 TB the input arrives
    # in thousands of splits and the exchange collapses to a no-op
    # cost; matching partitions to cores for codec stages is the
    # standard media-lake layout.
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    return jpeg_ac_features(attach_jpeg_ac_payload(docs))


@register(
    "multimodal_audio_features",
    oracle="""
    WITH w AS (
      SELECT doc_id, doc_id % 100 + 10 AS n,
             list_transform(range(0, doc_id % 100 + 10),
                 i -> ((doc_id * 31 + i * 7) % 65536) - 32768) AS s
      FROM documents WHERE doc_id % 4 = 2
    )
    SELECT doc_id,
           16000::INT AS sample_rate,
           n::INT AS n_samples,
           (n * 1000000 // 16000)::BIGINT AS duration_us,
           CAST(list_sum(list_transform(s, x -> x * x)) AS BIGINT)
             AS energy,
           CAST(len(list_filter(range(1, n),
                i -> s[i] * s[i + 1] < 0)) AS INT) AS zero_crossings,
           CAST(list_max(list_transform(s, x -> abs(x))) AS INT) AS peak
    FROM w
    """,
    doc="Audio FEATURE EXTRACTION over real decoded WAV payloads (the "
    "brief's decode/feature-extract lane, beyond plumbing): the audio "
    "slice of the mixed corpus (doc_id%4=2 — the filter lands on the "
    "parquet scan before any payload is built) is decoded and reduced "
    "to the classic integer-exact features — energy (sum of squared "
    "PCM-16 samples, int64), zero-crossing count (strict sign change), "
    "peak amplitude, duration in integer microseconds. No float enters "
    "the kernel, so every field is bit-exact against the oracle's "
    "closed-form ramp recomputation. 100 TB shape: embarrassingly "
    "parallel mapInPandas (numpy int64 vector math per payload), no "
    "shuffle at all. datapipe/multimodal.py:audio_features_batch.",
    tags=("datapipe", "multimodal", "udf", "audio"),
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall2021_flink_dw_spark.datapipe.multimodal import (
        attach_mixed_payload,
        extract_audio_features,
    )

    ensure_workers_can_import(spark)
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 4 == 2
    )
    return extract_audio_features(attach_mixed_payload(docs))


@register(
    "multimodal_image_stats",
    oracle="""
    WITH p AS (
      SELECT doc_id,
             (doc_id % 12 + 2)::INT AS width,
             (doc_id % 8 + 2)::INT AS height,
             list_transform(
               range(0, (doc_id % 12 + 2) * (doc_id % 8 + 2)),
               i -> (doc_id * 7 + i * 13) % 256) AS v
      FROM documents
    )
    SELECT doc_id, width, height,
           CAST(list_sum(v) AS BIGINT) AS brightness_sum,
           CAST(list_min(v) AS INT) AS v_min,
           CAST(list_max(v) AS INT) AS v_max,
           CAST(len(list_filter(v, x -> x // 32 = 0)) AS INT) AS h0,
           CAST(len(list_filter(v, x -> x // 32 = 1)) AS INT) AS h1,
           CAST(len(list_filter(v, x -> x // 32 = 2)) AS INT) AS h2,
           CAST(len(list_filter(v, x -> x // 32 = 3)) AS INT) AS h3,
           CAST(len(list_filter(v, x -> x // 32 = 4)) AS INT) AS h4,
           CAST(len(list_filter(v, x -> x // 32 = 5)) AS INT) AS h5,
           CAST(len(list_filter(v, x -> x // 32 = 6)) AS INT) AS h6,
           CAST(len(list_filter(v, x -> x // 32 = 7)) AS INT) AS h7
    FROM p
    """,
    doc="Image FEATURE EXTRACTION over real PATTERNED BMPs (the image "
    "analog of multimodal_audio_features, upgrading the BMP lane from "
    "solid-color payloads to true per-pixel content): each doc gets a "
    "gray BMP whose pixel i = (doc_id*7 + i*13) % 256; decode walks "
    "the padded bottom-up rows back out and reduces the gray channel "
    "to brightness sum, min/max, and an 8-bin histogram — all order-"
    "free integer reductions, bit-exact against the oracle's closed-"
    "form pixel recomputation. 100 TB shape: embarrassingly parallel "
    "mapInPandas, zero shuffles. datapipe/multimodal.py:"
    "encode_bmp_gray/decode_bmp_pixels/image_stats_batch.",
    tags=("datapipe", "multimodal", "udf", "codec"),
)
def multimodal_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall2021_flink_dw_spark.datapipe.multimodal import (
        attach_patterned_bmp,
        extract_image_stats,
    )

    ensure_workers_can_import(spark)
    docs = load_table(spark, sf_dir, "documents")
    return extract_image_stats(attach_patterned_bmp(docs))


@register(
    "dedup_substring_spans",
    oracle="""
    WITH g AS (
      SELECT doc_id, u.i AS pos, substr(text, u.i + 1, 50) AS gram
      FROM documents
      CROSS JOIN LATERAL unnest(range(0, greatest(len(text) - 49, 0)))
           AS u(i)
      WHERE len(text) >= 50
    ), d AS (
      SELECT gram FROM g GROUP BY gram HAVING count(*) > 1
    ), hits AS (
      SELECT g.doc_id, g.pos FROM g JOIN d USING (gram)
    ), brk AS (
      SELECT doc_id, pos,
             CASE WHEN pos > coalesce(max(pos + 50) OVER (
                  PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS is_start
      FROM hits
    ), grp AS (
      SELECT doc_id, pos,
             sum(is_start) OVER (PARTITION BY doc_id ORDER BY pos)
               AS span_id
      FROM brk
    ), spans AS (
      SELECT doc_id, span_id, min(pos) AS s, max(pos) + 50 AS e
      FROM grp GROUP BY doc_id, span_id
    )
    SELECT doc_id, count(*)::INT AS dup_spans,
           CAST(sum(e - s) AS BIGINT) AS dup_chars
    FROM spans GROUP BY doc_id
    """,
    doc="EXACT substring-level dedup (ExactSubstr, Lee et al. 2022 — "
    "the training-data op document/paragraph-level dedup misses: "
    "boilerplate repeated INSIDE otherwise-unique pages): every "
    "position whose 50-char substring occurs >1 time anywhere in the "
    "corpus, merged per doc into maximal spans via a running-max "
    "window; emits (doc_id, dup_spans, dup_chars), all-integer. One "
    "2-column scan, gram agg + hit join on the same shuffle key, two "
    "same-key aggs. datapipe/dedup.py:duplicated_substring_spans.",
    tags=("datapipe", "dedup", "window"),
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall2021_flink_dw_spark.datapipe.dedup import (
        duplicated_substring_spans,
    )

    docs = load_table(spark, sf_dir, "documents")
    return duplicated_substring_spans(docs, min_len=50)


@register(
    "dedup_substring_spans_hashed",
    oracle="""
    WITH g AS (
      SELECT doc_id, u.i AS pos, substr(text, u.i + 1, 50) AS gram
      FROM documents
      CROSS JOIN LATERAL unnest(range(0, greatest(len(text) - 49, 0)))
           AS u(i)
      WHERE len(text) >= 50
    ), d AS (
      SELECT gram FROM g GROUP BY gram HAVING count(*) > 1
    ), hits AS (
      SELECT g.doc_id, g.pos FROM g JOIN d USING (gram)
    ), brk AS (
      SELECT doc_id, pos,
             CASE WHEN pos > coalesce(max(pos + 50) OVER (
                  PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS is_start
      FROM hits
    ), grp AS (
      SELECT doc_id, pos,
             sum(is_start) OVER (PARTITION BY doc_id ORDER BY pos)
               AS span_id
      FROM brk
    ), spans AS (
      SELECT doc_id, span_id, min(pos) AS s, max(pos) + 50 AS e
      FROM grp GROUP BY doc_id, span_id
    )
    SELECT doc_id, count(*)::INT AS dup_spans,
           CAST(sum(e - s) AS BIGINT) AS dup_chars
    FROM spans GROUP BY doc_id
    """,
    doc="SCALE-PATH twin of dedup_substring_spans: the corpus-wide "
    "frequency key is xxhash64(gram) — 8 fixed-width bytes computed in "
    "the projection that builds the substring, so no gram string is "
    "ever shuffled, and (r10) NOTHING is persisted: the duplicate "
    "test is count() OVER (PARTITION BY k) inside the plan's one "
    "shuffle, with (doc_id,pos) packed into a single long. Third "
    "decade (126M grams): 36.7 s (r09 persist form) -> 15.8 s, decade "
    "ratio 14x -> 7.5x (BASELINE.md r10). The oracle is the EXACT "
    "recomputation: a 64-bit collision (odds n^2/2^65, ~4e-10 at "
    "checked scale) would surface as a driver hash mismatch rather "
    "than hide. datapipe/dedup.py:merged_duplicate_spans_hashed.",
    tags=("datapipe", "dedup", "window", "approx-scale-path"),
)
def dedup_substring_spans_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall2021_flink_dw_spark.datapipe.dedup import (
        merged_duplicate_spans_hashed,
    )

    docs = load_table(spark, sf_dir, "documents")
    return (
        merged_duplicate_spans_hashed(docs, min_len=50)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("dup_spans"),
            F.sum(F.col("e") - F.col("s")).cast("long").alias("dup_chars"),
        )
    )


@register(
    "dedup_substring_clean",
    oracle="""
    WITH g AS (
      SELECT doc_id, u.i AS pos, substr(text, u.i + 1, 50) AS gram
      FROM documents
      CROSS JOIN LATERAL unnest(range(0, greatest(len(text) - 49, 0)))
           AS u(i)
      WHERE len(text) >= 50
    ), d AS (
      SELECT gram FROM g GROUP BY gram HAVING count(*) > 1
    ), hits AS (
      SELECT g.doc_id, g.pos FROM g JOIN d USING (gram)
    ), brk AS (
      SELECT doc_id, pos,
             CASE WHEN pos > coalesce(max(pos + 50) OVER (
                  PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS is_start
      FROM hits
    ), grp AS (
      SELECT doc_id, pos,
             sum(is_start) OVER (PARTITION BY doc_id ORDER BY pos)
               AS span_id
      FROM brk
    ), spans AS (
      SELECT doc_id, span_id, min(pos) AS s, max(pos) + 50 AS e
      FROM grp GROUP BY doc_id, span_id
    ), seg AS (
      SELECT doc_id, s, e,
             coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0)
               AS seg_start
      FROM spans
    ), per_doc AS (
      SELECT seg.doc_id,
             string_agg(substr(text, seg_start + 1, s - seg_start), ''
                        ORDER BY s) AS head,
             max(e) AS max_e,
             CAST(sum(e - s) AS BIGINT) AS removed_chars
      FROM seg JOIN documents USING (doc_id)
      GROUP BY seg.doc_id
    )
    SELECT documents.doc_id,
           CASE WHEN head IS NULL THEN text
                ELSE coalesce(head, '') || substr(text, max_e + 1)
           END AS clean_text,
           coalesce(removed_chars, 0)::BIGINT AS removed_chars
    FROM documents LEFT JOIN per_doc USING (doc_id)
    """,
    doc="ExactSubstr's actionable half: CUT the merged duplicated "
    "50-char spans out of every doc (strictest remove-all-occurrences "
    "contract — contamination-scrub form; Lee et al.'s keep-one "
    "variant is a min_by election away), emitting (doc_id, clean_text, "
    "removed_chars) for all docs. Reassembly = lag-window segments "
    "concatenated in span order + tail — pure string/integer ops, "
    "bit-exact including the full cleaned text. "
    "datapipe/dedup.py:remove_duplicate_spans.",
    tags=("datapipe", "dedup", "window"),
)
def dedup_substring_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall2021_flink_dw_spark.datapipe.dedup import (
        remove_duplicate_spans,
    )

    docs = load_table(spark, sf_dir, "documents")
    return remove_duplicate_spans(docs, min_len=50)


_EMB_DEDUP_ORACLE = """
    WITH v AS (
      SELECT vec_id, embedding,
             sqrt(list_sum(list_transform(range(1, len(embedding)+1),
                  i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE))) AS nrm
      FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(
             list_sum(list_transform(range(1, len(a.embedding)+1),
                      i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
             / (a.nrm * b.nrm), 6) AS sim
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE list_sum(list_transform(range(1, len(a.embedding)+1),
                   i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
          / (a.nrm * b.nrm) >= 0.45
"""


@register(
    "dedup_embedding_cosine",
    oracle=_EMB_DEDUP_ORACLE,
    doc="Embedding-cosine near-dup pairs (threshold 0.45 — the synthetic "
    "embeddings are random, max pair sim ~0.51 at sf0.01, so 0.45 keeps "
    "the parity check non-vacuous): exact all-pairs via BLOCKED numpy "
    "GEMM tiles (datapipe/ann.py::blocked_cosine_pairs — the standard "
    "distributed all-pairs layout: replicate each vector to its "
    "n_blocks tile groups, one BLAS matmul per tile, threshold applied "
    "pre-shuffle; ~20x over the per-pair interpreted Catalyst fold). "
    "The 100 TB path reuses the sign-bucket index (candidates = "
    "same/adjacent bucket) exactly like ann_bucketed — this exact form "
    "is its ground truth.",
    tags=("datapipe", "dedup", "ann"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall2021_flink_dw_spark.datapipe.ann import (
        as_double,
        blocked_cosine_pairs,
    )

    ensure_workers_can_import(spark)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("emb")
    )
    pairs = blocked_cosine_pairs(emb, threshold=0.45, n_blocks=8)
    return pairs.select("vec_a", "vec_b", F.round("sim", 6).alias("sim"))


@register(
    "text_quality",
    oracle=f"""
    WITH t AS (SELECT doc_id, length(text) AS n_chars, {TOKENS_SQL} AS w
               FROM documents)
    SELECT doc_id, n_chars,
           len(w) AS n_tokens,
           round(list_sum(list_transform(w, x -> length(x)))::double / len(w), 6)
             AS mean_token_len,
           round((n_chars - list_sum(list_transform(w, x -> length(x))))::double
                 / n_chars, 6) AS ws_ratio,
           round(len(list_distinct(w))::double / len(w), 6) AS ttr,
           round(list_max(list_transform(list_distinct(w),
                 d -> len(list_filter(w, x -> x = d))))::double / len(w), 6)
             AS rep_ratio,
           (len(w) >= 10
            AND len(list_distinct(w))::double / len(w) >= 0.3
            AND list_max(list_transform(list_distinct(w),
                  d -> len(list_filter(w, x -> x = d))))::double / len(w) <= 0.2)
             AS passes
    FROM t WHERE len(w) > 0
    """,
    doc="Quality scoring per document: mean token length, whitespace "
    "ratio, type-token ratio, top-token repetition share, and a "
    "documented pass gate (>=10 tokens, TTR>=0.3, rep<=0.2). All "
    "ratios are exact-integer divisions done once in double, so both "
    "engines round identically. (Punct/digit ratios omitted: the "
    "synthetic corpus is lowercase word-only — they'd be constant 0.)",
    tags=("datapipe", "text", "quality"),
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    t = F.col("__tokens")
    n_tok = F.size(t)
    sum_len = F.aggregate(
        F.transform(t, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    uniq = F.size(F.array_distinct(t))
    max_rep = max_token_repetition(t)
    ttr = uniq.cast("double") / n_tok
    rep = max_rep.cast("double") / n_tok
    return docs.filter(n_tok > 0).select(
        "doc_id",
        F.length("text").alias("n_chars"),
        n_tok.cast("bigint").alias("n_tokens"),
        F.round(sum_len.cast("double") / n_tok, 6).alias("mean_token_len"),
        F.round(
            (F.length("text") - sum_len).cast("double") / F.length("text"), 6
        ).alias("ws_ratio"),
        F.round(ttr, 6).alias("ttr"),
        F.round(rep, 6).alias("rep_ratio"),
        ((n_tok >= 10) & (ttr >= 0.3) & (rep <= 0.2)).alias("passes"),
    )


_QC_STOP_SQL = ", ".join(f"'{s}'" for s in STOPWORDS)


@register(
    "quality_classifier",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {TOKENS_SQL} AS w FROM documents
    ), feat AS (
      SELECT doc_id, len(w) AS n_tokens,
             list_sum(list_transform(w, t ->
               ('0x' || substr(md5(t), 1, 8))::BIGINT % 2001 - 1000))
               AS sum_w,
             len(list_filter(w, t -> t IN ({_QC_STOP_SQL}))) AS n_stop
      FROM t WHERE len(w) > 0
    )
    SELECT doc_id, n_tokens,
           (2 * sum_w + 1000 * n_stop)::DOUBLE / (2000.0 * n_tokens)
             AS score,
           (2 * sum_w + 1000 * n_stop) > 0 AS keep
    FROM feat
    """,
    doc="Hash-trick linear quality classifier (the fastText-style "
    "filter shape of CCNet/RefinedWeb, with deterministic hash-derived "
    "weights standing in for trained ones): each token indexes a "
    "weight via md5 -> [-1, 1] in 1/1000 steps, doc score = mean "
    "token weight + 0.5 * stopword ratio, keep = score > 0. At scale "
    "a trained weight vector is a broadcast array indexed by the same "
    "hash — the scoring plan is identical. The whole path stays in "
    "whole-stage codegen: the per-doc weight sum is an integer "
    "F.aggregate fold over the token array (no explode, no shuffle, "
    "and — being integer — exactly associative, so Spark and DuckDB "
    "agree bit-for-bit regardless of fold order). The score is kept "
    "as ONE exact integer ratio, (2*sum_w + 1000*n_stop)/(2000*n) — "
    "a single correctly-rounded IEEE divide, bit-identical across "
    "engines with no round() (whose half-way decimals the engines "
    "break differently; a 0.1283875 hit this at sf0.01).",
    tags=("datapipe", "text", "quality"),
)
def quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    t = F.col("__tokens")
    n_tok = F.size(t)
    w_int = lambda x: (  # noqa: E731 — token -> integer weight in [-1000, 1000]
        F.conv(F.substring(F.md5(x), 1, 8), 16, 10).cast("bigint") % 2001
        - 1000
    )
    sum_w = F.aggregate(
        F.transform(t, w_int),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    n_stop = marker_hits(t, STOPWORDS)
    num = F.lit(2) * sum_w + F.lit(1000) * n_stop
    score = num.cast("double") / (F.lit(2000.0) * n_tok)
    return docs.filter(n_tok > 0).select(
        "doc_id",
        n_tok.cast("bigint").alias("n_tokens"),
        score.alias("score"),
        (num > 0).alias("keep"),
    )


def _bigram_doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lp, n_bigrams) under the self-trained add-one bigram
    LM — the shared scoring core of text_perplexity and
    sample_ccnet_buckets. lp is UNROUNDED; consumers apply their own
    emission contract (round(,6) / epsilon gates).

    r11 (VERDICT r10 item 2): replanned onto the dictionary-encoding
    Arrow kernel pair in datapipe/bigram_lm.py — fit emits per-batch
    DISTINCT (w1, w2, k) partials (one vocabulary-sized shuffle, no
    corpus shuffle), the model broadcasts to a scoring kernel that
    emits one row per doc (no shuffle at all). The r07-r10 JVM
    explode+join form (three corpus-scale exchanges) is kept below as
    _bigram_doc_scores_jvm for the measured decade comparison
    (BASELINE.md r11)."""
    from gmall2021_flink_dw_spark.datapipe.bigram_lm import (
        bigram_lm_scores,
        fit_bigram_model,
    )

    docs = with_tokens(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "__tokens"
    )
    ensure_workers_can_import(spark)
    model = fit_bigram_model(docs)
    bcast = spark.sparkContext.broadcast(model)
    return bigram_lm_scores(docs, bcast)


def _bigram_doc_scores_jvm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-r11 JVM form of _bigram_doc_scores (explode + three
    corpus-scale exchanges), retained unregistered for decade
    measurements and as the fallback if the kernel ever loses (the
    rolling-hash precedent, BASELINE.md r10)."""
    # project BEFORE persisting: persist materializes whatever it is
    # handed, so caching the full row would defeat parquet column
    # pruning (the scan must read only doc_id + text)
    docs = tracked_persist(
        with_tokens(load_table(spark, sf_dir, "documents")).select(
            "doc_id", "__tokens"
        )
    )
    t = F.col("__tokens")
    bg = docs.filter(F.size(t) >= 2).select(
        "doc_id", F.explode(bigram_pairs(t)).alias("p")
    )
    # per-(doc, bigram) counts feed three consumers (model counts x2 +
    # scoring join) — persist, same rationale as tfidf's tf table.
    dtf = tracked_persist(
        bg.select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    bc = dtf.groupBy("w1", "w2").agg(F.sum("k").alias("cb"))
    # cu re-aggregates bc (not dtf): sum over w2 of cb == sum over dtf of
    # k, same integers, but the input is the model table — and the
    # leading-word join lands on the MODEL side, so the big per-doc
    # table is shuffled once (on the bigram), not twice. At 100 TB dtf
    # is corpus-sized while bc/uc are vocabulary-sized; joining them
    # first is the difference between one and two corpus shuffles.
    uc = bc.groupBy("w1").agg(F.sum("cb").alias("cu"))
    model = bc.join(uc, ["w1"])
    voc = docs.select(F.explode(t).alias("tk")).agg(
        F.count_distinct("tk").alias("v")
    )
    lp_term = F.log(
        (F.col("cb") + F.lit(1)).cast("double") / (F.col("cu") + F.col("v"))
    )
    return (
        dtf.join(model, ["w1", "w2"])
        .crossJoin(F.broadcast(voc))
        .withColumn("lpk", F.col("k") * lp_term)
        .groupBy("doc_id")
        .agg(
            (F.sum("lpk") / F.sum("k")).alias("lp"),
            F.sum("k").cast("bigint").alias("n_bigrams"),
        )
    )



@register(
    "text_perplexity",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {TOKENS_SQL} AS w FROM documents),
    bg AS (
      SELECT doc_id, unnest({DUCK_BIGRAMS_SQL}) AS p
      FROM tok WHERE len(w) >= 2
    ),
    dtf AS (
      SELECT doc_id, p.w1 AS w1, p.w2 AS w2, count(*) AS k
      FROM bg GROUP BY 1, 2, 3
    ),
    bc AS (SELECT w1, w2, sum(k)::BIGINT AS cb FROM dtf GROUP BY 1, 2),
    uc AS (SELECT w1, sum(k)::BIGINT AS cu FROM dtf GROUP BY 1),
    voc AS (
      SELECT count(DISTINCT t) AS v
      FROM (SELECT unnest(w) AS t FROM tok)
    ),
    doc AS (
      SELECT d.doc_id,
             sum(d.k * ln((bc.cb + 1)::DOUBLE / (uc.cu + voc.v)))
               / sum(d.k) AS lp,
             sum(d.k)::BIGINT AS n_bigrams
      FROM dtf d
      JOIN bc USING (w1, w2) JOIN uc USING (w1) CROSS JOIN voc
      GROUP BY 1
    ),
    mu AS (SELECT avg(lp) AS mu FROM doc)
    SELECT doc_id, n_bigrams, round(lp, 6) AS logprob,
           lp >= mu.mu - 1e-9 AS keep
    FROM doc, mu
    """,
    doc="Bigram-LM fluency filter (the CCNet/RefinedWeb perplexity-"
    "filter shape, self-trained on the corpus): per-doc mean log "
    "P(w2|w1) under an add-one-smoothed bigram model whose counts come "
    "from the corpus itself; keep = at-or-above the corpus mean. "
    "Plan: one shuffle to per-(doc, bigram) counts, model counts by "
    "RE-aggregating that table (the tfidf two-phase pattern — no "
    "second pass over raw text), vocab size and corpus mean as 1-row "
    "broadcast aggs, score joins keyed on the bigram (AQE splits the "
    "hot 'of the'-style keys). At 100 TB the model tables are exactly "
    "the KenLM count files — materialized once, broadcast/bucket-"
    "joined by every scoring run. FLOAT-TIE HARDENING (VERDICT r06 "
    "item 3): keep uses an epsilon-guarded comparison, lp >= mu - 1e-9 "
    "in BOTH engines. The realistic cross-engine flip was STRUCTURAL "
    "ties — duplicate/near-duplicate docs put lp within ~1 ulp of mu, "
    "and summation order then decides the >= — and the grace band "
    "moves the boundary to -1e-9, a gap no corpus produces "
    "structurally (true gaps are either ~0 or macroscopic), so "
    "sub-ulp engine noise can no longer cross it. logprob keeps "
    "round(lp, 6): an exact-integer emission is impossible (ln() is "
    "irrational — unlike quality_classifier's single integer ratio), "
    "and the round-half hazard needs the double's decimal expansion "
    "to terminate in an exact half at digit 7, which requires a "
    "binary-clean value that no ln()-sum produces; residual risk is "
    "summation-order noise (~1e-14) crossing the 1e-6 grid, "
    "p ~ 1e-8 per doc.",
    tags=("datapipe", "text", "quality", "join"),
)
def text_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc_scores = _bigram_doc_scores(spark, sf_dir)
    mu = doc_scores.agg(F.avg("lp").alias("mu"))
    return doc_scores.crossJoin(F.broadcast(mu)).select(
        "doc_id",
        "n_bigrams",
        F.round("lp", 6).alias("logprob"),
        # epsilon-guarded gate: see the register doc (VERDICT r06 item 3)
        (F.col("lp") >= F.col("mu") - F.lit(1e-9)).alias("keep"),
    )


@register(
    "doc_winnow_fingerprint",
    oracle=f"""
    WITH t AS (SELECT doc_id, {TOKENS_SQL} AS w FROM documents),
    {DUCK_WINNOW_CTES}
    SELECT doc_id, len(fp) AS n_fp,
           md5(array_to_string(fp, ',')) AS fingerprint
    FROM win
    """,
    doc="Winnowing document fingerprint (MOSS-style rolling hash): md5 "
    "each token 3-gram in order, slide a window of 3 over the hash "
    "sequence, keep the min per window, distinct+sort the kept hashes "
    "— a compact fingerprint robust to local edits (any shared run of "
    ">= window+gram tokens surfaces a shared selected hash). Pure "
    "array expressions, one pass, no shuffle beyond the scan. Selected-"
    "hash construction shared with dedup_winnow_pairs "
    "(datapipe/text.py::winnow_fingerprints).",
    tags=("datapipe", "text", "dedup"),
)
def doc_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall2021_flink_dw_spark.datapipe.text import winnow_fingerprints

    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    t = F.col("__tokens")
    out = docs.filter(F.size(t) >= 5).select(
        "doc_id", winnow_fingerprints(t).alias("fp")
    )
    return out.select(
        "doc_id",
        F.size("fp").cast("bigint").alias("n_fp"),
        F.md5(F.concat_ws(",", F.col("fp"))).alias("fingerprint"),
    )


@register(
    "dedup_winnow_pairs",
    oracle=f"""
    WITH t AS (SELECT doc_id, {TOKENS_SQL} AS w FROM documents),
    {DUCK_WINNOW_CTES},
    e AS (
      SELECT doc_id, len(fp) AS n_fp, unnest(fp) AS h FROM win
    ),
    capped AS (
      SELECT h FROM e GROUP BY h
      HAVING count(*) <= greatest(5, least(
             ceil(0.01 * (SELECT count(DISTINCT doc_id) FROM e)),
             {DF_CAP_CEIL}))
    ),
    ec AS (SELECT e.* FROM e JOIN capped USING (h))
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           count(*) AS n_shared,
           round(count(*)::double /
                 least(any_value(a.n_fp), any_value(b.n_fp)), 6)
             AS overlap
    FROM ec a JOIN ec b ON a.h = b.h AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING count(*) >= 3
    """,
    doc="Cross-doc winnowing overlap pairs (the MOSS match step, "
    "Schleimer et al. 2003): explode each doc's winnow-selected hashes "
    "into an inverted index, self-join on the hash, keep pairs sharing "
    ">= 3 selected hashes, report containment overlap n_shared/"
    "min(|fp_a|,|fp_b|). The index holds only the winnow-SELECTED "
    "hashes (~1/window of all 3-grams) — sub-linear index size is the "
    "winnowing point vs the full-shingle Jaccard join. Same df cap as "
    "dedup_ngram_jaccard (hashes in > max(5, 1% of corpus) docs "
    "dropped pre-join) bounds the per-hash fan-out at 100x data; "
    "exact, no sketch — bit-reproducible by the oracle.",
    tags=("datapipe", "dedup", "join"),
)
def dedup_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall2021_flink_dw_spark.datapipe.text import winnow_fingerprint_rows

    ensure_workers_can_import(spark)
    # Arrow winnow kernel (r12): the JVM form built a concat string + a
    # 32-char md5 hex string per gram and ran the window mins over
    # strings — 13.4-13.6 s of this query's 17.5-19.8 s at 10x; the
    # kernel compares 16-byte digests and only materializes the
    # selected hashes (bit-identical, pinned in tests/test_functions.py).
    # persisted co-partitioned on the join key (the jaccard inverted-
    # index pattern): the df-count groupBy and both self-join sides
    # read co-located cache blocks exchange-free in the AQE final plan.
    e = tracked_persist(
        winnow_fingerprint_rows(
            load_table(spark, sf_dir, "documents")
        ).repartition("h")
    )
    # Relative df cap, action-free (the ngram_jaccard_pairs pattern):
    # corpus size as a lazy 1-row broadcast agg, HOT hashes (small by
    # construction) anti-joined away.
    df_counts = e.groupBy("h").agg(F.count(F.lit(1)).alias("__df"))
    # r15: corpus count from the per-doc side — distinct doc_id in the
    # winnow index is exactly the docs with >= 5 tokens (every such doc
    # selects >= 1 fingerprint), and one size-filtered tokenize pass
    # beats a distinct-shuffle over the ~50x larger exploded index
    # (same change as ngram_jaccard_pairs).
    total = (
        with_tokens(load_table(spark, sf_dir, "documents"))
        .filter(F.size("__tokens") >= 5)
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    hot = df_counts.crossJoin(F.broadcast(total)).filter(
        F.col("__df")
        > F.greatest(
            F.lit(5),
            F.least(
                F.ceil(F.lit(0.01) * F.col("__n")), F.lit(DF_CAP_CEIL)
            ),
        )
    )
    # hot set persisted: the anti-join result feeds both self-join
    # sides; without it the cap sub-plan runs once per side.
    ec = e.join(
        F.broadcast(tracked_persist(hot.select("h"))), "h", "left_anti"
    )
    # Partitioned self-join on the hash (shuffle_hash: Catalyst's size
    # estimate for exploded output under-counts and would broadcast the
    # whole index — the same trap ngram_jaccard_pairs documents).
    a = ec.select(
        F.col("h"),
        F.col("doc_id").alias("doc_a"),
        F.col("n_fp").alias("na"),
    ).hint("shuffle_hash")
    b = ec.select(
        F.col("h"),
        F.col("doc_id").alias("doc_b"),
        F.col("n_fp").alias("nb"),
    )
    pairs = (
        a.join(b, "h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("n_shared"),
            F.first("na").alias("na"),
            F.first("nb").alias("nb"),
        )
        .filter(F.col("n_shared") >= 3)
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        "n_shared",
        F.round(
            F.col("n_shared").cast("double") / F.least("na", "nb"), 6
        ).alias("overlap"),
    )


@register(
    "ann_ivf",
    oracle=f"""
    SELECT q_id, vec_id, rank, sim, TRUE AS recall_ok
    FROM ({_ANN_ORACLE})
    """,
    doc="IVF ANN (16 inverted lists, 4-probe): a trained coarse "
    "quantizer partitions the corpus; each query scans only its 4 "
    "closest lists (1/4 of the data; the list id is the partition key "
    "at scale). Driver-checkable form: rows are the exact brute-force "
    "top-5 (oracle-reproducible) plus recall_ok = IVF recovered >= 40% "
    "of them (measured 0.58 at sf0.01 on RANDOM embeddings — the no-"
    "cluster worst case for IVF; ~2.3x better than the 25% scan "
    "share). Per-method recall also asserted in tests/test_datapipe.py.",
    tags=("datapipe", "ann", "ivf"),
)
def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall2021_flink_dw_spark.datapipe.ann import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", as_double("embedding").alias("emb"))
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), as_double("embedding").alias("q_emb")
    )
    exact = brute_force_topk(base, queries, k=5)
    approx = ivf_topk(base, queries, n_lists=16, n_probe=4, k=5)
    return _recall_checked(
        exact,
        approx,
        ("q_id", "vec_id"),
        ["q_id", "vec_id", "rank", "sim"],
        "recall_ok",
        0.40,
    )


@register(
    "ann_pq",
    oracle=f"""
    SELECT q_id, vec_id, rank, sim, TRUE AS recall_ok
    FROM ({_ANN_ORACLE})
    """,
    doc="Product-quantization ANN with ADC + exact re-rank (Jegou et "
    "al. 2011; the FAISS Flat-PQ + RefineFlat pattern) — the MEMORY "
    "path at 100 TB: corpus vectors stored as 8 code bytes (8 "
    "subspaces x 16 codes, codebooks fit on a deterministic 256-row "
    "sample, corpus-size-independent) plus one exact norm; the "
    "corpus-wide scan reads codes against a broadcast per-query "
    "lookup table, then only the ADC top-100 shortlist per query is "
    "re-ranked against full-precision vectors. Driver-checkable form: "
    "rows are the exact brute-force top-5 plus recall_ok = PQ+refine "
    "recovered >= 40% (measured 0.76 at sf0.01 / 0.64 at sf0.1 on "
    "RANDOM embeddings — the no-structure worst case for "
    "quantization; flat ADC without refine measures 0.24/0.12, the "
    "refine stage is what makes PQ usable on unclustered data).",
    tags=("datapipe", "ann", "pq"),
)
def ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall2021_flink_dw_spark.datapipe.ann import pq_refine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", as_double("embedding").alias("emb"))
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), as_double("embedding").alias("q_emb")
    )
    exact = brute_force_topk(base, queries, k=5)
    approx = pq_refine_topk(base, queries, shortlist=100, k=5)
    return _recall_checked(
        exact,
        approx,
        ("q_id", "vec_id"),
        ["q_id", "vec_id", "rank", "sim"],
        "recall_ok",
        0.40,
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH d AS (SELECT doc_id, text, octet_length(text::BLOB) AS n
               FROM documents),
    f AS (
      SELECT doc_id, text, n,
             unnest(range(0, greatest(n, 1), 1000)) AS ts
      FROM d
    )
    SELECT doc_id,
           cast(ts // 1000 as int) AS frame_idx,
           ts AS frame_ts_ms,
           md5(substr(text,
                      cast(CASE WHEN n > 64 THEN ts % greatest(n - 64, 1)
                                ELSE 0 END + 1 as int),
                      64)) AS frame_hash,
           cast(least(64, n - CASE WHEN n > 64 THEN ts % greatest(n - 64, 1)
                                   ELSE 0 END) as int) AS frame_len
    FROM f
    """,
    doc="Multimodal frame sampling: 1->N mapInPandas stage cutting one "
    "'frame' (deterministic stub slice; a real ffmpeg sampler drops "
    "into the same signature) per second of pretend-duration from each "
    "binary payload. Exercises the explode-shaped Arrow batch path a "
    "video pipeline needs; oracle replays the slice arithmetic in SQL.",
    tags=("datapipe", "multimodal", "udf"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall2021_flink_dw_spark.datapipe.multimodal import sample_frames

    ensure_workers_can_import(spark)
    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(attach_payload(docs))


@register(
    "sample_hash_bucket",
    oracle="""
    SELECT doc_id,
           (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100)
             AS bucket
    FROM documents
    WHERE (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100) < 5
    """,
    doc="Deterministic hash-mod sampling: bucket = md5(key) first 8 hex "
    "chars mod 100, keep bucket < rate. THE reproducible way to sample "
    "at 100 TB — no RNG state, stable under re-runs/retries/partition "
    "reshuffles, and composable (bucket ranges partition the corpus "
    "into disjoint deterministic folds). Pure codegen expressions; the "
    "filter prunes before any downstream shuffle.",
    tags=("datapipe", "sampling"),
)
def sample_hash_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )
    return docs.select("doc_id", bucket.alias("bucket")).filter(
        F.col("bucket") < 5
    )


_WEIGHTED_K = 200


@register(
    "sample_weighted",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, len({TOKENS_SQL}) AS weight FROM documents
      WHERE len({TOKENS_SQL}) > 0
    ),
    k AS (
      SELECT doc_id, weight,
             round(
               ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                   + 1) / 4294967296.0) / weight,
               6) AS key6
      FROM t
    )
    SELECT doc_id, weight::BIGINT AS weight, key6
    FROM k ORDER BY key6 DESC, doc_id LIMIT {_WEIGHTED_K}
    """,
    doc="WEIGHTED sampling without replacement via exponential keys "
    "(Efraimidis & Spirakis 2006, the A-Res scheme): each doc draws a "
    "deterministic uniform u from md5(doc_id) (the sample_hash_bucket "
    "recipe — no RNG state, stable under retries and repartitioning) "
    "and competes with key u^(1/w), implemented in its monotone log "
    "form ln(u)/w; the top-k keys ARE a weighted-without-replacement "
    "sample, here weighted by token count (longer docs "
    "proportionally likelier — the token-budget-aware subcorpus "
    "draw). 100 TB shape: one scan, keys in codegen, and the top-k is "
    "TakeOrderedAndProject (per-partition top-200 + driver merge) — "
    "ZERO shuffles. Float contract: u = (v+1)/2^32 is exact in "
    "double (power-of-two divide of a 32-bit integer), ln is the "
    "one libm call (same IEEE input both engines), and selection "
    "orders on round(key, 6) with doc_id tiebreak — the "
    "text_perplexity/ccnet emission-grid contract (residual risk: a "
    "sub-ulp ln difference crossing the 1e-6 grid).",
    tags=("datapipe", "sampling", "topn"),
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    w = F.size("__tokens")
    v = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    key6 = F.round(
        F.log((v + 1).cast("double") / F.lit(4294967296.0))
        / F.col("weight"),
        6,
    )
    return (
        docs.filter(w > 0)
        .select("doc_id", w.cast("bigint").alias("weight"))
        .withColumn("key6", key6)
        .orderBy(F.desc("key6"), F.asc("doc_id"))
        .limit(_WEIGHTED_K)
    )


_REDACT_PAT = r"\b\w+ing\b"


@register(
    "text_redact",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{_REDACT_PAT}')) AS n_redactions,
           md5(regexp_replace(text, '{_REDACT_PAT}', '[MASK]', 'g'))
             AS redacted_fp
    FROM documents
    """,
    doc="Pattern redaction (the PII-masking machinery: the pattern is a "
    "parameter — swap in email/phone/SSN regexes for a real corpus; the "
    "synthetic corpus is lowercase words, so the demo pattern masks "
    "'-ing' words). regexp_replace replaces ALL matches JVM-side; the "
    "redaction count comes from regexp_extract_all. Output carries the "
    "md5 of the redacted text, not the text — the oracle row stays "
    "small and the full rewrite is still value-checked.",
    tags=("datapipe", "text", "redact"),
)
def text_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_REDACT_PAT), F.lit(0)))
        .cast("bigint")
        .alias("n_redactions"),
        F.md5(F.regexp_replace("text", _REDACT_PAT, "[MASK]")).alias(
            "redacted_fp"
        ),
    )


@register(
    "corpus_clean",
    oracle=f"""
    WITH t AS (SELECT doc_id, text, {TOKENS_SQL} AS w FROM documents),
    q AS (
      SELECT doc_id, text, w FROM t
      WHERE len(w) >= 10
        AND len(list_distinct(w))::double / len(w) >= 0.3
        AND list_max(list_transform(list_distinct(w),
              d -> len(list_filter(w, x -> x = d))))::double / len(w) <= 0.2
    ), d AS (
      SELECT doc_id, w,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM q
    )
    SELECT doc_id, {duck_predict_lang("w")} AS predicted_lang,
           len(w) AS n_tokens
    FROM d WHERE rn = 1
    """,
    doc="Flagship corpus-cleaning composition — the end-to-end shape of "
    "a training-data prep job: quality gate (>=10 tokens, TTR>=0.3, "
    "max-repetition<=0.2) -> exact dedup among survivors (min-doc_id "
    "per content fingerprint) -> language tag. One scan, one shuffle "
    "(the dedup window); the quality gate prunes rows BEFORE the "
    "shuffle, which is the ordering that matters at 100 TB.",
    tags=("datapipe", "text", "dedup", "quality"),
)
def corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    t = F.col("__tokens")

    def quality_gate(tt: Column) -> Column:
        n = F.size(tt)
        return (
            (n >= 10)
            & (F.size(F.array_distinct(tt)).cast("double") / n >= 0.3)
            & (max_token_repetition(tt).cast("double") / n <= 0.2)
        )

    # let-binds the gate so the predicate pushed into the scan carries
    # ONE tokenizer evaluation; measured 5.2 -> 4.2 s at 10x
    # (r12-ext2). The outputs stay AFTER the dedup window — the
    # narrow-rows-before-the-window variant (fp/lang/n_tokens computed
    # pre-exchange) measured 12.9 s, 2.5x WORSE: fusing predict_lang's
    # interpreted transform into the scan/filter stage defeats the
    # stage's codegen CSE, which costs far more than shuffling the
    # token arrays saves at this row width (measured negative,
    # BASELINE r12-ext2).
    quality = docs.filter(let(t, quality_gate))
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    return (
        quality.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "doc_id",
            predict_lang(t).alias("predicted_lang"),
            F.size(t).cast("bigint").alias("n_tokens"),
        )
    )


@register(
    "sample_stratified",
    oracle="""
    SELECT doc_id, lang, rk FROM (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(doc_id::VARCHAR), doc_id) AS rk
      FROM documents
    ) WHERE rk <= 20
    """,
    doc="Stratified deterministic sampling: fixed-size sample per "
    "stratum (lang) by ranking on a content-independent hash — the "
    "grouped form of hash-bucket sampling. No RNG state, stable under "
    "re-runs, one shuffle on the stratum key; at 100 TB the same plan "
    "with rank pushed into a windowed top-k per partition (Spark "
    "evaluates row_number streaming per group, no full sort "
    "materialization).",
    tags=("datapipe", "sampling", "window-function"),
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
        .select("doc_id", "lang", "rk")
    )


@register(
    "vocab_top_tokens",
    oracle=f"""
    SELECT token, n_docs, n_total FROM (
      SELECT token,
             count(DISTINCT doc_id) AS n_docs,
             count(*) AS n_total,
             row_number() OVER (ORDER BY count(*) DESC, token) AS rk
      FROM (SELECT doc_id, unnest({TOKENS_SQL}) AS token FROM documents)
      GROUP BY token
    ) WHERE rk <= 50
    """,
    doc="Corpus vocabulary statistics: explode tokens, per-token "
    "document frequency (exact distinct) + total occurrences, top-50 by "
    "frequency — the vocab-building / BPE-corpus-stats shape. Two-phase "
    "distinct via pre-aggregation on (token, doc_id) keeps the Expand "
    "out of the fact shuffle; the final top-N is TakeOrderedAndProject "
    "(no global sort).",
    tags=("datapipe", "text", "agg", "topn"),
)
def vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall2021_flink_dw_spark.datapipe.text import doc_token_counts

    # per-doc tf in one Arrow pass (doc_token_counts — no explode rows,
    # no (token, doc) shuffle; the tfidf_top_terms r12-ext2 rewiring),
    # then one vocabulary-sized roll-up
    pre = doc_token_counts(load_table(spark, sf_dir, "documents"))
    counts = pre.groupBy("token").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("tf").alias("n_total")
    )
    return (
        counts.orderBy(F.col("n_total").desc(), "token")
        .limit(50)
        .select("token", "n_docs", "n_total")
    )


# pairs -> symmetric edges -> recursive transitive closure (shared by
# the cluster-shaped oracles)
_CC_CTES = f"""{_SHINGLE_CTES},
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
      HAVING count(*)::double /
             (any_value(a.n_grams) + any_value(b.n_grams) - count(*)) >= 0.5
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e2.dst FROM reach r JOIN edges e2 ON r.dst = e2.src
    ),
    cc AS (
      SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
      FROM reach GROUP BY src
    )"""

_CLUSTERS_ORACLE = f"""
    WITH RECURSIVE {_CC_CTES}
    SELECT doc_id, cluster_id, cluster_id = doc_id AS is_survivor FROM cc
"""


@register(
    "dedup_clusters",
    oracle=_CLUSTERS_ORACLE,
    doc="Near-dup CLUSTERS from near-dup pairs: min-label connected "
    "components (neighbor-min propagation + pointer jumping, "
    "datapipe/dedup.py::connected_components) over the df-capped "
    "n-gram-Jaccard pair graph; survivor = min doc_id per component. "
    "The standard dedup-pipeline step after pair generation — keep one "
    "doc per cluster, not one per pair. The DuckDB oracle computes the "
    "true transitive closure (recursive CTE), so parity proves the "
    "fixed-round propagation reached the fixpoint.",
    tags=("datapipe", "dedup", "graph"),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall2021_flink_dw_spark.datapipe.dedup import connected_components

    pairs = ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"),
        n=5,
        threshold=0.5,
        max_df_frac=0.01,
        df_floor=5,
    )
    cc = connected_components(pairs.select("doc_a", "doc_b"))
    return cc.select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_survivor"),
    )


_CONTAMINATION_ORACLE = f"""
    WITH {_SHINGLE_CTES},
    bench AS (
      SELECT DISTINCT shingle FROM e0 WHERE doc_id < 20
    )
    SELECT e0.doc_id,
           any_value(e0.n_grams) AS n_grams,
           count(bench.shingle) AS hits,
           round(count(bench.shingle)::double / any_value(e0.n_grams), 6)
             AS contamination,
           count(bench.shingle)::double / any_value(e0.n_grams) >= 0.2
             AS flagged
    FROM e0 LEFT JOIN bench USING (shingle)
    WHERE e0.doc_id >= 20
    GROUP BY e0.doc_id
"""


@register(
    "corpus_contamination",
    oracle=_CONTAMINATION_ORACLE,
    doc="Benchmark-contamination check — the pre-training hygiene pass "
    "that keeps eval data out of the corpus: the held-out set (doc_id "
    "< 20 stands in for an eval suite) is reduced to its distinct "
    "5-gram shingles and BROADCAST (eval suites are tiny by nature); "
    "every training doc reports the fraction of its shingles that "
    "appear in the benchmark set, flagged at >= 20%. One corpus scan, "
    "no shuffle of the corpus — the join is broadcast-left against the "
    "benchmark index.",
    tags=("datapipe", "text", "dedup"),
)
def corpus_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall2021_flink_dw_spark.datapipe.dedup import doc_shingles

    sh = doc_shingles(load_table(spark, sf_dir, "documents"), n=5)
    bench = (
        sh.filter(F.col("doc_id") < 20)
        .select("shingle")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    rest = sh.filter(F.col("doc_id") >= 20)
    scored = (
        rest.join(F.broadcast(bench), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.first("n_grams").alias("n_grams"),
            F.count("__hit").alias("hits"),
        )
    )
    frac = F.col("hits").cast("double") / F.col("n_grams")
    return scored.select(
        "doc_id",
        F.col("n_grams").cast("bigint").alias("n_grams"),
        "hits",
        F.round(frac, 6).alias("contamination"),
        (frac >= 0.2).alias("flagged"),
    )


_TFIDF_ORACLE = f"""
    WITH t AS (
      SELECT doc_id, unnest(w) AS token
      FROM (SELECT doc_id, {TOKENS_SQL} AS w FROM documents)
    ), tf AS (
      SELECT doc_id, token, count(*) AS tf FROM t GROUP BY 1, 2
    ), dfreq AS (
      SELECT token, count(*) AS df FROM tf GROUP BY 1
    ), n AS (
      SELECT count(DISTINCT doc_id) AS n FROM tf
    )
    SELECT doc_id, token, rk, round(score, 6) AS score
    FROM (
      SELECT tf.doc_id, tf.token,
             tf.tf * ((n.n + 1.0) / (dfreq.df + 1.0)) AS score,
             row_number() OVER (
               PARTITION BY tf.doc_id
               ORDER BY tf.tf * ((n.n + 1.0) / (dfreq.df + 1.0)) DESC,
                        tf.token) AS rk
      FROM tf JOIN dfreq USING (token) CROSS JOIN n
    ) WHERE rk <= 3
"""


@register(
    "tfidf_top_terms",
    oracle=_TFIDF_ORACLE,
    doc="Top-3 characteristic terms per document by tf x rational "
    "inverse-doc-frequency ((n+1)/(df+1) — a log-free idf: IEEE "
    "add/divide/multiply are correctly rounded, so Spark and DuckDB "
    "produce bit-identical doubles, where ln() would drift in the last "
    "ulp). Shape: per-doc term counts (one shuffle), token df by "
    "re-aggregating the tf table (second phase on the same rows, no "
    "Expand), corpus size as a broadcast 1-row aggregate, windowed "
    "top-3 per doc.",
    tags=("datapipe", "text", "agg", "window-function"),
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from gmall2021_flink_dw_spark.datapipe.text import doc_token_counts

    docs = load_table(spark, sf_dir, "documents")
    # tf built in ONE Arrow pass (doc_token_counts: findall + factorize
    # + packed-key unique per batch — no explode rows, no (doc, token)
    # shuffle; 3.49 -> 1.65 s at 10x, r12-ext2). It feeds three
    # consumers (join probe side, df re-aggregate, corpus count) —
    # persist, or the kernel runs three times; at 100 TB this
    # intermediate is a checkpointed table.
    tf = tracked_persist(doc_token_counts(docs))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = tf.agg(F.count_distinct("doc_id").alias("n"))
    score = F.col("tf") * (
        (F.col("n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("token"))
    return (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .withColumn("score", score)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "token", "rk", F.round("score", 6).alias("score"))
    )


@register(
    "pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, len({TOKENS_SQL}) AS n_tokens FROM documents
    ), c AS (
      SELECT doc_id, source, n_tokens,
             sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM t WHERE n_tokens > 0
    )
    SELECT source, cast((cum - n_tokens) // 4096 as bigint) AS seq_id,
           count(*) AS n_docs,
           cast(sum(n_tokens) as bigint) AS seq_tokens,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM c GROUP BY 1, 2
    """,
    doc="Token-budget sequence packing — the pre-training batching step "
    "that concatenates documents into ~4096-token training sequences: "
    "per source (the shard key), docs in deterministic doc_id order get "
    "a running token count; a doc's sequence is the 4096-token bin its "
    "START offset falls in. One window pass per shard, one shuffle on "
    "the shard key; the per-sequence stats (doc count, token count, doc "
    "range) are what a sequence-writer job would emit.",
    tags=("datapipe", "text", "window-function"),
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    t = docs.select(
        "doc_id", "source", F.size("__tokens").cast("bigint").alias("n_tokens")
    ).filter(F.col("n_tokens") > 0)
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = t.withColumn("cum", F.sum("n_tokens").over(w))
    seq = F.floor(
        (F.col("cum") - F.col("n_tokens")) / F.lit(4096)
    ).cast("bigint")
    return (
        c.withColumn("seq_id", seq)
        .groupBy("source", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("seq_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


_SURVIVORS_ORACLE = f"""
    WITH RECURSIVE {_CC_CTES},
    q AS (
      SELECT doc_id, len(list_distinct(w))::double / len(w) AS ttr
      FROM (SELECT doc_id, {TOKENS_SQL} AS w FROM documents)
      WHERE len(w) > 0
    )
    SELECT cluster_id, doc_id AS survivor_doc, n_members,
           round(ttr, 6) AS ttr
    FROM (
      SELECT cc.cluster_id, cc.doc_id, q.ttr,
             count(*) OVER (PARTITION BY cc.cluster_id) AS n_members,
             row_number() OVER (PARTITION BY cc.cluster_id
                                ORDER BY q.ttr DESC, cc.doc_id) AS rk
      FROM cc JOIN q USING (doc_id)
    ) WHERE rk = 1
"""


@register(
    "dedup_survivors_by_quality",
    oracle=_SURVIVORS_ORACLE,
    doc="Quality-aware survivor selection — the policy layer on top of "
    "dedup_clusters: instead of keeping the min-id doc per near-dup "
    "cluster, keep the HIGHEST-QUALITY member (type-token ratio, "
    "doc_id tiebreak). Composition of the pair graph, connected "
    "components, and the quality metrics; ordering compares raw IEEE "
    "doubles (exact-rounded division, bit-identical across engines), "
    "rounding applied only to the displayed score.",
    tags=("datapipe", "dedup", "graph", "quality"),
)
def dedup_survivors_by_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from gmall2021_flink_dw_spark.datapipe.dedup import connected_components

    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    pairs = ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"),
        n=5,
        threshold=0.5,
        max_df_frac=0.01,
        df_floor=5,
    )
    cc = connected_components(pairs.select("doc_a", "doc_b"))
    t = F.col("__tokens")
    q = docs.filter(F.size(t) > 0).select(
        "doc_id",
        (F.size(F.array_distinct(t)).cast("double") / F.size(t)).alias("ttr"),
    )
    joined = cc.join(q, "doc_id")
    wc = Window.partitionBy("cluster_id")
    wr = Window.partitionBy("cluster_id").orderBy(
        F.desc("ttr"), F.asc("doc_id")
    )
    return (
        joined.withColumn("n_members", F.count(F.lit(1)).over(wc))
        .withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("survivor_doc"),
            "n_members",
            F.round("ttr", 6).alias("ttr"),
        )
    )


@register(
    "dedup_embedding_lsh",
    oracle=f"""
    SELECT vec_a, vec_b, sim, TRUE AS recall_ok, TRUE AS precision_ok
    FROM ({_EMB_DEDUP_ORACLE})
    """,
    doc="Embedding near-dup pairs, the 100 TB path (the exact GEMM "
    "variant dedup_embedding_cosine is its ground truth): multi-probe "
    "sign-bucket LSH bounds the candidate space, one numpy GEMM per "
    "bucket scores it (datapipe/ann.py::bucketed_cosine_pairs). "
    "Quadratic only within a bucket; bucket id = partition key at "
    "scale. Driver-checkable form: rows are the exact all-pairs result "
    "(oracle-reproducible) plus recall_ok = LSH recovered >= 40% of "
    "them (measured 0.57 at sf0.01 on RANDOM embeddings — near-"
    "threshold pairs on isotropic data are the LSH worst case) and "
    "precision_ok = every LSH pair is a true pair (exact by "
    "construction: candidates are verified with exact cosine; pinned "
    "as a zero-spurious count).",
    tags=("datapipe", "dedup", "ann", "lsh"),
)
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall2021_flink_dw_spark.datapipe.ann import (
        blocked_cosine_pairs,
        bucketed_cosine_pairs,
    )

    ensure_workers_can_import(spark)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("emb")
    )
    exact = blocked_cosine_pairs(emb, threshold=0.45, n_blocks=8).select(
        "vec_a", "vec_b", F.round("sim", 6).alias("sim")
    )
    lsh = bucketed_cosine_pairs(emb, threshold=0.45, bits=6).select(
        "vec_a", "vec_b"
    )
    hit = lsh.dropDuplicates(["vec_a", "vec_b"]).withColumn("_hit", F.lit(1))
    joined = exact.join(hit, ["vec_a", "vec_b"], "left")
    stats = joined.agg(
        (F.count("_hit").cast("double") / F.count(F.lit(1))).alias("_recall")
    )
    spurious = lsh.join(
        exact.select("vec_a", "vec_b"), ["vec_a", "vec_b"], "left_anti"
    ).agg(F.count(F.lit(1)).alias("_spurious"))
    return (
        joined.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(spurious))
        .select(
            "vec_a",
            "vec_b",
            "sim",
            (F.col("_recall") >= 0.40).alias("recall_ok"),
            (F.col("_spurious") == 0).alias("precision_ok"),
        )
    )


@register(
    "dedup_semantic",
    oracle=f"""
    SELECT vec_a, vec_b, sim, TRUE AS recall_ok
    FROM ({_EMB_DEDUP_ORACLE})
    """,
    doc="SemDeDup semantic near-dup pairs (Abbas et al. 2023, "
    "arXiv:2303.09540): k-means cluster the embeddings (the same "
    "corpus-size-independent bounded-sample fit as ann_ivf), score "
    "pairs only within a cluster via one GEMM per cluster — pairwise "
    "work n^2 -> sum(cluster^2) with the cluster id as the shuffle key "
    "at 100 TB. Soft assignment (each vector joins its 2 closest "
    "lists) recovers near-boundary pairs. Differs from "
    "dedup_embedding_lsh in candidate bounding: LSH signs are data-"
    "independent; centroids adapt to the corpus, the property that "
    "makes SemDeDup effective on real clustered embeddings. Driver-"
    "checkable form: rows are the exact all-pairs result (oracle-"
    "reproducible) plus recall_ok = the clustered path recovered >= "
    "40% of them (measured AT THREE SCALES on RANDOM embeddings — no "
    "cluster structure, the SemDeDup worst case: 0.71 at sf0.01, 0.54 "
    "at sf0.1, 0.58 at 10x/20k vectors — the apparent erosion "
    "FLATTENS, the 0.40 bound holds with margin; ADVICE r06 "
    "measurement in BASELINE.md. k stays pinned at 16 here because on "
    "this worst case scaling k with the corpus COLLAPSES recall "
    "(k=160 at 10x: 0.19) — scale the n_clusters knob only on real "
    "clustered embeddings, where per-cluster density survives the "
    "split; precision is exact by construction, candidates are scored "
    "with true cosine). Tighter per-config recall in "
    "tests/test_datapipe.py.",
    tags=("datapipe", "dedup", "ann", "kmeans"),
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall2021_flink_dw_spark.datapipe.ann import (
        blocked_cosine_pairs,
        clustered_cosine_pairs,
    )

    ensure_workers_can_import(spark)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("emb")
    )
    exact = blocked_cosine_pairs(emb, threshold=0.45, n_blocks=8).select(
        "vec_a", "vec_b", F.round("sim", 6).alias("sim")
    )
    approx = clustered_cosine_pairs(
        emb, threshold=0.45, n_clusters=16, n_assign=2
    )
    return _recall_checked(
        exact,
        approx,
        ("vec_a", "vec_b"),
        ["vec_a", "vec_b", "sim"],
        "recall_ok",
        0.40,
    )


@register(
    "multimodal_embed",
    oracle="""
    WITH h AS (SELECT doc_id, md5(text) AS ch FROM documents),
    e AS (
      SELECT doc_id, ch,
             list_transform(range(1, 17),
                            i -> ascii(substr(ch, i, 1)) / 255.0) AS emb
      FROM h
    )
    SELECT doc_id, 16 AS dim,
           round(sqrt(list_sum(list_transform(emb, x -> x*x))), 6) AS emb_norm,
           round(list_sum(emb), 6) AS emb_sum,
           round(emb[1], 6) AS emb_head,
           ch AS content_hash
    FROM e
    """,
    doc="Multimodal feature extraction: binary payload -> embedding "
    "vector through a real Arrow mapInPandas stage "
    "(datapipe/multimodal.py::extract_embeddings) — the batch-iteration "
    "contract a production vision/audio encoder drops into (encoder "
    "itself stubbed: libs absent by design; the stub derives the vector "
    "from the content hash, which is exactly what makes the stage "
    "oracle-checkable). Emits scalar projections (norm/sum/head) so the "
    "cross-engine hash compare is array-formatting-free; the vector "
    "feeds the ANN/dedup family in a real pipeline.",
    tags=("datapipe", "multimodal", "udf", "ann"),
)
def multimodal_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall2021_flink_dw_spark.datapipe.multimodal import (
        extract_embeddings,
    )

    ensure_workers_can_import(spark)
    docs = load_table(spark, sf_dir, "documents")
    return extract_embeddings(attach_payload(docs))


@register(
    "multimodal_resize",
    oracle="""
    WITH d AS (
      SELECT doc_id, text,
             (octet_length(text::BLOB) % 640) + 1 AS w,
             (octet_length(text::BLOB) % 480) + 1 AS h
      FROM documents
    ), s AS (
      SELECT doc_id, text, w, h,
             least(1.0, 256.0 / greatest(w, h)) AS sc
      FROM d
    )
    SELECT doc_id, w AS width, h AS height,
           greatest(1, floor(w * sc))::INT AS out_w,
           greatest(1, floor(h * sc))::INT AS out_h,
           round(sc, 6) AS scale,
           md5(text || (greatest(1, floor(w * sc))::INT::VARCHAR || 'x' ||
                        greatest(1, floor(h * sc))::INT::VARCHAR))
             AS resized_hash
    FROM s
    """,
    doc="Multimodal resize stage (decode -> RESIZE -> encode, the "
    "standard image-preprocessing step): aspect-preserving downscale to "
    "a 256 max side, never upscaling, through the Arrow mapInPandas "
    "contract a PIL/opencv resize drops into (pixel work stubbed — "
    "codec libs absent by design; dims/scale/fingerprint math is real "
    "and oracle-reproduced exactly, including the floor-truncation of "
    "output dims).",
    tags=("datapipe", "multimodal", "udf"),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall2021_flink_dw_spark.datapipe.multimodal import resize_images

    ensure_workers_can_import(spark)
    docs = load_table(spark, sf_dir, "documents")
    return resize_images(attach_payload(docs))


# GPT-2-style pretokenizer, RE2-compatible (no lookahead — DuckDB's RE2
# rejects it; the dropped `\s+(?!\S)` branch only matters for runs of
# trailing whitespace, which md5-stable synthetic text doesn't produce):
# contraction suffixes, space-merged alnum runs, space-merged punct
# runs, whitespace. The " ?" prefixes are the BPE-ish part — a token
# carries its leading space, as real BPE vocabularies do.
_BPE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[a-z0-9]+| ?[^\sa-z0-9]+|\s+"


@register(
    "text_token_counts",
    oracle=f"""
    SELECT doc_id,
           length(text) AS n_chars,
           len(regexp_split_to_array(trim(text), '\\s+')) AS ws_tokens,
           len(regexp_extract_all(lower(text),
               '{_BPE_RE.replace("'", "''")}')) AS bpe_tokens,
           round(length(text)::double /
                 len(regexp_extract_all(lower(text),
                     '{_BPE_RE.replace("'", "''")}')), 6) AS chars_per_token
    FROM documents WHERE length(trim(text)) > 0
    """,
    doc="Token counting both ways a data pipeline needs it: whitespace "
    "tokens (the classic heuristic) and a BPE-ish pretokenizer count "
    "(GPT-2-style pattern: contraction suffixes + space-merged runs — "
    "the pre-merge unit count that tracks real tokenizer load far "
    "better than whitespace). Pure codegen regexp on the JVM, one scan, "
    "no shuffle; chars-per-token is the budgeting signal for sequence "
    "packing.",
    tags=("datapipe", "text"),
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    bpe_ct = F.size(
        F.regexp_extract_all(F.lower("text"), F.lit(_BPE_RE), 0)
    )
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("ws_tokens"),
        bpe_ct.alias("bpe_tokens"),
        F.round(F.length("text").cast("double") / bpe_ct, 6).alias(
            "chars_per_token"
        ),
    )


# Target mixture for training-mix sampling, per-mille keep rates per
# source language: the knob a data-mix recipe turns (e.g. downsample
# dominant English, keep all Chinese). Deterministic hash gate — no RNG.
_MIX_RATES = {"en": 400, "de": 800, "es": 600, "fr": 700, "zh": 1000}

_MIX_RATE_SQL = "CASE lang " + " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in _MIX_RATES.items()
) + " ELSE 0 END"


@register(
    "sample_training_mix",
    oracle=f"""
    WITH g AS (
      SELECT doc_id, lang,
             (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 1000)
               AS gate
      FROM documents
    )
    SELECT doc_id, lang, gate FROM g
    WHERE gate < ({_MIX_RATE_SQL})
    """,
    doc="Weighted training-mix sampling: per-source keep rates (per "
    "mille) applied through the deterministic hash gate — the standard "
    "way a data-mix recipe reshapes source proportions (downsample the "
    "dominant language, keep the scarce one whole) at 100 TB: no RNG "
    "state, identical keep-set under re-runs/retries/partition moves, "
    "and rates compose with the hash-bucket folds (same gate space). "
    "Pure codegen; the filter prunes before any downstream shuffle.",
    tags=("datapipe", "sampling"),
)
def sample_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    gate = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 1000
    )
    rate = F.lit(0)
    for k, v in _MIX_RATES.items():
        rate = F.when(F.col("lang") == k, F.lit(v)).otherwise(rate)
    return docs.select("doc_id", "lang", gate.alias("gate")).filter(
        F.col("gate") < rate
    )


@register(
    "corpus_summary",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, md5(text) AS fp, {TOKENS_SQL} AS w
      FROM documents
    ), per_doc AS (
      SELECT lang, fp, len(w) AS n_tok,
             CASE WHEN len(w) >= 10
                   AND len(list_distinct(w))::double / len(w) >= 0.3
                   AND list_max(list_transform(list_distinct(w),
                         d -> len(list_filter(w, x -> x = d))))::double
                       / len(w) <= 0.2
                  THEN 1 ELSE 0 END AS ok
      FROM t WHERE len(w) > 0
    )
    SELECT lang,
           count(*) AS n_docs,
           count(DISTINCT fp) AS uniq_docs,
           sum(n_tok)::BIGINT AS total_tokens,
           sum(ok)::BIGINT AS quality_pass_ct,
           round(sum(n_tok)::double / count(*), 6) AS mean_tokens_per_doc
    FROM per_doc GROUP BY lang
    """,
    doc="Corpus summary report — the closing query of every data-prep "
    "pipeline: per source language, document count, exact-dedup "
    "cardinality (distinct content fingerprints, two-phase so no "
    "Expand), token volume, quality-gate pass count, tokens/doc. All "
    "aggregates integer-derived with a single double division at the "
    "edge, so the result is bit-deterministic across engines and "
    "partitionings (a double SUM would depend on re-association "
    "order).",
    tags=("datapipe", "text", "report"),
)
def corpus_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    t = F.col("__tokens")
    n_tok = F.size(t)
    uniq = F.size(F.array_distinct(t))
    max_rep = max_token_repetition(t)
    ok = (
        (n_tok >= 10)
        & (uniq.cast("double") / n_tok >= 0.3)
        & (max_rep.cast("double") / n_tok <= 0.2)
    ).cast("int")
    per_doc = docs.filter(n_tok > 0).select(
        "lang",
        F.md5("text").alias("fp"),
        n_tok.alias("n_tok"),
        ok.alias("ok"),
    )
    # two-phase distinct on (lang, fp): no Expand mixing COUNT(DISTINCT)
    # with the plain sums
    pre = (
        per_doc.repartition(F.col("lang"))
        .groupBy("lang", "fp")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum("n_tok").alias("_tok"),
            F.sum("ok").alias("_ok"),
        )
    )
    agg = pre.groupBy("lang").agg(
        F.sum("_n").alias("n_docs"),
        F.count(F.lit(1)).alias("uniq_docs"),
        F.sum("_tok").alias("total_tokens"),
        F.sum("_ok").alias("quality_pass_ct"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "uniq_docs",
        "total_tokens",
        "quality_pass_ct",
        F.round(
            F.col("total_tokens").cast("double") / F.col("n_docs"), 6
        ).alias("mean_tokens_per_doc"),
    )


_QUALITY_GATE_SQL = """
      len(w) >= 10
        AND len(list_distinct(w))::double / len(w) >= 0.3
        AND list_max(list_transform(list_distinct(w),
              d -> len(list_filter(w, x -> x = d))))::double / len(w) <= 0.2
"""


@register(
    "corpus_train_pipeline",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, lang, text, {TOKENS_SQL} AS w FROM documents
    ), q AS (
      SELECT doc_id, source, lang, text, w FROM t
      WHERE {_QUALITY_GATE_SQL}
    ), d AS (
      SELECT doc_id, source, lang, len(w) AS n_tokens,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM q
    ), m AS (
      SELECT doc_id, source, n_tokens FROM d
      WHERE rn = 1
        AND (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 1000)
            < ({_MIX_RATE_SQL})
    ), c AS (
      SELECT source, n_tokens,
             sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM m
    ), g AS (
      SELECT source, cast((cum - n_tokens) // 4096 AS BIGINT) AS seq_id,
             count(*) AS _n, sum(n_tokens) AS _tok
      FROM c GROUP BY 1, 2
    )
    SELECT source,
           sum(_n)::BIGINT AS n_docs,
           count(*)::BIGINT AS n_seqs,
           sum(_tok)::BIGINT AS total_tokens,
           round(sum(_tok)::double / sum(_n), 6) AS mean_tokens_per_doc,
           round(sum(_tok)::double / count(*), 6) AS mean_tokens_per_seq
    FROM g GROUP BY source
    """,
    doc="End-to-end composed training-data pipeline in ONE DAG — the "
    "stages a real data-prep run chains (quality gate -> exact dedup -> "
    "weighted mix sampling -> 4096-token sequence packing -> per-source "
    "report) composed over a SINGLE scan of documents, no intermediate "
    "materialization. The reference's analogue is the ODS->DWD->DWM->DWS "
    "chain (VisitorStatsApp.java:27-28) which re-reads Kafka between "
    "layers; Catalyst instead fuses the gate + gate-filter into the scan "
    "stage and pipelines the two windows back-to-back. Shuffle budget "
    "at 100 TB: fingerprint window (near-unique keys, no skew), source "
    "window (shard key), then two bounded aggregations — every stage "
    "prunes rows BEFORE the next shuffle, the ordering that matters. "
    "Plan-audited: exactly one parquet scan of documents "
    "(tests/test_plan_audit.py).",
    tags=("datapipe", "text", "dedup", "sampling", "pipeline"),
)
def corpus_train_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    t = F.col("__tokens")
    n_tok = F.size(t)
    uniq = F.size(F.array_distinct(t))
    max_rep = max_token_repetition(t)
    # stage 1 — quality gate (same predicate as corpus_clean)
    quality = docs.filter(
        (n_tok >= 10)
        & (uniq.cast("double") / n_tok >= 0.3)
        & (max_rep.cast("double") / n_tok <= 0.2)
    )
    # stage 2 — exact dedup among survivors (min doc_id per fingerprint)
    w_fp = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (
        quality.select(
            "doc_id",
            "source",
            "lang",
            n_tok.cast("bigint").alias("n_tokens"),
            F.row_number().over(w_fp).alias("__rn"),
        )
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    # stage 3 — weighted mix gate (same per-mille hash gate as
    # sample_training_mix; deterministic, composes with fold buckets)
    gate = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 1000
    )
    rate = F.lit(0)
    for k, v in _MIX_RATES.items():
        rate = F.when(F.col("lang") == k, F.lit(v)).otherwise(rate)
    mixed = deduped.filter(gate < rate)
    # stage 4 — sequence packing (same binning as pack_sequences)
    w_src = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    packed = mixed.withColumn("cum", F.sum("n_tokens").over(w_src)).select(
        "source",
        "n_tokens",
        F.floor((F.col("cum") - F.col("n_tokens")) / F.lit(4096))
        .cast("bigint")
        .alias("seq_id"),
    )
    # stage 5 — report (two-phase so the distinct-seq count needs no
    # Expand: pre-aggregate on the sequence grain, then roll up)
    pre = packed.groupBy("source", "seq_id").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("n_tokens").alias("_tok"),
    )
    return pre.groupBy("source").agg(
        F.sum("_n").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_seqs"),
        F.sum("_tok").cast("bigint").alias("total_tokens"),
        F.round(
            F.sum("_tok").cast("double") / F.sum("_n").cast("double"), 6
        ).alias("mean_tokens_per_doc"),
        F.round(
            F.sum("_tok").cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("mean_tokens_per_seq"),
    )


# Target mixture SHARES for the rate allocator (sum to 1000 permille):
# unlike _MIX_RATES (hand-set keep rates), these are the recipe's
# *desired output proportions*; the allocator derives the keep rates
# from the measured corpus.
_MIX_TARGET_PM = {"en": 300, "de": 150, "es": 150, "fr": 150, "zh": 250}

_MIX_TARGET_SQL = "CASE lang " + " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in _MIX_TARGET_PM.items()
) + " ELSE 0 END"


@register(
    "sample_mix_allocator",
    oracle=f"""
    WITH per_lang AS (
      SELECT lang, sum(len({TOKENS_SQL}))::BIGINT AS lang_tokens
      FROM documents GROUP BY lang
    ), tot AS (
      SELECT sum(lang_tokens)::BIGINT AS total_tokens FROM per_lang
    )
    SELECT lang, lang_tokens,
           cast((total_tokens // 2) * ({_MIX_TARGET_SQL}) // 1000
                AS BIGINT) AS budget_tokens,
           cast(least(1000, ((total_tokens // 2) * ({_MIX_TARGET_SQL})
                             // 1000) * 1000 // nullif(lang_tokens, 0))
                AS BIGINT) AS rate_pm,
           cast(lang_tokens * least(1000, ((total_tokens // 2)
                 * ({_MIX_TARGET_SQL}) // 1000) * 1000 // nullif(lang_tokens, 0))
                 // 1000 AS BIGINT) AS expected_tokens
    FROM per_lang, tot
    """,
    doc="Training-mix rate ALLOCATOR — the step upstream of "
    "sample_training_mix: given target output proportions "
    "(permille shares) and a global token budget (half the corpus), "
    "derive each language's per-mille keep rate FROM the measured "
    "corpus: rate = min(1000, budget*share/lang_tokens). A language "
    "whose pool is smaller than its target allocation caps at 1000 "
    "(keep everything; expected < budget exposes the deficit the "
    "recipe must redistribute). All-integer arithmetic end to end, so "
    "the result is bit-identical across engines and partitionings. One "
    "shuffle (per-lang aggregation); the budget scalar is a 1-row "
    "broadcast over the 5-row per-lang table. The derived rates feed "
    "the same md5 per-mille gate sample_training_mix applies, so the "
    "pair composes into measure -> solve -> gate without ever "
    "collecting to the driver.",
    tags=("datapipe", "sampling", "report"),
)
def sample_mix_allocator(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    per_lang = docs.groupBy("lang").agg(
        F.sum(F.size("__tokens")).cast("bigint").alias("lang_tokens")
    )
    tot = per_lang.agg(
        F.sum("lang_tokens").cast("bigint").alias("total_tokens")
    )
    share = F.lit(0)
    for k, v in _MIX_TARGET_PM.items():
        share = F.when(F.col("lang") == k, F.lit(v)).otherwise(share)
    # integer floor-division semantics matched to DuckDB's `//`
    j = per_lang.crossJoin(F.broadcast(tot))
    budget_col = F.floor(F.floor(F.col("total_tokens") / 2) * share / 1000)
    # nullif guard: a language whose every doc tokenizes empty has a
    # zero pool; both engines' least() ignores the NULL division result,
    # so the rate caps at 1000 (keep all of nothing, expected = 0)
    # instead of raising ANSI division-by-zero.
    rate = F.least(
        F.lit(1000),
        F.floor(
            budget_col * 1000 / F.nullif(F.col("lang_tokens"), F.lit(0))
        ),
    )
    return j.select(
        "lang",
        "lang_tokens",
        budget_col.cast("bigint").alias("budget_tokens"),
        rate.cast("bigint").alias("rate_pm"),
        F.floor(F.col("lang_tokens") * rate / 1000)
        .cast("bigint")
        .alias("expected_tokens"),
    )


_CHUNK = 5  # tokens per boilerplate chunk (matches the dedup shingle n)


@register(
    "text_boilerplate",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {TOKENS_SQL} AS w FROM documents
      WHERE len({TOKENS_SQL}) >= {_CHUNK}
    ), chunks AS (
      SELECT doc_id,
             md5(array_to_string(
               w[i*{_CHUNK}+1 : i*{_CHUNK}+{_CHUNK}], ' ')) AS h
      FROM t, unnest(range(cast(len(w) // {_CHUNK} AS BIGINT))) AS u(i)
    ), freq AS (
      SELECT h, count(DISTINCT doc_id) AS n_docs FROM chunks GROUP BY h
    )
    SELECT c.doc_id,
           count(*) AS n_chunks,
           sum(CASE WHEN f.n_docs >= 2 THEN 1 ELSE 0 END)::BIGINT
             AS n_shared,
           round(sum(CASE WHEN f.n_docs >= 2 THEN 1 ELSE 0 END)::double
                 / count(*), 6) AS boilerplate_ratio
    FROM chunks c JOIN freq f USING (h)
    GROUP BY c.doc_id
    """,
    doc="Boilerplate / template detection: non-overlapping 5-token "
    "chunks hashed and counted across the corpus; a chunk appearing in "
    ">= 2 distinct documents is shared text (navigation, license "
    "headers, templated paragraphs — the stuff a training corpus "
    "should not repeat). Per document: chunk count, shared-chunk "
    "count, boilerplate ratio. The web-scale recipe (CCNet/RefinedWeb "
    "style line-dedup) at 100 TB: chunk table shuffles once on the "
    "hash for the frequency count, the join back is co-partitioned on "
    "the same key, then one shuffle to the doc grain — no pairwise "
    "comparison anywhere, cost linear in corpus chunks. Two-phase "
    "distinct (chunk, doc) pre-aggregation would be needed if chunks "
    "repeated heavily WITHIN a doc; with 5-token chunks intra-doc "
    "repeats are rare, so count(DISTINCT doc_id) stays on the chunk "
    "grain where it is exact.",
    tags=("datapipe", "text", "dedup", "quality"),
)
def text_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    return boilerplate_stats(docs)


def boilerplate_stats(docs: DataFrame) -> DataFrame:
    """Per-doc boilerplate stats over any tokenized corpus (a `__tokens`
    column, e.g. from with_tokens) — the registered query binds it to
    the documents table; tests drive it with synthetic hot corpora
    (a chunk present in EVERY doc is the worst-case skew key)."""
    t = docs.filter(F.size("__tokens") >= _CHUNK).select("doc_id", "__tokens")
    n_chunks = F.floor(F.size("__tokens") / _CHUNK).cast("int")
    # Hashed chunk identity (the r12 novelty/repetition pattern): the
    # chunk hash never leaves the query — freq-count and join need only
    # WITHIN-ENGINE identity — so xxhash64 over the 5-token slice (array
    # hashing is length-delimited per element) replaces the alloc-bound
    # md5(array_join(...)) string build. 64-bit collisions over corpus
    # chunk counts are birthday-negligible and would only perturb a
    # ratio, not dedup selection.
    chunk_at = lambda i: F.xxhash64(  # noqa: E731
        F.slice("__tokens", i * _CHUNK + 1, _CHUNK)
    )
    # persisted + pre-partitioned on the join key: chunks has TWO
    # consumers (the freq build and the join back), so without the
    # persist the tokenize+hash+explode runs twice; repartition("h")
    # makes the (h, doc_id) pre-agg, the h roll-up AND both join sides
    # exchange-free (HashPartitioning(h) satisfies every clustering
    # requirement downstream until the final doc_id grain). Measured
    # 5.49 -> 0.90 s solo at 10x (BASELINE r12).
    chunks = tracked_persist(
        t.select(
            "doc_id",
            F.explode(
                F.transform(F.sequence(F.lit(0), n_chunks - 1), chunk_at)
            ).alias("h"),
        ).repartition("h")
    )
    # count(DISTINCT doc_id) per hash via two-phase pre-agg: the
    # (h, doc_id) grain is exact and avoids Expand
    freq = (
        chunks.groupBy("h", "doc_id")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    joined = chunks.join(freq, "h")
    shared = (F.col("n_docs") >= 2).cast("int")
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(shared).cast("bigint").alias("n_shared"),
        F.round(
            F.sum(shared).cast("double") / F.count(F.lit(1)), 6
        ).alias("boilerplate_ratio"),
    )


@register(
    "sample_curriculum_rank",
    oracle=f"""
    WITH q AS (
      SELECT doc_id, len(w) AS n_tokens,
             round(len(list_distinct(w))::double / len(w), 6) AS ttr
      FROM (SELECT doc_id, {TOKENS_SQL} AS w FROM documents)
      WHERE len(w) > 0
    )
    SELECT doc_id, n_tokens, ttr,
           row_number() OVER (ORDER BY ttr DESC, doc_id) AS rank
    FROM q
    """,
    doc="Global curriculum ranking WITHOUT the single-partition window "
    "trap: every doc gets its exact global rank by quality (TTR desc, "
    "doc_id tiebreak) — the ordering a curriculum-learning data loader "
    "consumes. The naive row_number() OVER (ORDER BY ...) with no "
    "PARTITION BY collapses the whole corpus into ONE task at 100 TB; "
    "here the scale-correct decomposition: repartitionByRange on the "
    "sort key (range exchange, order preserved across ascending "
    "partition ids), per-partition row_number (local sort only), plus "
    "a broadcast of per-partition counts cumsum'd into offsets — "
    "rank = partition offset + local rank. The offsets table is one "
    "row per partition (KBs), so the only data-sized costs are the "
    "range exchange and the local sorts; result is identical to the "
    "naive form (the oracle IS the naive form) and independent of the "
    "sampled range boundaries.",
    tags=("datapipe", "sampling", "window-function", "sort"),
)
def sample_curriculum_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    t = F.col("__tokens")
    q = docs.filter(F.size(t) > 0).select(
        "doc_id",
        F.size(t).cast("bigint").alias("n_tokens"),
        F.round(
            F.size(F.array_distinct(t)).cast("double") / F.size(t), 6
        ).alias("ttr"),
    )
    # persisted for the same reason as shard_balance: two branches
    # (offsets, local rank) read the ranged frame; without the persist
    # the scan + tokenizer + range exchange all run twice
    ranged = tracked_persist(
        q.repartitionByRange(
            32, F.desc("ttr"), F.asc("doc_id")
        ).withColumn("pid", F.spark_partition_id())
    )
    # per-partition counts -> exclusive prefix-sum offsets (32 rows: the
    # cumsum window runs on a single tiny partition, then broadcasts)
    counts = ranged.groupBy("pid").agg(F.count(F.lit(1)).alias("_n"))
    w_off = (
        Window.orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "pid",
        F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off"),
    )
    w_local = Window.partitionBy("pid").orderBy(
        F.desc("ttr"), F.asc("doc_id")
    )
    return (
        ranged.withColumn("_rn", F.row_number().over(w_local))
        .join(F.broadcast(offsets), "pid")
        .select(
            "doc_id",
            "n_tokens",
            "ttr",
            (F.col("_off") + F.col("_rn")).cast("bigint").alias("rank"),
        )
    )


_NGRAM = 3  # Gopher-style duplicate-n-gram rule size


@register(
    "text_repetition",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {TOKENS_SQL} AS w FROM documents
      WHERE len({TOKENS_SQL}) >= {_NGRAM}
    ), grams AS (
      SELECT doc_id,
             array_to_string(w[i+1 : i+{_NGRAM}], ' ') AS g
      FROM t, unnest(range(cast(len(w) - {_NGRAM} + 1 AS BIGINT))) AS u(i)
    ), per_gram AS (
      SELECT doc_id, g, count(*) AS c FROM grams GROUP BY doc_id, g
    )
    SELECT doc_id,
           sum(c)::BIGINT AS n_ngrams,
           sum(CASE WHEN c >= 2 THEN c ELSE 0 END)::BIGINT AS n_dup,
           round(sum(CASE WHEN c >= 2 THEN c ELSE 0 END)::double
                 / sum(c), 6) AS dup_ratio,
           (sum(CASE WHEN c >= 2 THEN c ELSE 0 END)::double
                 / sum(c)) <= 0.2 AS passes
    FROM per_gram GROUP BY doc_id
    """,
    doc="Gopher/RefinedWeb-style intra-document repetition rule: the "
    "fraction of sliding 3-gram occurrences whose 3-gram repeats "
    "within the SAME document (loops, stutter, boilerplate padding — "
    "the classic LM-collapse inputs), pass gate <= 0.2 (Gopher's "
    "duplicate-n-gram family, Rae et al. 2021 table A1 — the exact "
    "thresholds there are per-n; 0.2 is this corpus's documented "
    "parameter). 100 TB shape: explode n-grams (linear, no shuffle), "
    "pre-aggregate on (doc_id, gram) — the skew-proof grain: a hot "
    "gram spreads over its docs — then one reduce to the doc grain. "
    "No pairwise work, no window over the corpus; cost is two "
    "shuffles both keyed by doc_id-prefixed keys. Pure-integer ratio "
    "divided once in double so both engines round identically.",
    tags=("datapipe", "text", "quality"),
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    t = F.col("__tokens")
    # int64 n-gram identities (r12): the counts only need gram IDENTITY
    # (per-doc occurrence counting), so hash the _NGRAM tokens directly
    # with multi-arg xxhash64 instead of building an array_join string
    # per position — the dedup family's alloc-trap fix (see
    # text.py::shingle_hashes; same collision contract, here per-doc).
    grams = (
        docs.filter(F.size(t) >= _NGRAM)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(t) - _NGRAM + 1),
                    lambda i: F.xxhash64(
                        *[F.element_at(t, i + j) for j in range(_NGRAM)]
                    ),
                )
            ).alias("g"),
        )
    )
    per_gram = grams.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    dup_c = F.when(F.col("c") >= 2, F.col("c")).otherwise(F.lit(0))
    agg = per_gram.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_ngrams"),
        F.sum(dup_c).cast("bigint").alias("n_dup"),
    )
    ratio = F.col("n_dup").cast("double") / F.col("n_ngrams")
    return agg.select(
        "doc_id",
        "n_ngrams",
        "n_dup",
        F.round(ratio, 6).alias("dup_ratio"),
        (ratio <= 0.2).alias("passes"),
    )


# temp trees from prior streaming_dedup_ingest invocations, reclaimed on
# the next invocation (results consumed between calls, same contract as
# plans/cdc_routing.py) and at exit
_DEDUP_STREAM_DIRS: list[str] = []


@register(
    "streaming_dedup_ingest",
    oracle="""
    SELECT md5(text) AS fp,
           min(doc_id) AS survivor_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
    doc="Streaming corpus ingest with ONLINE exact dedup — the shape a "
    "continuously-fed training-data pipeline needs (documents arrive "
    "as a stream; the dedup decision cannot wait for a batch horizon): "
    "the corpus replays as a real file stream in 4 micro-batches; each "
    "trigger writes an O(batch) delta of per-fingerprint (min doc_id, "
    "count) — the same log-structured merge-on-read pattern as "
    "streaming_cdc_upsert, so per-trigger cost scales with the batch, "
    "never the accumulated corpus — and read-time compaction merges "
    "deltas by fingerprint (min of mins, sum of counts; both merges "
    "are associative+commutative, so the result is order- and "
    "batching-invariant: the oracle recomputes it from the batch "
    "table). At 100 TB the delta log is the object-store layout "
    "(Hudi/Delta-style) and compaction is one shuffle on the "
    "fingerprint.",
    tags=("datapipe", "streaming", "dedup", "stateful"),
)
def streaming_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import os
    import shutil
    import tempfile
    import uuid as _uuid

    for stale in list(_DEDUP_STREAM_DIRS):
        shutil.rmtree(stale, ignore_errors=True)
        _DEDUP_STREAM_DIRS.remove(stale)
    from gmall2021_flink_dw_spark.scratch import stream_scratch_base

    base = tempfile.mkdtemp(
        prefix=f"dedup_stream_{_uuid.uuid4().hex[:8]}_",
        dir=stream_scratch_base(),
    )
    _DEDUP_STREAM_DIRS.append(base)
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    topic_dir = os.path.join(base, "topic")
    delta_base = os.path.join(base, "delta")
    ckpt = os.path.join(base, "ckpt")

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs.repartition(4).write.mode("overwrite").parquet(topic_dir)

    def _flush_delta(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.select(F.md5("text").alias("fp"), "doc_id")
            .groupBy("fp")
            .agg(
                F.min("doc_id").alias("survivor_id"),
                F.count(F.lit(1)).alias("n_copies"),
            )
            .write.mode("overwrite")
            .parquet(os.path.join(delta_base, f"v{epoch_id}"))
        )

    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(topic_dir)
        .writeStream.foreachBatch(_flush_delta)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(topic_dir, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    return (
        spark.read.parquet(os.path.join(delta_base, "v*"))
        .groupBy("fp")
        .agg(
            F.min("survivor_id").alias("survivor_id"),
            F.sum("n_copies").cast("bigint").alias("n_copies"),
        )
    )


@register(
    "corpus_length_histogram",
    oracle="""
    SELECT source,
           least(n_chars // 256, 19) AS bucket,
           least(n_chars // 256, 19) * 256 AS lo_chars,
           count(*) AS n_docs,
           sum(n_chars)::BIGINT AS total_chars
    FROM documents
    GROUP BY 1, 2, 3
    """,
    doc="Per-source document-length histogram: fixed-width 256-char "
    "bins with a top catch-all bucket (the width_bucket shape kept to "
    "integer div so both engines bin identically) — the distribution "
    "report every corpus intake runs before choosing packing lengths "
    "and truncation cutoffs. One partial-aggregated shuffle on "
    "(source, bucket); at 100 TB the same plan over the day-partitioned "
    "corpus is a per-partition scan + 20-ish rows per source.",
    tags=("datapipe", "text", "agg"),
)
def corpus_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.least(F.floor(F.col("n_chars") / 256), F.lit(19)).cast("bigint")
    return (
        docs.select("source", bucket.alias("bucket"), "n_chars")
        .groupBy("source", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .select(
            "source",
            "bucket",
            (F.col("bucket") * 256).alias("lo_chars"),
            "n_docs",
            "total_chars",
        )
    )


@register(
    "corpus_ngram_novelty",
    oracle=f"""
    WITH t AS (SELECT source, {TOKENS_SQL} AS w FROM documents),
    sg AS (
      SELECT DISTINCT source, unnest({duck_shingles(3)}) AS shingle
      FROM t WHERE len(w) >= 3
    ),
    spread AS (
      SELECT shingle, count(*) AS n_sources FROM sg GROUP BY shingle
    )
    SELECT sg.source,
           count(*) AS n_grams,
           sum(CASE WHEN spread.n_sources = 1 THEN 1 ELSE 0 END)::BIGINT
             AS n_unique,
           sum(CASE WHEN spread.n_sources = 1 THEN 1 ELSE 0 END)::DOUBLE
             / count(*) AS uniqueness
    FROM sg JOIN spread USING (shingle)
    GROUP BY 1
    """,
    doc="Per-source n-gram novelty — the corpus-diversity report of a "
    "training-data mix: for each source, the fraction of its distinct "
    "word-3-grams found in NO other source. Shape: distinct "
    "(source, shingle) pairs (one shuffle), shingle spread by "
    "re-aggregating that table (the two-phase pattern — no second pass "
    "over text), join back on the shingle, per-source integer counts "
    "with one exact double divide at the edge (bit-deterministic). At "
    "100 TB the distinct pair table is the materialized inverted index "
    "the dedup family already builds — this report is a reuse of it.",
    tags=("datapipe", "text", "agg", "join"),
)
def corpus_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall2021_flink_dw_spark.datapipe.text import shingle_hashes

    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    t = F.col("__tokens")
    # int64 shingle identities (r12): this report only counts and joins
    # shingles, never prints them, so the dedup family's hashed form
    # applies — no 3-gram string is ever built (the string explode +
    # distinct was this query's dominant cost at 10x; see
    # text.py::shingle_hashes for the numbers and collision contract).
    # The distinct lands on the (source, shingle) shuffle the plan
    # needs anyway; repartitioning on shingle here would misalign it.
    sg = tracked_persist(
        docs.filter(F.size(t) >= 3)
        .select("source", F.explode(shingle_hashes(t, 3)).alias("shingle"))
        .dropDuplicates(["source", "shingle"])
    )
    spread = sg.groupBy("shingle").agg(F.count(F.lit(1)).alias("n_sources"))
    novel = F.sum(
        F.when(F.col("n_sources") == 1, F.lit(1)).otherwise(F.lit(0))
    )
    return (
        sg.join(spread, "shingle")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            novel.cast("bigint").alias("n_unique"),
            (novel.cast("double") / F.count(F.lit(1))).alias("uniqueness"),
        )
    )


@register(
    "corpus_filter_pipeline",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source, md5(text) AS fp, {TOKENS_SQL} AS w
      FROM documents
    ),
    qc AS (
      SELECT doc_id, source, fp, w FROM tok
      WHERE len(w) > 0
        AND (2 * list_sum(list_transform(w, t ->
               ('0x' || substr(md5(t), 1, 8))::BIGINT % 2001 - 1000))
             + 1000 * len(list_filter(w, t -> t IN ({_QC_STOP_SQL})))) > 0
    ),
    bg AS (
      SELECT doc_id, unnest({DUCK_BIGRAMS_SQL}) AS p
      FROM qc WHERE len(w) >= 2
    ),
    dtf AS (
      SELECT doc_id, p.w1 AS w1, p.w2 AS w2, count(*) AS k
      FROM bg GROUP BY 1, 2, 3
    ),
    bc AS (SELECT w1, w2, sum(k)::BIGINT AS cb FROM dtf GROUP BY 1, 2),
    uc AS (SELECT w1, sum(cb)::BIGINT AS cu FROM bc GROUP BY 1),
    voc AS (
      SELECT count(DISTINCT t) AS v
      FROM (SELECT unnest(w) AS t FROM qc)
    ),
    lp AS (
      SELECT d.doc_id,
             sum(d.k * ln((bc.cb + 1)::DOUBLE / (uc.cu + voc.v)))
               / sum(d.k) AS lp
      FROM dtf d
      JOIN bc USING (w1, w2) JOIN uc USING (w1) CROSS JOIN voc
      GROUP BY 1
    ),
    mu AS (SELECT avg(lp) AS mu FROM lp),
    fluent AS (
      SELECT qc.doc_id, qc.source, qc.fp
      FROM qc JOIN lp USING (doc_id), mu
      WHERE lp.lp >= mu.mu - 1e-9
    ),
    uniq AS (
      SELECT min(doc_id) AS doc_id, arg_min(source, doc_id) AS source
      FROM fluent GROUP BY fp
    )
    SELECT t.source,
           count(*) AS n_input,
           (SELECT count(*) FROM qc q WHERE q.source = t.source)
             AS n_quality,
           (SELECT count(*) FROM fluent f WHERE f.source = t.source)
             AS n_fluent,
           (SELECT count(*) FROM uniq u WHERE u.source = t.source)
             AS n_unique
    FROM tok t GROUP BY 1
    """,
    doc="The published-filter funnel as ONE DAG (the CCNet/RefinedWeb "
    "curation order): hash-trick quality gate -> bigram-LM fluency "
    "gate (model self-trained on the quality-passing subset — the "
    "CCNet trick: the LM sees only text that already passed the cheap "
    "gate) -> exact dedup (min-doc_id survivor per content "
    "fingerprint) -> per-source funnel report "
    "(input/quality/fluent/unique counts). One documents scan feeds "
    "every stage (tokens + fingerprint projected and persisted once); "
    "each stage prunes rows before the next shuffle, so the bigram "
    "model is fitted over the smallest surviving set — and since r11 "
    "the fluency stage rides the dictionary-encoding Arrow kernel "
    "(datapipe/bigram_lm.py): distinct-bounded fit partials, broadcast "
    "model, shuffle-free per-doc scoring, replacing the three "
    "corpus-scale exchanges of the inline explode+join form. All "
    "counts integer-exact; the single float gate (LM mean) is "
    "epsilon-guarded (lp >= mu - 1e-9 in both engines, VERDICT r06 "
    "item 3) so structural lp==mu ties from duplicate docs cannot "
    "flip across engines — see text_perplexity's hardening analysis. "
    "The dedup-last "
    "order is deliberate: near-identical docs score identically under "
    "both gates, so deduping first would save nothing and cost an "
    "extra pass over un-gated text.",
    tags=("datapipe", "text", "quality", "dedup", "pipeline"),
)
def corpus_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tracked_persist(
        with_tokens(load_table(spark, sf_dir, "documents")).select(
            "doc_id",
            "source",
            F.md5("text").alias("fp"),
            "__tokens",
        )
    )
    t = F.col("__tokens")
    n_tok = F.size(t)
    w_int = lambda x: (  # noqa: E731 — same weights as quality_classifier
        F.conv(F.substring(F.md5(x), 1, 8), 16, 10).cast("bigint") % 2001
        - 1000
    )
    num = F.lit(2) * F.aggregate(
        F.transform(t, w_int), F.lit(0).cast("long"), lambda a, x: a + x
    ) + F.lit(1000) * marker_hits(t, STOPWORDS)
    qc = tracked_persist(docs.filter((n_tok > 0) & (num > 0)))

    # Fluency stage on the dictionary-encoding bigram-LM kernel
    # (datapipe/bigram_lm.py, the r11 replan both text_perplexity and
    # sample_ccnet_buckets ride): fit emits per-batch DISTINCT
    # (w1, w2, k) partials over the persisted quality-passing subset
    # (one vocabulary-sized shuffle, no corpus shuffle — the CCNet
    # trick of training only on cheap-gate survivors is preserved),
    # the model broadcasts, and scoring emits one (doc_id, lp) row per
    # doc with >= 1 bigram, shuffle-free. Replaces the r07-r10 inline
    # explode + model-join + regroup (three corpus-scale exchanges).
    from gmall2021_flink_dw_spark.datapipe.bigram_lm import (
        bigram_lm_scores,
        fit_bigram_model,
    )

    ensure_workers_can_import(spark)
    model = fit_bigram_model(qc.select("__tokens"))
    bcast = spark.sparkContext.broadcast(model)
    # persisted: TWO consumers (the mu aggregate and the fluent join)
    # each evaluate their own DAG branch, so without the persist the
    # Arrow scoring kernel re-runs over the full quality-passing corpus
    # (ADVICE r11; same lesson as vocab_coverage's 8.6 -> 4.1 s persist)
    lp = tracked_persist(
        bigram_lm_scores(qc.select("doc_id", "__tokens"), bcast).select(
            "doc_id", "lp"
        )
    )
    mu = lp.agg(F.avg("lp").alias("mu"))
    # One flagged pass over qc (r15, VERDICT r14 item 6): n_quality and
    # n_fluent come from the SAME scan — previously each was its own
    # groupBy over a separate (persisted) frame, so the funnel tail ran
    # four per-source aggregations + three joins. The fluent frame is
    # now consumed ONLY by the dedup stage, so its persist (a full
    # corpus-sized cache write) is gone too. The epsilon-guarded gate
    # is unchanged (r06 item 3); counts stay integer-exact.
    # persisted (replacing the old fluent persist): TWO consumers — the
    # per-source stats and the dedup stage — would otherwise re-run the
    # qc-lp join per branch
    flagged = tracked_persist(
        qc.select("doc_id", "source", "fp")
        .join(lp, "doc_id", "left")
        .crossJoin(F.broadcast(mu))
        .select(
            "doc_id",
            "source",
            "fp",
            (
                F.col("lp").isNotNull()
                & (F.col("lp") >= F.col("mu") - F.lit(1e-9))
            ).alias("__fluent"),
        )
    )
    q_stats = flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_quality"),
        F.sum(F.when(F.col("__fluent"), 1).otherwise(0)).alias("n_fluent"),
    )
    fluent = flagged.filter("__fluent").select("doc_id", "source", "fp")
    # survivor source = the MIN-doc_id survivor's source (min_by), never
    # first(): a fingerprint spanning sources would otherwise attribute
    # nondeterministically per run/layout
    uniq = fluent.groupBy("fp").agg(
        F.min("doc_id").alias("doc_id"),
        F.min_by("source", "doc_id").alias("source"),
    )
    return (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_input"))
        .join(q_stats, "source", "left")
        .join(
            uniq.groupBy("source").agg(F.count(F.lit(1)).alias("n_unique")),
            "source",
            "left",
        )
        .select(
            "source",
            "n_input",
            F.coalesce("n_quality", F.lit(0)).alias("n_quality"),
            F.coalesce("n_fluent", F.lit(0)).alias("n_fluent"),
            F.coalesce("n_unique", F.lit(0)).alias("n_unique"),
        )
    )


_PARA = 12  # tokens per "paragraph" (see dedup_paragraphs doc)


@register(
    "dedup_paragraphs",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {TOKENS_SQL} AS w FROM documents
      WHERE len({TOKENS_SQL}) >= {_PARA}
    ), paras AS (
      SELECT doc_id, i AS idx,
             array_to_string(w[i*{_PARA}+1 : i*{_PARA}+{_PARA}], ' ') AS para
      FROM t, unnest(range(cast(len(w) // {_PARA} AS BIGINT))) AS u(i)
    ), flagged AS (
      SELECT doc_id, idx, para,
             row_number() OVER (PARTITION BY md5(para)
                                ORDER BY doc_id, idx) AS rn
      FROM paras
    )
    SELECT doc_id,
           count(*) AS n_paras,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           coalesce(string_agg(CASE WHEN rn = 1 THEN para END, ' '
                               ORDER BY idx), '') AS new_text
    FROM flagged GROUP BY doc_id
    """,
    doc="PARAGRAPH-level dedup with per-doc reassembly (VERDICT r05 "
    "item 6): the published pipelines (CCNet, RefinedWeb) dedup at "
    "paragraph/line granularity BEFORE document granularity. The "
    "synthetic corpus has no newline structure, so the paragraph grain "
    "here is a fixed 12-token window; the trailing <12-token remainder "
    "of each doc is DISCARDED from n_paras/new_text, and docs under 12 "
    "tokens drop entirely (ADVICE r06 #3 — the output contract is "
    "whole windows only; both engines agree). The operator is "
    "delimiter-agnostic — swap the chunker for split(text, '\\n\\n') "
    "on a real corpus and the remainder case disappears with it. "
    "First occurrence wins, globally "
    "and deterministically: row_number over the paragraph hash ordered "
    "by (doc_id, idx); every doc is then reassembled from its "
    "surviving paragraphs in original order (collect_list of "
    "(idx, para) structs, array_sort, join — null-dropping collect "
    "does the filtering). ONE documents scan; exactly two shuffles, "
    "both unavoidable at any scale: by paragraph hash (the dedup "
    "grain), then by doc_id (the reassembly grain). No pairwise work "
    "anywhere — cost is linear in corpus paragraphs, the same plan "
    "CCNet runs at web scale.",
    tags=("datapipe", "dedup", "text"),
)
def dedup_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    t = docs.filter(F.size("__tokens") >= _PARA).select("doc_id", "__tokens")
    n = F.floor(F.size("__tokens") / _PARA).cast("int")
    para_at = lambda i: F.array_join(  # noqa: E731
        F.slice("__tokens", i * _PARA + 1, _PARA), " "
    )
    paras = t.select(
        "doc_id",
        F.posexplode(
            F.transform(F.sequence(F.lit(0), n - 1), para_at)
        ).alias("idx", "para"),
    )
    w = Window.partitionBy(F.md5("para")).orderBy("doc_id", "idx")
    flagged = paras.withColumn("rn", F.row_number().over(w))
    kept = F.when(F.col("rn") == 1, F.struct("idx", "para"))
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_paras"),
        F.sum((F.col("rn") == 1).cast("int")).cast("bigint").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept)), lambda x: x["para"]
            ),
            " ",
        ).alias("new_text"),
    )


@register(
    "dedup_substring_clean_keepfirst",
    oracle="""
    WITH g AS (
      SELECT doc_id, u.i AS pos, substr(text, u.i + 1, 50) AS gram
      FROM documents
      CROSS JOIN LATERAL unnest(range(0, greatest(len(text) - 49, 0)))
           AS u(i)
      WHERE len(text) >= 50
    ), r AS (
      SELECT doc_id, pos,
             row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos)
               AS rn,
             count(*) OVER (PARTITION BY gram) AS c
      FROM g
    ), hits AS (
      SELECT doc_id, pos FROM r WHERE c > 1 AND rn > 1
    ), brk AS (
      SELECT doc_id, pos,
             CASE WHEN pos > coalesce(max(pos + 50) OVER (
                  PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS is_start
      FROM hits
    ), grp AS (
      SELECT doc_id, pos,
             sum(is_start) OVER (PARTITION BY doc_id ORDER BY pos)
               AS span_id
      FROM brk
    ), spans AS (
      SELECT doc_id, span_id, min(pos) AS s, max(pos) + 50 AS e
      FROM grp GROUP BY doc_id, span_id
    ), seg AS (
      SELECT doc_id, s, e,
             coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0)
               AS seg_start
      FROM spans
    ), per_doc AS (
      SELECT seg.doc_id,
             string_agg(substr(text, seg_start + 1, s - seg_start), ''
                        ORDER BY s) AS head,
             max(e) AS max_e,
             CAST(sum(e - s) AS BIGINT) AS removed_chars
      FROM seg JOIN documents USING (doc_id)
      GROUP BY seg.doc_id
    )
    SELECT documents.doc_id,
           CASE WHEN head IS NULL THEN text
                ELSE coalesce(head, '') || substr(text, max_e + 1)
           END AS clean_text,
           coalesce(removed_chars, 0)::BIGINT AS removed_chars
    FROM documents LEFT JOIN per_doc USING (doc_id)
    """,
    doc="Lee et al.'s ACTUAL ExactSubstr contract (vs the remove-all "
    "scrub form of dedup_substring_clean): the globally FIRST "
    "occurrence of each duplicated 50-gram — min (doc_id, pos), a "
    "total order, so the election is layout-independent — survives; "
    "spans built from the non-first hits are cut. A corpus of "
    "identical docs keeps one readable copy instead of emptying all. "
    "datapipe/dedup.py:remove_duplicate_spans_keepfirst.",
    tags=("datapipe", "dedup", "window"),
)
def dedup_substring_clean_keepfirst(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall2021_flink_dw_spark.datapipe.dedup import (
        remove_duplicate_spans_keepfirst,
    )

    docs = load_table(spark, sf_dir, "documents")
    return remove_duplicate_spans_keepfirst(docs, min_len=50)


_SCRATCH_DIRS: list[str] = []


def _scratch_dir(prefix: str) -> str:
    """mkdtemp reclaimed at the NEXT _scratch_dir call (plus an atexit
    hook for the last one). atexit alone (the ADVICE r09 fix) is not
    enough at scale: a two-pass 100x suite accumulates every round-trip
    query's corpus-sized scratch tree until process exit and filled the
    disk mid-pass-2 (measured r12-ext — 'No space left on device' in
    the first full-suite 100x attempt). Same consume-before-next
    contract as _CDC_STREAM_DIRS: the returned DataFrame reads its
    scratch lazily, and bench/driver/tests consume each result before
    invoking the next scratch-writing query."""
    import atexit
    import shutil
    import tempfile
    import uuid

    for stale in list(_SCRATCH_DIRS):
        shutil.rmtree(stale, ignore_errors=True)
        _SCRATCH_DIRS.remove(stale)
    base = tempfile.mkdtemp(prefix=f"{prefix}_{uuid.uuid4().hex[:8]}_")
    _SCRATCH_DIRS.append(base)
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    return base



# -------------------------------------------- source-format lane (r09)


@register(
    "source_jsonl_events",
    oracle="""
    SELECT event_type,
           count(*)::BIGINT AS n_events,
           count(DISTINCT user_id)::BIGINT AS n_users,
           CAST(min(epoch_us(ts)) AS BIGINT) AS ts_min_us,
           CAST(max(epoch_us(ts)) AS BIGINT) AS ts_max_us,
           CAST(sum(event_id) AS BIGINT) AS id_sum
    FROM events GROUP BY event_type
    """,
    doc="Source-format breadth: the events table round-trips through "
    "JSON LINES — written with the timestamp pre-flattened to integer "
    "micros (JSON has no timestamp type; strings are a cross-engine "
    "formatting trap, integers are exact), read back with an EXPLICIT "
    "schema in FAILFAST mode (a corrupt line must error, not silently "
    "null out — the P1 dirty-split lane is where tolerated dirt goes), "
    "then aggregated. The oracle recomputes straight from the parquet, "
    "so any loss or mangling in the text round trip is a hash "
    "mismatch. 100 TB shape: JSONL is the interchange format of every "
    "scraped-corpus drop; the read is splittable by line and schema-"
    "pinned (no sampling pass — inference over 100 TB is a full extra "
    "scan).",
    tags=("source", "format", "roundtrip"),
)
def source_jsonl_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    base = _scratch_dir("jsonl_src")
    out = os.path.join(base, "events_jsonl")
    events = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("ts_us"),
    )
    events.write.mode("overwrite").json(out)
    schema = (
        "event_id long, user_id long, event_type string, ts_us long"
    )
    back = (
        spark.read.schema(schema)
        .option("mode", "FAILFAST")
        .json(out)
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("ts_us").alias("ts_min_us"),
        F.max("ts_us").alias("ts_max_us"),
        F.sum("event_id").alias("id_sum"),
    )


@register(
    "source_orc_events",
    oracle="""
    SELECT event_type,
           count(*)::BIGINT AS n_events,
           CAST(min(epoch_us(ts)) AS BIGINT) AS ts_min_us,
           CAST(max(epoch_us(ts)) AS BIGINT) AS ts_max_us,
           cast(sum(cast(value as decimal(18,2))) as double) AS sum_value,
           CAST(sum(event_id) AS BIGINT) AS id_sum
    FROM events WHERE event_type <> 'view' GROUP BY event_type
    """,
    doc="Source-format breadth: the events table round-trips through "
    "ORC — the OTHER columnar format a lakehouse migration actually "
    "encounters (Hive-era warehouses are ORC; the reference's "
    "ClickHouse/Hive surround makes it the likely interchange). Unlike "
    "the JSONL lane this keeps the TYPED columns — timestamp survives "
    "as a native ORC timestamp (session TZ pinned UTC in session.py, "
    "so micros are exact on both engines) and value as a double — and "
    "the read-back applies a predicate BEFORE the aggregate, so ORC "
    "row-group predicate pushdown is on the exercised path (ORC "
    "carries min/max strides per stripe; at 100 TB the filter prunes "
    "stripes at the reader, same as parquet row groups). Oracle "
    "recomputes straight from parquet, so any type mangling in the "
    "round trip is a hash mismatch.",
    tags=("source", "format", "roundtrip"),
)
def source_orc_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    base = _scratch_dir("orc_src")
    out = os.path.join(base, "events_orc")
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    events.write.mode("overwrite").orc(out)
    back = spark.read.orc(out).where(F.col("event_type") != "view")
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.unix_micros(F.min("ts")).alias("ts_min_us"),
        F.unix_micros(F.max("ts")).alias("ts_max_us"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_value"),
        F.sum("event_id").alias("id_sum"),
    )


@register(
    "source_csv_docs",
    oracle="""
    WITH hard AS (
      SELECT doc_id, source,
             source || ',"' || chr(10) || text || '";' AS hard_text
      FROM documents
    )
    SELECT source,
           count(*)::BIGINT AS n_docs,
           CAST(sum(length(hard_text)) AS BIGINT) AS sum_len,
           min(md5(hard_text)) AS md5_min,
           max(md5(hard_text)) AS md5_max
    FROM hard GROUP BY source
    """,
    doc="Source-format breadth: CSV round-trip under ADVERSARIAL "
    "content. The corpus text is clean ASCII, so a naive CSV "
    "round-trip would prove nothing — instead each row first derives "
    "hard_text containing every RFC-4180 trap at once (delimiter "
    "comma, double-quote, embedded newline), deterministically on both "
    "engines. Spark writes it with quote-doubling (escape='\"', the "
    "RFC form, not the backslash default) and reads it back "
    "schema-pinned with multiLine=true; per-source md5 min/max pin "
    "byte-exact content fidelity, not just counts. The oracle derives "
    "the same hard_text straight from parquet — a mangled quote or a "
    "split record is a hash mismatch. 100 TB note: multiLine CSV is "
    "NOT line-splittable (a record may span lines), so this lane is "
    "for ingest of modest dirty drops; columnar formats are the "
    "at-scale path, which is why the ORC/JSONL lanes exist.",
    tags=("source", "format", "roundtrip"),
)
def source_csv_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    base = _scratch_dir("csv_src")
    out = os.path.join(base, "docs_csv")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.concat(
            F.col("source"),
            F.lit(',"\n'),
            F.col("text"),
            F.lit('";'),
        ).alias("hard_text"),
    )
    (
        docs.write.mode("overwrite")
        .option("header", "true")
        .option("escape", '"')
        .csv(out)
    )
    back = (
        spark.read.schema("doc_id long, source string, hard_text string")
        .option("header", "true")
        .option("multiLine", "true")
        .option("escape", '"')
        # FAILFAST (parity with the JSONL lane): a mis-split multiLine
        # record must be a loud parse error, not PERMISSIVE nulls that
        # surface only as a downstream hash mismatch (ADVICE r09)
        .option("mode", "FAILFAST")
        .csv(out)
    )
    return back.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("hard_text")).alias("sum_len"),
        F.min(F.md5("hard_text")).alias("md5_min"),
        F.max(F.md5("hard_text")).alias("md5_max"),
    )


# -------------------------------------------- Unicode normalization (r09)


@register(
    "text_normalize",
    oracle="""
    WITH dirty AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0
                    THEN replace(text, 'a', 'a' || chr(769))
                  WHEN doc_id % 3 = 1
                    THEN replace(text, ' ', chr(160))
                  ELSE replace(text, 'e', 'e' || chr(8203))
             END AS dirty_text
      FROM documents
    ), norm AS (
      SELECT doc_id,
             length(dirty_text)::BIGINT AS n_chars_dirty,
             trim(regexp_replace(
               replace(replace(nfc_normalize(dirty_text),
                               chr(160), ' '),
                       chr(8203), ''),
               ' +', ' ', 'g')) AS clean_text
      FROM dirty
    )
    SELECT doc_id, n_chars_dirty,
           length(clean_text)::BIGINT AS n_chars_clean,
           clean_text,
           strip_accents(clean_text) AS ascii_text
    FROM norm
    """,
    doc="Unicode canonicalization — the step every published corpus "
    "pipeline runs FIRST (CCNet, SentencePiece NMT-NFKC), because "
    "composed vs decomposed graphemes defeat every downstream dedup "
    "hash. The corpus is clean ASCII, so the query first injects the "
    "three real-world defects deterministically per doc_id residue: "
    "decomposed accents (a + U+0301), NBSP for space, zero-width "
    "space after e. The pipeline then NFC-composes (Arrow pandas_udf "
    "— Spark has no built-in NFC; the ONLY Python step), maps NBSP to "
    "space and strips ZWSP JVM-side, collapses runs of spaces, trims, "
    "and emits both the clean text and its accent-stripped form. The "
    "char counts pin that composition actually happened (dirty counts "
    "the combining mark, clean counts the composed char once). Oracle "
    "is term-for-term: nfc_normalize + strip_accents (utf8proc) vs "
    "pandas NFC/NFD — bit-exact agreement of two independent Unicode "
    "implementations. 100 TB shape: linear, no shuffle at all — a "
    "pure map stage that fuses with whatever scan feeds it.",
    tags=("datapipe", "text", "udf"),
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall2021_flink_dw_spark.datapipe.text import (
        nfc_text,
        strip_accents_text,
    )

    docs = load_table(spark, sf_dir, "documents")
    m = F.col("doc_id") % 3
    dirty = docs.select(
        "doc_id",
        F.when(m == 0, F.replace(F.col("text"), F.lit("a"), F.lit("a\u0301")))
        .when(m == 1, F.replace(F.col("text"), F.lit(" "), F.lit("\u00a0")))
        .otherwise(F.replace(F.col("text"), F.lit("e"), F.lit("e\u200b")))
        .alias("dirty_text"),
    )
    clean = dirty.select(
        "doc_id",
        F.length("dirty_text").cast("long").alias("n_chars_dirty"),
        F.trim(
            F.regexp_replace(
                F.replace(
                    F.replace(
                        nfc_text(F.col("dirty_text")),
                        F.lit("\u00a0"),
                        F.lit(" "),
                    ),
                    F.lit("\u200b"),
                    F.lit(""),
                ),
                " +",
                " ",
            )
        ).alias("clean_text"),
    )
    return clean.select(
        "doc_id",
        "n_chars_dirty",
        F.length("clean_text").cast("long").alias("n_chars_clean"),
        "clean_text",
        strip_accents_text(F.col("clean_text")).alias("ascii_text"),
    )


_N_SHARDS = 16  # training shard count for shard_balance


@register(
    "shard_balance",
    oracle=f"""
    WITH q AS (
      SELECT doc_id, len({TOKENS_SQL}) AS n_tokens FROM documents
      WHERE len({TOKENS_SQL}) > 0
    ), ranked AS (
      SELECT doc_id, n_tokens,
             row_number() OVER (ORDER BY n_tokens DESC, doc_id) - 1 AS r
      FROM q
    ), assigned AS (
      SELECT n_tokens,
             CASE WHEN (r // {_N_SHARDS}) % 2 = 0
                  THEN r % {_N_SHARDS}
                  ELSE {_N_SHARDS} - 1 - (r % {_N_SHARDS})
             END AS shard_id
      FROM ranked
    )
    SELECT shard_id::BIGINT AS shard_id,
           count(*)::BIGINT AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
    FROM assigned GROUP BY shard_id
    """,
    doc="Balanced training-shard assignment — the step between a "
    "curated corpus and a data loader: N shards whose token totals are "
    "near-equal, so no loader worker straggles. Deterministic snake "
    "(boustrophedon) assignment over the docs ranked by token count "
    "descending: block i = rank div N takes shards left-to-right when "
    "i is even, right-to-left when odd, so each shard gets one doc per "
    "block and the +/- ordering error cancels — the classic LPT-lite "
    "that needs NO stateful bin-packing loop, just a global rank. The "
    "rank reuses sample_curriculum_rank's scale-safe decomposition "
    "(range exchange + per-partition row_number + broadcast offsets — "
    "no single-partition global window); assignment and the final "
    "per-shard rollup are pure integer arithmetic, so the oracle (the "
    "naive global window) matches bit-exact. 100 TB shape: one range "
    "exchange + one 16-group agg; the skew this PREVENTS is in the "
    "consumer, not the plan.",
    tags=("datapipe", "sampling", "sort", "window-function"),
)
def shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    t = F.col("__tokens")
    q = docs.filter(F.size(t) > 0).select(
        "doc_id", F.size(t).cast("bigint").alias("n_tokens")
    )
    # one scan + one range exchange, computed ONCE: both the offsets
    # branch and the local-rank branch read this 3-int-column cache
    # (static planning gives no ReusedExchange here — without the
    # persist the whole subtree, tokenizer included, runs twice)
    ranged = tracked_persist(
        q.repartitionByRange(
            32, F.desc("n_tokens"), F.asc("doc_id")
        ).withColumn("pid", F.spark_partition_id())
    )
    counts = ranged.groupBy("pid").agg(F.count(F.lit(1)).alias("_n"))
    w_off = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "pid",
        F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off"),
    )
    w_local = Window.partitionBy("pid").orderBy(
        F.desc("n_tokens"), F.asc("doc_id")
    )
    r = (
        ranged.withColumn("_rn", F.row_number().over(w_local))
        .join(F.broadcast(offsets), "pid")
        .select(
            "n_tokens",
            (F.col("_off") + F.col("_rn") - 1).alias("r"),
        )
    )
    block = (F.col("r") / _N_SHARDS).cast("bigint")
    pos = F.col("r") % _N_SHARDS
    assigned = r.select(
        "n_tokens",
        F.when(block % 2 == 0, pos)
        .otherwise(F.lit(_N_SHARDS - 1) - pos)
        .cast("bigint")
        .alias("shard_id"),
    )
    return assigned.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
    )


@register(
    "source_schema_evolution",
    oracle="""
    WITH flat AS (
      SELECT event_id, event_type,
             CAST(floor(value * 100) AS BIGINT) AS value_cents
      FROM events
    )
    SELECT event_type,
           count(*)::BIGINT AS n_events,
           CAST(sum(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_v2,
           CAST(sum(CASE WHEN event_id % 2 = 1 THEN value_cents
                         ELSE 0 END) AS BIGINT) AS cents_v2,
           CAST(sum(event_id) AS BIGINT) AS id_sum
    FROM flat GROUP BY event_type
    """,
    doc="Schema evolution across parquet drops — the lakehouse reality "
    "that a 100 TB corpus is never written by one job version: drop v1 "
    "(even event_id) has columns (event_id, event_type), drop v2 (odd "
    "event_id) adds value_cents. Reading the common root with "
    "mergeSchema=true unions the schemas by NAME (parquet footer "
    "merge), null-filling v1's missing column; the aggregate then "
    "proves exactly which rows carried the new column. The oracle "
    "recomputes from the original parquet with the same even/odd "
    "split, so a mis-merged or mis-null-filled column is a hash "
    "mismatch. 100 TB note: mergeSchema reads EVERY file footer at "
    "planning time — fine per partition-add, wrong as a standing "
    "default; a production lake pins the evolved schema in a "
    "catalog and uses it as the read schema (schema-on-read, one "
    "footer probe), which is exactly what the explicit-schema JSONL "
    "lane demonstrates.",
    tags=("source", "format", "schema"),
)
def source_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    base = _scratch_dir("schevo")
    events = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("value_cents"),
    )
    v1 = events.where(F.col("event_id") % 2 == 0).select(
        "event_id", "event_type"
    )
    v2 = events.where(F.col("event_id") % 2 == 1)
    v1.write.mode("overwrite").parquet(os.path.join(base, "drop=v1"))
    v2.write.mode("overwrite").parquet(os.path.join(base, "drop=v2"))
    back = (
        spark.read.option("mergeSchema", "true")
        .option("basePath", base)
        .parquet(
            os.path.join(base, "drop=v1"), os.path.join(base, "drop=v2")
        )
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.when(F.col("value_cents").isNotNull(), 1).otherwise(0)
        ).alias("n_v2"),
        F.coalesce(F.sum("value_cents"), F.lit(0)).alias("cents_v2"),
        F.sum("event_id").alias("id_sum"),
    )


@register(
    "lake_compact_events",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS dt,
           count(*)::BIGINT AS n_rows,
           CAST(sum(event_id) AS BIGINT) AS id_sum,
           TRUE AS compact_ok
    FROM events GROUP BY 1
    """,
    doc="Small-file compaction — THE standing maintenance job of any "
    "100 TB lake: streaming/micro-batch writers leave day partitions "
    "with hundreds of KB-scale files, and file-open + footer overhead "
    "then dominates every scan. The query stages the problem "
    "(events written day-partitioned from a 48-way shuffle, so each "
    "day holds ~dozens of small files), compacts by clustering on the "
    "partition key (repartition(dt) -> one task, so ~one output file "
    "per day) and rewrites, then PROVES fidelity: per-day row counts "
    "and id-checksums of the compacted copy must match the oracle's "
    "recompute from the virgin parquet, and compact_ok pins the "
    "file-count collapse (after-count strictly below before, at most "
    "one per day+task) measured from the directory layout — a flag, "
    "since the oracle cannot see the filesystem. The "
    "driver-checkable form of a maintenance op: data bit-identical, "
    "layout observably better.",
    tags=("source", "maintenance", "partitioning"),
)
def lake_compact_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    base = _scratch_dir("compact")
    messy_dir = os.path.join(base, "messy")
    tidy_dir = os.path.join(base, "tidy")
    events = load_table(spark, sf_dir, "events").select(
        "event_id", F.to_date(F.col("ts")).alias("dt")
    )
    # stage the disease: a wide shuffle ahead of partitionBy scatters
    # every day across 16 writer tasks -> ~16 files per day partition
    # (16, not the full core count: the point needs files >> days, not
    # the most file metadata ops the box can grind through)
    (
        events.repartition(16)
        .write.mode("overwrite")
        .partitionBy("dt")
        .parquet(messy_dir)
    )
    messy = spark.read.parquet(messy_dir)

    # File counts are pure layout metadata: every part file the writer
    # leaves holds >= 1 row (parquet tasks emit no empty files), so a
    # directory walk counts exactly the files the previous
    # input_file_name()-distinct scan counted — without re-reading
    # every row of the table twice (r14, guide §6: listing/manifest
    # metadata, not data scans, is how a real lake answers layout
    # questions; the two counting scans were ~half this query's reads).
    def _layout_counts(d: str) -> tuple[int, int]:
        nf = nd = 0
        for root, dirs, files in os.walk(d):
            nd += sum(1 for x in dirs if x.startswith("dt="))
            nf += sum(
                1 for x in files if not x.startswith(("_", "."))
            )
        return nf, nd

    files_before, _ = _layout_counts(messy_dir)
    # the cure: cluster rows by partition key so each day is written by
    # one task -> one file per day (plus header), then rewrite
    (
        messy.repartition(F.col("dt"))
        .write.mode("overwrite")
        .partitionBy("dt")
        .parquet(tidy_dir)
    )
    tidy = spark.read.parquet(tidy_dir)
    files_after, n_days = _layout_counts(tidy_dir)
    ok = bool(files_after < files_before and files_after <= 2 * n_days)
    return (
        tidy.groupBy("dt")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("event_id").alias("id_sum"),
            F.lit(ok).alias("compact_ok"),
        )
        .select(
            F.date_format("dt", "yyyy-MM-dd").alias("dt"),
            "n_rows",
            "id_sum",
            "compact_ok",
        )
    )


@register(
    "dws_event_pivot",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS dt,
           CAST(sum(CASE WHEN event_type = 'click'
                    THEN floor(value * 100) ELSE 0 END) AS BIGINT)
             AS click_cents,
           CAST(sum(CASE WHEN event_type = 'error'
                    THEN floor(value * 100) ELSE 0 END) AS BIGINT)
             AS error_cents,
           CAST(sum(CASE WHEN event_type = 'purchase'
                    THEN floor(value * 100) ELSE 0 END) AS BIGINT)
             AS purchase_cents,
           CAST(sum(CASE WHEN event_type = 'signup'
                    THEN floor(value * 100) ELSE 0 END) AS BIGINT)
             AS signup_cents,
           CAST(sum(CASE WHEN event_type = 'view'
                    THEN floor(value * 100) ELSE 0 END) AS BIGINT)
             AS view_cents
    FROM events GROUP BY 1
    """,
    doc="PIVOT — long-to-wide reshaping (day x event_type value matrix), "
    "the report shape every BI layer over the reference's ADS tables "
    "ultimately serves. The pivot values are EXPLICIT "
    "(pivot(col, [values])), which matters twice at 100 TB: without "
    "them Spark runs a hidden first job just to collect the distinct "
    "pivot keys, and an unbounded key set would explode the schema "
    "(columns are metadata, not data — a 10k-key pivot is a plan "
    "bug, not a big result). With explicit values the whole reshape "
    "is ONE hash aggregate over (day), map-side combined, no extra "
    "scan. Money stays integer cents (floor, exact on both engines); "
    "the oracle is the equivalent conditional aggregation.",
    tags=("sql-surface", "pivot", "aggregation"),
)
def dws_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select(
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("dt"),
        "event_type",
        F.floor(F.col("value") * 100).alias("cents"),
    )
    types = ["click", "error", "purchase", "signup", "view"]
    wide = (
        events.groupBy("dt")
        .pivot("event_type", types)
        .sum("cents")
    )
    return wide.select(
        "dt",
        *[
            F.coalesce(F.col(t), F.lit(0)).alias(f"{t}_cents")
            for t in types
        ],
    )


@register(
    "ads_gmv_trailing_7d",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(sum(CASE WHEN event_type = 'purchase'
                      THEN floor(value * 100) ELSE 0 END) AS BIGINT)
               AS day_cents
      FROM events GROUP BY 1
    )
    SELECT strftime(d, '%Y-%m-%d') AS dt, day_cents,
           CAST(sum(day_cents) OVER (
                  ORDER BY d
                  RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW
                ) AS BIGINT) AS trailing_7d_cents
    FROM daily
    """,
    doc="RANGE-framed moving aggregate — trailing 7-day GMV per day, "
    "the dashboard derivative of the reference's daily GMV total "
    "(ads_gmv_by_day). RANGE (value-based) framing differs from ROWS "
    "when days are missing: a gap day must NOT pull an 8th calendar "
    "day into the frame, so the frame is anchored on the date value "
    "(Spark: rangeBetween(-6, 0) over the day ordinal "
    "datediff(d, DATE'1970-01-01'); DuckDB: RANGE BETWEEN INTERVAL 6 "
    "DAY PRECEDING). The window input is the per-day pre-aggregate — "
    "one row per calendar day, bounded by the calendar and not by "
    "data size — so the unpartitioned global window is safe at any "
    "scale; the heavy reduction happened in the partial-aggregated "
    "groupBy below it. Money stays integer cents throughout.",
    tags=("sql-surface", "window-function", "aggregation"),
)
def ads_gmv_trailing_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    daily = (
        load_table(spark, sf_dir, "events")
        .select(
            F.to_date("ts").alias("d"),
            F.when(
                F.col("event_type") == "purchase",
                F.floor(F.col("value") * 100),
            )
            .otherwise(0)
            .alias("cents"),
        )
        .groupBy("d")
        .agg(F.sum("cents").alias("day_cents"))
    )
    w = (
        Window.orderBy(F.datediff(F.col("d"), F.lit("1970-01-01")))
        .rangeBetween(-6, 0)
    )
    return daily.select(
        F.date_format("d", "yyyy-MM-dd").alias("dt"),
        "day_cents",
        F.sum("day_cents").over(w).alias("trailing_7d_cents"),
    )


@register(
    "source_variant_props",
    oracle="""
    SELECT event_type,
           count(*)::BIGINT AS n_events,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_sum,
           CAST(max(CAST(json_extract(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_max,
           CAST(sum(CASE WHEN json_extract(props, '$.missing') IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_no_field
    FROM events GROUP BY event_type
    """,
    doc="Semi-structured VARIANT lane — Spark 4's native answer to the "
    "reference's JSON-string columns (the props payload every event "
    "carries; the reference reads these with per-query JSONObject "
    "parsing, BaseLogApp.java-style). parse_json converts the string "
    "ONCE into the binary VARIANT encoding, then typed path access "
    "(try_variant_get with a target type) replaces per-access "
    "re-parsing; a missing path yields NULL rather than an error — "
    "counted here to pin the semantics. At 100 TB the point is "
    "storage+CPU: VARIANT in parquet is shredded binary, so repeated "
    "path reads don't re-tokenize text, and try_variant_get is "
    "codegen'd JVM work, not a UDF. Oracle: DuckDB json_extract over "
    "the same strings — two independent JSON implementations agreeing "
    "on values and null-ness.",
    tags=("source", "format", "variant", "json"),
)
def source_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select(
        "event_type", F.parse_json(F.col("props")).alias("v")
    )
    k = F.try_variant_get(F.col("v"), "$.k", "bigint")
    missing = F.try_variant_get(F.col("v"), "$.missing", "bigint")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("k_sum"),
        F.max(k).alias("k_max"),
        F.sum(F.when(missing.isNull(), 1).otherwise(0)).alias(
            "n_no_field"
        ),
    )


_HH_ORACLE = """
    WITH s AS (SELECT lower(text) AS t FROM documents),
    g AS (
      SELECT substr(t, i, 3) AS tri
      FROM s, unnest(range(1, length(t) - 1)) AS u(i)
    ),
    c AS (SELECT tri, count(*)::BIGINT AS n_total FROM g GROUP BY 1),
    top AS (SELECT tri, n_total FROM c ORDER BY n_total DESC, tri LIMIT 25),
    n AS (SELECT sum(greatest(length(t) - 2, 0))::BIGINT AS n_tot FROM s),
    f AS (
      SELECT min(top.n_total) * 257 > any_value(n.n_tot) AS cover_ok
      FROM top, n
    )
    SELECT tri, n_total, f.cover_ok FROM top, f
    """


@register(
    "text_heavy_hitters",
    oracle=_HH_ORACLE,
    doc="Heavy hitters over an OPEN key space (character trigrams) via a "
    "Misra-Gries mergeable sketch (Misra & Gries 1982; Agarwal et al., "
    "Mergeable Summaries, PODS 2012) — the memory-bounded form of the "
    "reference's exact keyed counting (ProductStats.java HashSet "
    "accumulators) for when the key is tokens/n-grams, not dimensions. "
    "Two passes: (1) per-partition MG summaries with m=256 counters, "
    "Arrow-batched (datapipe/sketch.py) and union-merged — total "
    "undercount <= N/(m+1), so every key with true count > N/(m+1) "
    "survives as a candidate; (2) exact recount restricted to the "
    "candidates (broadcast semi-join), so emitted counts are EXACT — "
    "the sketch picks which keys to count, never the values. The "
    "cover_ok flag pins the guarantee on this corpus in exact integer "
    "arithmetic: c_25 * (m+1) > N, i.e. the true 25th count clears the "
    "MG bound (m=256 < the 377-trigram key space here, so evictions "
    "genuinely occur). At 100 TB this is the difference between "
    "per-task hash tables sized by local key cardinality plus a "
    "cardinality-sized shuffle, and O(m) state per task plus an "
    "O(parts*m) shuffle; the oracle is the exact top-25.",
    tags=("datapipe", "text", "sketch", "topn"),
)
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall2021_flink_dw_spark.datapipe.sketch import (
        trigram_mg_summaries,
    )

    ensure_workers_can_import(spark)
    m = 256
    docs = load_table(spark, sf_dir, "documents").select(
        F.lower(F.col("text")).alias("t")
    )
    # pass 1: the vectorized Arrow kernel (sketch.py) — raw doc strings
    # ship through Arrow and trigrams become packed int64 ids in numpy;
    # no per-trigram row or UTF8String is ever materialized (the JVM
    # explode form was linear but alloc-bound: 173 s of the 286 s total
    # at 150M trigrams). O(m) state per partition.
    merged = (
        trigram_mg_summaries(docs, m)
        .groupBy("key")
        .agg(F.sum("c").alias("lb"))
    )
    # candidate ids are <= parts*m — the same bounded-collect contract
    # as the BPE vocab table
    cand_ids = [r.key for r in merged.collect()]
    return _heavy_hitters_finalize(spark, docs, cand_ids, m)


def _heavy_hitters_finalize(
    spark: SparkSession, docs: DataFrame, cand_ids: list, m: int
) -> DataFrame:
    """Shared tail of the batch and streaming heavy-hitters queries:
    exact recount restricted to the candidate ids (same Arrow kernel,
    np.isin filter, candidate-sized groupBy), then decode + top-25 on
    the candidate-bounded set — tie-broken by the trigram STRING
    (matching the oracle's ORDER BY n DESC, tri; the packed-id order is
    NOT lexicographic, so the cut must happen after decoding) — plus
    the integer-exact guarantee flag c_min*(m+1) > N."""
    from gmall2021_flink_dw_spark.datapipe.sketch import (
        decode_trigram_id,
        trigram_exact_counts,
    )

    exact = (
        trigram_exact_counts(docs, cand_ids)
        .groupBy("key")
        .agg(F.sum("c").alias("n_total"))
        .collect()
    )
    n_tot = docs.agg(
        F.sum(F.greatest(F.length(docs.columns[0]) - 2, F.lit(0))).alias(
            "n_tot"
        )
    ).head()[0]
    scored = sorted(
        ((int(r.n_total), decode_trigram_id(r.key)) for r in exact),
        key=lambda x: (-x[0], x[1]),
    )[:25]
    cover_ok = bool(scored and scored[-1][0] * (m + 1) > int(n_tot))
    return spark.createDataFrame(
        [(tri, n, cover_ok) for n, tri in scored],
        "tri string, n_total long, cover_ok boolean",
    )


@register(
    "vocab_coverage",
    oracle="""
    WITH s AS (SELECT lower(text) AS t FROM documents),
    g AS (
      SELECT substr(t, i, 3) AS tri
      FROM s, unnest(range(1, length(t) - 1)) AS u(i)
    ),
    c AS (SELECT tri, count(*)::BIGINT AS n FROM g GROUP BY 1),
    ids AS (
      SELECT (unicode(substr(tri, 1, 1))::BIGINT
            | (unicode(substr(tri, 2, 1))::BIGINT << 21)
            | (unicode(substr(tri, 3, 1))::BIGINT << 42)) AS tid, n
      FROM c
    ),
    tot AS (SELECT sum(n)::BIGINT AS total FROM c),
    r AS (
      SELECT tid, n,
             sum(n) OVER (ORDER BY n DESC, tid) AS cum,
             row_number() OVER (ORDER BY n DESC, tid) AS rk
      FROM ids
    ),
    t(target_pct) AS (VALUES (50), (90), (99))
    SELECT target_pct,
           min(rk) AS vocab_size,
           min_by(cum, rk)::BIGINT AS covered,
           any_value(total)::BIGINT AS total,
           min_by(cum, rk)::DOUBLE / any_value(total) AS coverage
    FROM r, tot, t
    WHERE cum * 100 >= target_pct * total
    GROUP BY target_pct
    """,
    doc="Vocabulary COVERAGE CURVE over the open character-trigram key "
    "space — the tokenizer-budget design question every BPE/unigram "
    "vocabulary sizing starts from: the smallest top-k vocab (by "
    "frequency, packed-id tiebreak — both engines derive the SAME "
    "21-bit-per-codepoint packing, so ties need no string collation) "
    "whose cumulative frequency covers >= {50, 90, 99}% of all token "
    "instances, plus the exact covered/total instance counts. "
    "Trigrams are the corpus's one honestly Zipf-like key space "
    "(vocab 377 here; the curve is 74/173/327 at sf0.01). The "
    "threshold test is EXACT INTEGER arithmetic (cum*100 >= "
    "target*total — no float gate; cum <= N keeps the product under "
    "2^63 for any N < 9.2e16, i.e. far past 100 TB of text), and the "
    "single double emitted is one IEEE divide covered/total — "
    "bit-identical across engines by construction. 100 TB shape: the "
    "Arrow trigram kernel ships raw doc strings once and emits "
    "per-batch DISTINCT (key, c) partials (map-side-mergeable, "
    "output-reducing — the bigram_model_partials contract), the only "
    "corpus-wide exchange is the vocabulary-sized groupBy, and the "
    "frequency-spectrum cumsum/rank runs the scale-safe range-"
    "exchange pattern (per-partition cumsum + broadcast prefix "
    "offsets, the sample_ccnet_buckets rank template) — no single-"
    "partition window over the vocabulary. Targets and the 1-row "
    "total are broadcast scalars.",
    tags=("datapipe", "text", "agg", "tokenizer"),
)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from gmall2021_flink_dw_spark.datapipe.sketch import (
        trigram_count_partials,
    )

    ensure_workers_can_import(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        F.lower(F.col("text")).alias("t")
    )
    counts = (
        trigram_count_partials(docs)
        .groupBy("key")
        .agg(F.sum("c").alias("n"))
    )
    # scale-safe global cumsum+rank over the frequency spectrum:
    # range-exchange on the output order, per-partition local cumsum
    # and row_number, then broadcast per-partition prefix offsets
    # (#partitions rows) lift local -> global. No vocabulary-sized
    # single-partition window.
    ranged = tracked_persist(
        counts.repartitionByRange(F.desc("n"), F.asc("key")).withColumn(
            "pid", F.spark_partition_id()
        )
    )
    per_pid = ranged.groupBy("pid").agg(
        F.sum("n").alias("_pn"), F.count(F.lit(1)).alias("_pk")
    )
    w_off = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = per_pid.select(
        "pid",
        F.coalesce(F.sum("_pn").over(w_off), F.lit(0)).alias("_cum_off"),
        F.coalesce(F.sum("_pk").over(w_off), F.lit(0)).alias("_rk_off"),
    )
    # total from the (partition-count-sized) per_pid table, NOT from
    # `counts`: a second branch off the unpersisted counts would re-run
    # the whole trigram kernel (measured: 8.6 -> 4.1 s at 10x)
    total = per_pid.agg(F.sum("_pn").cast("bigint").alias("total"))
    w_local = Window.partitionBy("pid").orderBy(F.desc("n"), F.asc("key"))
    spectrum = (
        ranged.withColumn(
            "_lcum",
            F.sum("n").over(
                w_local.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .withColumn("_lrk", F.row_number().over(w_local))
        .join(F.broadcast(offsets), "pid")
        .select(
            (F.col("_cum_off") + F.col("_lcum")).alias("cum"),
            (F.col("_rk_off") + F.col("_lrk")).alias("rk"),
        )
    )
    targets = spark.createDataFrame(
        [(50,), (90,), (99,)], "target_pct int"
    )
    return (
        spectrum.crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(targets))
        .filter(F.col("cum") * 100 >= F.col("target_pct") * F.col("total"))
        .groupBy("target_pct")
        .agg(
            F.min("rk").alias("vocab_size"),
            F.min_by("cum", "rk").cast("bigint").alias("covered"),
            F.any_value("total").cast("bigint").alias("total"),
            (
                F.min_by("cum", "rk").cast("double")
                / F.any_value("total")
            ).alias("coverage"),
        )
    )


# temp trees from prior streaming_heavy_hitters invocations, reclaimed
# on the next invocation (same contract as streaming_dedup_ingest)
_HH_STREAM_DIRS: list[str] = []


@register(
    "streaming_heavy_hitters",
    oracle=_HH_ORACLE,
    doc="ONLINE Misra-Gries maintenance over a document stream — the "
    "trending-keys shape of the reference's KeywordStats layer, "
    "generalized to an open key space: the corpus replays as a real "
    "file stream in 4 micro-batches, and each trigger appends an "
    "O(m)-sized MG-summary DELTA (the Arrow trigram kernel over just "
    "that batch) — per-trigger cost scales with the batch, never the "
    "accumulated corpus (the streaming_dedup_ingest log-structured "
    "contract). MG merge is union+sum: summed lower bounds stay lower "
    "bounds and the total undercount over any batching is still "
    "<= N/(m+1), so the merged candidate set is BATCHING-INVARIANT — "
    "pinned by sharing the batch query's oracle verbatim. The exact "
    "recount + top-25 reuse the batch tail (_heavy_hitters_finalize); "
    "at 100 TB that recount is the deferred compaction job, while the "
    "sketch answers trending-keys queries continuously between "
    "compactions.",
    tags=("datapipe", "streaming", "sketch", "stateful"),
)
def streaming_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import os
    import shutil
    import tempfile
    import uuid as _uuid

    from gmall2021_flink_dw_spark.datapipe.sketch import (
        trigram_mg_summaries,
    )

    ensure_workers_can_import(spark)
    m = 256
    for stale in list(_HH_STREAM_DIRS):
        shutil.rmtree(stale, ignore_errors=True)
        _HH_STREAM_DIRS.remove(stale)
    from gmall2021_flink_dw_spark.scratch import stream_scratch_base

    base = tempfile.mkdtemp(
        prefix=f"hh_stream_{_uuid.uuid4().hex[:8]}_",
        dir=stream_scratch_base(),
    )
    _HH_STREAM_DIRS.append(base)
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    topic_dir = os.path.join(base, "topic")
    delta_base = os.path.join(base, "delta")
    ckpt = os.path.join(base, "ckpt")

    docs = load_table(spark, sf_dir, "documents").select(
        F.lower(F.col("text")).alias("t")
    )
    docs.repartition(4).write.mode("overwrite").parquet(topic_dir)

    def _flush_summary(batch_df: DataFrame, epoch_id: int) -> None:
        (
            trigram_mg_summaries(batch_df.select("t"), m)
            .groupBy("key")
            .agg(F.sum("c").alias("c"))
            .write.mode("overwrite")
            .parquet(os.path.join(delta_base, f"v{epoch_id}"))
        )

    q = (
        spark.readStream.schema("t string")
        .option("maxFilesPerTrigger", "1")
        .parquet(topic_dir)
        .writeStream.foreachBatch(_flush_summary)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(topic_dir, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    merged = (
        spark.read.parquet(os.path.join(delta_base, "v*"))
        .groupBy("key")
        .agg(F.sum("c").alias("lb"))
    )
    cand_ids = [r.key for r in merged.collect()]
    return _heavy_hitters_finalize(spark, docs, cand_ids, m)


@register(
    "sample_dsir",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang,
             unnest(list_concat(w, list_transform(range(1, len(w)),
               i -> w[i] || ' ' || w[i + 1]))) AS tk
      FROM (SELECT doc_id, lang, {TOKENS_SQL} AS w FROM documents)
    ),
    dtf AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5(tk), 1, 8))::BIGINT % 512 AS b,
             count(*)::BIGINT AS k
      FROM tok GROUP BY 1, 2, 3
    ),
    raw AS (SELECT b, sum(k)::BIGINT AS cr FROM dtf GROUP BY 1),
    tgt AS (
      SELECT b, sum(k)::BIGINT AS ct FROM dtf WHERE lang = 'en' GROUP BY 1
    ),
    tots AS (
      SELECT (SELECT sum(cr) FROM raw)::BIGINT AS r_tot,
             (SELECT coalesce(sum(ct), 0) FROM tgt)::BIGINT AS t_tot
    ),
    doc AS (
      SELECT d.doc_id,
             sum(d.k * (ln((coalesce(t.ct, 0) + 1)::DOUBLE
                           / (tots.t_tot + 512))
                        - ln((r.cr + 1)::DOUBLE / (tots.r_tot + 512))))
               AS logw,
             sum(d.k)::BIGINT AS n_feats
      FROM dtf d JOIN raw r USING (b) LEFT JOIN tgt t USING (b)
      CROSS JOIN tots
      GROUP BY 1
    ),
    keyed AS (
      SELECT doc_id, n_feats, logw,
             logw - ln(-ln(
               (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                % 1000000 + 0.5) / 1000000.0)) AS gk
      FROM doc
    )
    SELECT doc_id, n_feats, round(logw, 6) AS logw,
           round(gk, 6) AS gumbel_key
    FROM keyed ORDER BY gk DESC, doc_id LIMIT 64
    """,
    doc="DSIR — Data Selection with Importance Resampling (Xie et al., "
    "NeurIPS 2023): select pretraining documents whose hashed-n-gram "
    "feature distribution looks like a target corpus. Features are "
    "md5-hashed UNIGRAM + BIGRAM buckets (B=512; the paper uses 10k "
    "buckets over the same uni+bigram mix); the raw and target (lang='en' stands in for the "
    "high-quality target) bucket models are add-one-smoothed "
    "multinomials; each doc scores the log importance weight "
    "sum_b k_b * ln(p_target(b)/p_raw(b)); selection is Gumbel top-k "
    "(the paper's sampling-without-replacement trick), with the Gumbel "
    "noise derived deterministically from md5(doc_id) so both engines "
    "draw identical 'randomness'. Plan (r10, the VERDICT r09 scale "
    "lever): ZERO corpus shuffles — pass 1 fits both B-bounded models "
    "via the dictionary-encoding Arrow kernel (datapipe/dsir.py: one "
    "md5 per DISTINCT feature per batch, <=512 histogram rows leave "
    "each partition); the 512 ln-weights are computed in a JVM job "
    "and collected (Gram-style bounded collect); pass 2 scores each "
    "doc in the same kernel (bincount + GEMV against the weight "
    "vector) emitting one row per doc; final top-64 is "
    "TakeOrderedAndProject (no global sort, no single-partition "
    "window). Third decade measured 108.6 -> 18.2 s, decade ratio "
    "9.8x -> 5.7x (BASELINE.md r10). At 100 TB the models are exactly "
    "the paper's importance-weight tables: vocabulary-independent "
    "fixed-size arrays, fit in one pass, reusable across selection "
    "runs. "
    "Float contract follows text_perplexity: ln() terms are "
    "order-summed doubles, emitted round(,6); the Gumbel gap between "
    "adjacent ranks is O(0.1), so sub-ulp engine noise cannot flip "
    "the 64-boundary (structural duplicates get distinct noise from "
    "distinct doc_ids).",
    tags=("datapipe", "sampling", "quality", "join"),
)
def sample_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    B = 512
    docs = with_tokens(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "lang", "__tokens"
    )
    # --- pass 1: fit BOTH bucket models in one pass through the
    # dictionary-encoding Arrow kernel (datapipe/dsir.py — one md5 per
    # DISTINCT feature per batch, not per instance; the JVM explode+
    # md5 form measured ~40 s/pass at g10 on instance-wise hashing).
    # Each partition emits <= B=512 histogram rows, so the groupBy
    # shuffles B rows per task regardless of corpus size.
    from gmall2021_flink_dw_spark.datapipe.dsir import (
        dsir_model_partials,
        dsir_scores,
    )

    ensure_workers_can_import(spark)
    model_rows = (
        dsir_model_partials(docs, B)
        .groupBy("b")
        .agg(F.sum("cr").alias("cr"), F.sum("ct").alias("ct"))
        .collect()
    )
    r_tot = sum(r["cr"] for r in model_rows)
    t_tot = sum(r["ct"] for r in model_rows)
    # ln() stays in the JVM (the engine the oracle was calibrated
    # against): a 512-row local frame computes the per-bucket weight
    # w_b = ln p_tgt(b) - ln p_raw(b), collected into a literal array.
    # Gram-style bounded-collect contract: B rows, corpus-independent.
    spark_l = docs.sparkSession
    wdf = spark_l.createDataFrame(
        [(int(r["b"]), int(r["cr"]), int(r["ct"])) for r in model_rows],
        "b int, cr long, ct long",
    ).select(
        "b",
        (
            F.log((F.col("ct") + 1).cast("double") / F.lit(float(t_tot + B)))
            - F.log(
                (F.col("cr") + 1).cast("double") / F.lit(float(r_tot + B))
            )
        ).alias("w"),
    )
    weights = [0.0] * B
    for r in wdf.collect():
        weights[r["b"]] = r["w"]

    # --- pass 2: score per doc with ZERO shuffle — the same kernel
    # dictionary-encodes each batch, bincounts per-(doc,bucket) integer
    # k_b, and emits one (doc_id, logw, n_feats) row per doc with
    # logw = sum_b k_b * w_b (the oracle's own association: integer
    # count times weight, summed over buckets).
    per_doc = dsir_scores(docs, weights, B)
    u = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 1000000
        + 0.5
    ) / 1000000.0
    keyed = per_doc.withColumn("gk", F.col("logw") - F.log(-F.log(u)))
    return (
        keyed.orderBy(F.col("gk").desc(), "doc_id")
        .limit(64)
        .select(
            "doc_id",
            "n_feats",
            F.round("logw", 6).alias("logw"),
            F.round("gk", 6).alias("gumbel_key"),
        )
    )


@register(
    "lake_zorder_layout",
    oracle="""
    SELECT count(*)::BIGINT AS n_rows,
           CAST(coalesce(sum(event_id), 0) AS BIGINT) AS id_sum,
           CAST(coalesce(sum(floor(value * 100)), 0) AS BIGINT) AS cents,
           TRUE AS zorder_prunes
    FROM events
    WHERE user_id BETWEEN 3 AND 7
      AND strftime(date_trunc('day', ts), '%Y-%m-%d') = '2024-01-10'
    """,
    doc="Z-order (Morton curve) data layout — the lakehouse clustering "
    "move (Delta OPTIMIZE ZORDER BY) that makes MULTI-dimensional "
    "predicates prunable from ONE sort order: interleave the bits of "
    "the two filter dimensions (user_id, hour-of-ts; 20 bits each -> "
    "40-bit z-value), repartitionByRange + sortWithinPartitions on z, "
    "and rows close in BOTH dimensions land in the same files, so "
    "parquet min/max footer stats skip everything else. The query "
    "stages both layouts from the same events (z-clustered vs "
    "hash-scattered control), runs the identical 2-D predicate "
    "(5 users x 1 day) against each, and measures files actually "
    "hit via input_file_name(); zorder_prunes pins "
    "files_z < files_linear (or an empty region, where pruning is "
    "unobservable). Data correctness is the region aggregate against "
    "the oracle's recompute from virgin parquet — a mis-interleaved "
    "bit or a lossy rewrite is a value mismatch, not just a slow "
    "plan. At 100 TB this layout job is run once per partition-add; "
    "every subsequent selective scan pays file-count ~ O(region "
    "volume / file volume) instead of O(total files).",
    tags=("source", "maintenance", "partitioning", "zorder"),
)
def lake_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    base = _scratch_dir("zorder")
    zdir, ldir = os.path.join(base, "zorder"), os.path.join(base, "linear")
    events = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    # Bit budget (ADVICE r09): 20 bits per dimension. The loop below
    # reads only the LOW 20 bits of each key, so user_id >= 2^20 or an
    # hour ordinal past 2^20 (year ~2089 on the unix-epoch base) would
    # WRAP into the same z-range as its low-bit twin — correctness
    # (the returned aggregate) is untouched, but clustering quality
    # degrades to modulo-2^20 locality. The generator satisfies both
    # bounds (user_id < 10k, ts in 2024); at real cardinalities derive
    # the per-dimension bit width from max(key) at write time.
    x = F.col("user_id").bitwiseAND(F.lit((1 << 20) - 1))
    y = (
        F.floor(F.unix_timestamp("ts") / 3600)
        .cast("bigint")
        .bitwiseAND(F.lit((1 << 20) - 1))
    )
    z = F.lit(0).cast("bigint")
    for i in range(20):  # 20 bits per dimension -> 40-bit Morton code
        z = z + F.shiftleft(
            F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i
        ) + F.shiftleft(
            F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    staged = events.withColumn("z", z)
    # Layout width from session config, not a literal (VERDICT r11
    # item 6, same class as the ccnet sizing fix): file count scales
    # with the session's shuffle parallelism, so the experiment keeps
    # one file per shuffle slot at any deployment size. Both layouts
    # use the SAME width so the files-hit comparison is apples-to-apples.
    n_files = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # z layout: range-partition + sort on the Morton code -> each file
    # holds a contiguous z-range = a small rectangle in (user, hour)
    (
        staged.repartitionByRange(n_files, "z")
        .sortWithinPartitions("z")
        .write.mode("overwrite")
        .parquet(zdir)
    )
    # control: hash-scatter, every file sees every region
    staged.repartition(n_files, "event_id").write.mode(
        "overwrite"
    ).parquet(ldir)
    region = lambda df: df.where(  # noqa: E731
        F.col("user_id").between(3, 7)
        & (F.date_format(F.to_date("ts"), "yyyy-MM-dd") == "2024-01-10")
    )
    # input_file_name() must be projected before aggregation
    files_hit = lambda d: (  # noqa: E731
        region(spark.read.parquet(d))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )
    fz, fl = files_hit(zdir), files_hit(ldir)
    ok = bool(fz < fl or fl == 0)
    return region(spark.read.parquet(zdir)).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(F.sum("event_id"), F.lit(0)).alias("id_sum"),
        F.coalesce(F.sum("cents"), F.lit(0)).alias("cents"),
        F.lit(ok).alias("zorder_prunes"),
    )


# integer-quantized Gram matrix CTEs, shared by the two linalg oracles:
# quantize each float32 component through double (the exact widening
# both engines perform) before any product, so every Gram cell is an
# exact 64-bit integer.
_GRAM_CTES = """q AS MATERIALIZED (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
      FROM embeddings
    ),
    gram AS MATERIALIZED (
      SELECT CAST(i AS INTEGER) AS i, CAST(j AS INTEGER) AS j,
             sum(v[i] * v[j])::BIGINT AS g
      FROM q, unnest(range(1, 65)) AS a(i), unnest(range(1, 65)) AS b(j)
      WHERE j >= i
      GROUP BY 1, 2
    )"""


def _power_iteration_ctes(iters: int = 48) -> str:
    """Unrolled power-method SQL over the mirrored Gram: v_{t+1} =
    normalize(G v_t), fixed start 1/sqrt(64). Unrolled (not a recursive
    CTE) because standard SQL forbids aggregation in the recursive
    term; the stage count is parameterized (48 at the only call site —
    the near-isotropic synthetic Gram has lambda2/lambda1 = 0.984, so
    convergence needs ~48 steps) and the static unroll keeps the
    oracle portable.
    Every stage is AS MATERIALIZED: DuckDB inlines plain CTEs, and each
    stage references its predecessor twice (w_t feeds n_t and u_t), so
    un-materialized the chain re-evaluates 2^iters times (measured:
    78 s inlined vs <1 s materialized at sf0.01)."""
    parts = [
        """gfull AS MATERIALIZED (
      SELECT i, j, g FROM gram
      UNION ALL
      SELECT j, i, g FROM gram WHERE i <> j
    ),
    u0 AS MATERIALIZED (SELECT CAST(i AS INTEGER) AS i, 0.125 AS val
           FROM unnest(range(1, 65)) AS a(i))"""
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"""w{t} AS MATERIALIZED (
      SELECT gf.i, sum(gf.g * u{t - 1}.val) AS raw
      FROM gfull gf JOIN u{t - 1} ON gf.j = u{t - 1}.i GROUP BY 1
    ),
    n{t} AS MATERIALIZED (SELECT sqrt(sum(raw * raw)) AS nrm FROM w{t}),
    u{t} AS MATERIALIZED (
      SELECT w{t}.i, w{t}.raw / n{t}.nrm AS val FROM w{t}, n{t})"""
        )
    return ",\n    ".join(parts)


@register(
    "embedding_gram",
    oracle=f"""
    WITH {_GRAM_CTES}
    SELECT i, j, g AS gram FROM gram
    """,
    doc="Distributed exact Gram matrix X^T X over the embedding column "
    "— the one-pass building block of PCA / whitening / covariance "
    "jobs (the shape of Spark MLlib RowMatrix.computeGramianMatrix). "
    "Each Arrow batch contributes a 64x64 integer GEMM partial "
    "(datapipe/linalg.py: one numpy matmul per batch), and partials "
    "sum in a d^2-row aggregate, so the shuffle is O(parts * d^2) "
    "regardless of row count — at 100 TB the reduction is 2080 rows "
    "per partition, full stop. Components are quantized to integers "
    "(floor(x*1000), widened float32->double first, identically in "
    "both engines) BEFORE any product, so every cell is an exact "
    "bigint: order-independent, bit-identical, overflow-safe "
    "(|q|<=~1000 => ~9e12 rows fit in int64 per cell).",
    tags=("datapipe", "embedding", "linalg"),
)
def embedding_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall2021_flink_dw_spark.datapipe.linalg import gram_partials

    ensure_workers_can_import(spark)
    vecs = load_table(spark, sf_dir, "embeddings").select("embedding")
    return (
        gram_partials(vecs, 64)
        .groupBy("i", "j")
        .agg(F.sum("partial").alias("gram"))
    )


@register(
    "embedding_pca_power",
    oracle=f"""
    WITH {_GRAM_CTES},
    {_power_iteration_ctes(48)},
    proj AS (
      SELECT q.vec_id,
             sum(q.v[u48.i] * u48.val) AS p
      FROM q, u48
      GROUP BY 1
    )
    SELECT vec_id, round(p / 1000.0, 6) AS pc1
    FROM proj
    """,
    doc="Top principal component by power iteration + per-vector "
    "projection — the PCA-whitening front half of embedding pipelines "
    "(SemDeDup-style clustering preconditioners). The Gram matrix is "
    "d^2-BOUNDED (2080 upper-triangle cells), so collecting it to the "
    "driver is the same bounded-collect contract as the BPE vocab "
    "table; 48 power-method iterations run on the driver in numpy and "
    "the resulting unit vector re-enters the plan as a 64-element "
    "literal, dotted against each quantized embedding in a codegen'd "
    "zip_with/aggregate fold — no second Python stage, no shuffle. "
    "Cross-engine float contract: both engines run the IDENTICAL 48 "
    "matvec+normalize steps from the same start vector (1/sqrt(64)); "
    "48 because this synthetic corpus is near-isotropic "
    "(l2/l1 = 0.984, the power method's worst case — real LM "
    "embeddings are strongly anisotropic and converge in a handful "
    "of steps), and 48 steps capture 99.7% of the top eigenvalue's "
    "Rayleigh quotient here (asserted in tests) "
    "on the same exact-integer Gram; summation-order noise stays "
    "~1e-13 on a unit vector and the projection is emitted "
    "round(,6) after de-quantization (p/1000), the text_perplexity "
    "residual-risk class. Sign is pinned by the positive start "
    "vector (Gram is PSD, start . v1 > 0 deterministically).",
    tags=("datapipe", "embedding", "linalg"),
)
def embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from gmall2021_flink_dw_spark.datapipe.linalg import gram_partials

    ensure_workers_can_import(spark)
    vecs = load_table(spark, sf_dir, "embeddings")
    # d^2-bounded collect (2080 rows), the documented driver contract
    cells = (
        gram_partials(vecs.select("embedding"), 64)
        .groupBy("i", "j")
        .agg(F.sum("partial").alias("gram"))
        .collect()
    )
    g = np.zeros((64, 64), dtype=np.float64)
    for r in cells:
        g[r.i - 1, r.j - 1] = r.gram
        g[r.j - 1, r.i - 1] = r.gram
    v = np.full(64, 0.125, dtype=np.float64)
    for _ in range(48):
        w = g @ v
        v = w / np.sqrt((w * w).sum())
    q = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * 1000).cast("long"),
    )
    lit_v = F.array(*[F.lit(float(c)) for c in v])
    dot = F.aggregate(
        F.zip_with(q, lit_v, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return vecs.select(
        "vec_id", F.round(dot / 1000.0, 6).alias("pc1")
    )


@register(
    "sample_leakage_free_split",
    oracle="""
    WITH fp AS (
      SELECT doc_id, md5(text) AS f FROM documents
    ),
    rep AS (SELECT f, min(doc_id) AS rep_id FROM fp GROUP BY 1),
    assigned AS (
      SELECT fp.doc_id, rep.rep_id,
             CASE
               WHEN ('0x' || substr(md5(rep.rep_id::VARCHAR), 1, 8))::BIGINT
                    % 100 < 90 THEN 'train'
               WHEN ('0x' || substr(md5(rep.rep_id::VARCHAR), 1, 8))::BIGINT
                    % 100 < 95 THEN 'val'
               ELSE 'test'
             END AS split
      FROM fp JOIN rep USING (f)
    ),
    leak AS (
      SELECT count(*) = 0 AS leak_free
      FROM (
        SELECT rep_id FROM assigned
        GROUP BY rep_id HAVING count(DISTINCT split) > 1
      )
    )
    SELECT a.split,
           count(*)::BIGINT AS n_docs,
           count(DISTINCT a.rep_id)::BIGINT AS n_groups,
           CAST(sum(a.doc_id) AS BIGINT) AS id_sum,
           l.leak_free
    FROM assigned a, leak l
    GROUP BY 1, 5
    """,
    doc="Leakage-free train/val/test split — the evaluation-hygiene op "
    "every pretraining corpus needs: assigning SPLITS PER DOCUMENT "
    "leaks near-identical content across train and test (the "
    "contamination mechanism Lee et al. 2022 and the GPT-3 appendix "
    "both document), so the split key must be the DUPLICATE GROUP, "
    "not the doc. Here the group is the exact content fingerprint "
    "(md5(text); the MinHash cluster id drops in identically), the "
    "representative is min(doc_id) per group, and the 90/5/5 "
    "assignment hashes the REPRESENTATIVE — every copy of a document "
    "lands in the same split by construction. Emitted per split: doc "
    "and group counts, an id checksum, and leak_free = no group spans "
    "two splits (the pinned invariant; trivially true here, but the "
    "flag turns a future regression — e.g. someone re-keying the "
    "hash to doc_id — into a driver hash mismatch). Plan: one scan, "
    "one shuffle on the fingerprint, one broadcast-size group join; "
    "deterministic md5 bucketing, no RNG state, stable under re-runs "
    "and appends at 100 TB.",
    tags=("datapipe", "sampling", "dedup", "quality"),
)
def sample_leakage_free_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("f")
    )
    rep = docs.groupBy("f").agg(F.min("doc_id").alias("rep_id"))
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("rep_id").cast("string")), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    assigned = tracked_persist(
        docs.join(rep, "f").select(
            "doc_id",
            "rep_id",
            F.when(bucket < 90, "train")
            .when(bucket < 95, "val")
            .otherwise("test")
            .alias("split"),
        )
    )
    leak = (
        assigned.groupBy("rep_id")
        .agg(F.count_distinct("split").alias("ns"))
        .agg((F.sum(F.when(F.col("ns") > 1, 1).otherwise(0)) == 0).alias("leak_free"))
    )
    return (
        assigned.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("rep_id").alias("n_groups"),
            F.sum("doc_id").alias("id_sum"),
        )
        .crossJoin(F.broadcast(leak))
        .select("split", "n_docs", "n_groups", "id_sum", "leak_free")
    )


@register(
    "sample_ccnet_buckets",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {TOKENS_SQL} AS w FROM documents),
    bg AS (
      SELECT doc_id, unnest({DUCK_BIGRAMS_SQL}) AS p
      FROM tok WHERE len(w) >= 2
    ),
    dtf AS (
      SELECT doc_id, p.w1 AS w1, p.w2 AS w2, count(*) AS k
      FROM bg GROUP BY 1, 2, 3
    ),
    bc AS (SELECT w1, w2, sum(k)::BIGINT AS cb FROM dtf GROUP BY 1, 2),
    uc AS (SELECT w1, sum(cb)::BIGINT AS cu FROM bc GROUP BY 1),
    voc AS (
      SELECT count(DISTINCT t) AS v
      FROM (SELECT unnest(w) AS t FROM tok)
    ),
    doc AS (
      SELECT d.doc_id,
             sum(d.k * ln((bc.cb + 1)::DOUBLE / (uc.cu + voc.v)))
               / sum(d.k) AS lp,
             sum(d.k)::BIGINT AS n_bigrams
      FROM dtf d
      JOIN bc USING (w1, w2) JOIN uc USING (w1) CROSS JOIN voc
      GROUP BY 1
    ),
    ranked AS (
      SELECT documents.source AS source, doc.doc_id, n_bigrams,
             row_number() OVER (
               PARTITION BY documents.source
               ORDER BY round(lp, 6) DESC, doc.doc_id) AS rnk,
             count(*) OVER (PARTITION BY documents.source) AS n
      FROM doc JOIN documents USING (doc_id)
    )
    SELECT source, bucket::INT AS bucket, count(*)::BIGINT AS n_docs,
           CAST(sum(n_bigrams) AS BIGINT) AS bigrams,
           CAST(sum(doc_id) AS BIGINT) AS docid_sum,
           bucket <= 2 AS kept
    FROM (SELECT source, doc_id, n_bigrams,
                 1 + (3 * (rnk - 1)) // n AS bucket
          FROM ranked)
    GROUP BY source, bucket
    """,
    doc="CCNet-style perplexity bucketing (Wenzek et al., LREC 2020): "
    "per SOURCE, rank documents by bigram-LM fluency (higher mean log "
    "P(w2|w1) = more fluent) and cut into head/middle/tail terciles; "
    "CCNet keeps head+middle (kept = bucket <= 2) — the language-"
    "model-quality mixing gate every CommonCrawl-derivative corpus "
    "applies before training. Reuses _bigram_doc_scores (the "
    "text_perplexity core: one corpus shuffle, model tables re-"
    "aggregated vocabulary-sized). Per-source ranks are SCALE-SAFE: "
    "range exchange on (source, ppl6 desc, doc_id) + per-(source,pid) "
    "local row_number + broadcast prefix offsets (the "
    "sample_curriculum_rank pattern) — no per-source single-partition "
    "window, so a 100 TB source ranks across the cluster. Bucket = "
    "1 + (3*(rank-1)) DIV n in exact integer arithmetic on both "
    "engines; emission is all-integer per (source, bucket). Ordering "
    "uses round(lp,6) with doc_id tiebreak — the text_perplexity "
    "float contract (residual cross-engine risk ~1e-8/doc: a sub-ulp "
    "sum-order flip crossing the 1e-6 rounding grid).",
    tags=("datapipe", "sampling", "quality", "window"),
)
def sample_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    scores = _bigram_doc_scores(spark, sf_dir).select(
        "doc_id", F.round("lp", 6).alias("ppl6"), "n_bigrams"
    )
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    ranged = tracked_persist(
        scores.join(src, "doc_id")
        .repartitionByRange(
            F.asc("source"), F.desc("ppl6"), F.asc("doc_id")
        )
        .withColumn("pid", F.spark_partition_id())
    )
    counts = ranged.groupBy("source", "pid").agg(
        F.count(F.lit(1)).alias("_n")
    )
    w_off = (
        Window.partitionBy("source")
        .orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "source",
        "pid",
        F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off"),
    )
    totals = counts.groupBy("source").agg(F.sum("_n").alias("n"))
    w_local = Window.partitionBy("pid", "source").orderBy(
        F.desc("ppl6"), F.asc("doc_id")
    )
    ranked = (
        ranged.withColumn("_rn", F.row_number().over(w_local))
        .join(F.broadcast(offsets), ["source", "pid"])
        .join(F.broadcast(totals), ["source"])
        .withColumn("rnk", F.col("_off") + F.col("_rn"))
    )
    return (
        ranked.withColumn(
            "bucket",
            F.expr("CAST(1 + (3 * (rnk - 1)) DIV n AS INT)"),
        )
        .groupBy("source", "bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_bigrams").cast("bigint").alias("bigrams"),
            F.sum("doc_id").cast("bigint").alias("docid_sum"),
        )
        .withColumn("kept", F.col("bucket") <= 2)
    )


_SUBSTR_CLEAN_ORACLE = """
    WITH g AS (
      SELECT doc_id, u.i AS pos, substr(text, u.i + 1, 50) AS gram
      FROM documents
      CROSS JOIN LATERAL unnest(range(0, greatest(len(text) - 49, 0)))
           AS u(i)
      WHERE len(text) >= 50
    ), d AS (
      SELECT gram FROM g GROUP BY gram HAVING count(*) > 1
    ), hits AS (
      SELECT g.doc_id, g.pos FROM g JOIN d USING (gram)
    ), brk AS (
      SELECT doc_id, pos,
             CASE WHEN pos > coalesce(max(pos + 50) OVER (
                  PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS is_start
      FROM hits
    ), grp AS (
      SELECT doc_id, pos,
             sum(is_start) OVER (PARTITION BY doc_id ORDER BY pos)
               AS span_id
      FROM brk
    ), spans AS (
      SELECT doc_id, span_id, min(pos) AS s, max(pos) + 50 AS e
      FROM grp GROUP BY doc_id, span_id
    ), seg AS (
      SELECT doc_id, s, e,
             coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0)
               AS seg_start
      FROM spans
    ), per_doc AS (
      SELECT seg.doc_id,
             string_agg(substr(text, seg_start + 1, s - seg_start), ''
                        ORDER BY s) AS head,
             max(e) AS max_e,
             CAST(sum(e - s) AS BIGINT) AS removed_chars
      FROM seg JOIN documents USING (doc_id)
      GROUP BY seg.doc_id
    )
    SELECT documents.doc_id,
           CASE WHEN head IS NULL THEN text
                ELSE coalesce(head, '') || substr(text, max_e + 1)
           END AS clean_text,
           coalesce(removed_chars, 0)::BIGINT AS removed_chars
    FROM documents LEFT JOIN per_doc USING (doc_id)
"""


@register(
    "dedup_substring_clean_hashed",
    oracle=_SUBSTR_CLEAN_ORACLE,
    doc="SCALE-PATH twin of dedup_substring_clean (r10): the span "
    "table comes from the persist-free single-shuffle xxhash64 plan "
    "(dedup_substring_spans_hashed's engine), so the ACTIONABLE half "
    "of ExactSubstr — cutting every duplicated 50-char span out of "
    "every doc — inherits the 7.5x-per-decade slope instead of the "
    "exact form's string sort-agg wall (45x at the third decade, "
    "BASELINE.md). Oracle = the exact-string recomputation, so a "
    "64-bit collision surfaces as a mismatch. "
    "datapipe/dedup.py:remove_duplicate_spans_hashed.",
    tags=("datapipe", "dedup", "window", "approx-scale-path"),
)
def dedup_substring_clean_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall2021_flink_dw_spark.datapipe.dedup import (
        remove_duplicate_spans_hashed,
    )

    docs = load_table(spark, sf_dir, "documents")
    return remove_duplicate_spans_hashed(docs, min_len=50)


@register(
    "dedup_substring_keepfirst_hashed",
    oracle="""
    WITH g AS (
      SELECT doc_id, u.i AS pos, substr(text, u.i + 1, 50) AS gram
      FROM documents
      CROSS JOIN LATERAL unnest(range(0, greatest(len(text) - 49, 0)))
           AS u(i)
      WHERE len(text) >= 50
    ), r AS (
      SELECT doc_id, pos,
             row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos)
               AS rn,
             count(*) OVER (PARTITION BY gram) AS c
      FROM g
    ), hits AS (
      SELECT doc_id, pos FROM r WHERE c > 1 AND rn > 1
    ), brk AS (
      SELECT doc_id, pos,
             CASE WHEN pos > coalesce(max(pos + 50) OVER (
                  PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS is_start
      FROM hits
    ), grp AS (
      SELECT doc_id, pos,
             sum(is_start) OVER (PARTITION BY doc_id ORDER BY pos)
               AS span_id
      FROM brk
    ), spans AS (
      SELECT doc_id, span_id, min(pos) AS s, max(pos) + 50 AS e
      FROM grp GROUP BY doc_id, span_id
    ), seg AS (
      SELECT doc_id, s, e,
             coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0)
               AS seg_start
      FROM spans
    ), per_doc AS (
      SELECT seg.doc_id,
             string_agg(substr(text, seg_start + 1, s - seg_start), ''
                        ORDER BY s) AS head,
             max(e) AS max_e,
             CAST(sum(e - s) AS BIGINT) AS removed_chars
      FROM seg JOIN documents USING (doc_id)
      GROUP BY seg.doc_id
    )
    SELECT documents.doc_id,
           CASE WHEN head IS NULL THEN text
                ELSE coalesce(head, '') || substr(text, max_e + 1)
           END AS clean_text,
           coalesce(removed_chars, 0)::BIGINT AS removed_chars
    FROM documents LEFT JOIN per_doc USING (doc_id)
    """,
    doc="SCALE-PATH twin of dedup_substring_clean_keepfirst (r10): the "
    "per-gram first-occurrence election (keep the globally first "
    "(doc_id,pos), cut the rest — Lee et al.'s actual ExactSubstr "
    "contract) runs over xxhash64 keys in ONE shuffle: row_number() "
    "and count() share the (k)-partitioned sort, ordered by the "
    "packed dp = doc_id << 32 | pos (the same total order), no gram "
    "string shuffled, nothing persisted. Oracle = exact-string "
    "recomputation, so 64-bit collisions surface as mismatches. "
    "datapipe/dedup.py:remove_duplicate_spans_keepfirst_hashed.",
    tags=("datapipe", "dedup", "window", "approx-scale-path"),
)
def dedup_substring_keepfirst_hashed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall2021_flink_dw_spark.datapipe.dedup import (
        remove_duplicate_spans_keepfirst_hashed,
    )

    docs = load_table(spark, sf_dir, "documents")
    return remove_duplicate_spans_keepfirst_hashed(docs, min_len=50)
