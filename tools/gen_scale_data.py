"""Generate scale-up twins of the driver testdata (VERDICT r04 item 5).

The driver ships sf0.001/0.01/0.1; one measured decade (sf0.01->sf0.1)
leaves the super-linear onset unobserved. This generator synthesizes the
three tables the top-cost operators read — documents, embeddings,
orders — at an arbitrary multiple of sf0.1, matching the driver data's
measured distributions:

- documents: 30-word uniform vocabulary (the exact sf0.1 vocab), token
  count ~ U[10,100], lang ~ {en:0.4, de/zh/fr/es:0.15}, source =
  src{doc_id % 20}, and the driver's planted near-dup structure: ~4.86%
  of slots replaced by (random base text + " dup") and ~0.16% exact
  copies — measured from sf0.1 (243 "+ dup" pairs, 8 exact-dup groups
  per 5000 docs).
- embeddings: 64-dim iid N(0, 0.125) float32 (measured: overall mean 0,
  std 0.125, label centroids ~0 — labels are tags, not clusters),
  label ~ U{0..9}.
- orders: o_orderkey sequential, o_custkey ~ U[0, 15k*mult),
  status ~ U{O,P,F}, totalprice ~ U[~900, ~470k], orderdate ~
  U[1995-01-01, 2001-08-01], priority ~ U{1-URGENT..5-LOW}.

Output goes OUTSIDE the repo (default /tmp/testdata_sf1) — generated
data is an ephemeral measurement input; the committed artifacts are the
scaling-table numbers in BASELINE.md plus this generator, which
reproduces the input deterministically (seed pinned).

Usage: python tools/gen_scale_data.py [--mult 10] [--out /tmp/testdata_sf1]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "de", "zh", "fr", "es"]
LANG_P = [0.4, 0.15, 0.15, 0.15, 0.15]


def gen_documents(rng: np.random.Generator, n: int) -> pa.Table:
    lengths = rng.integers(10, 101, size=n)
    vocab = np.array(VOCAB)
    texts = [" ".join(vocab[rng.integers(0, len(vocab), size=ln)]) for ln in lengths]
    # planted near-dups: replace ~4.86% of slots with base + " dup"
    n_near = int(round(n * 243 / 5000))
    n_exact = int(round(n * 8 / 5000))
    slots = rng.choice(n, size=n_near + n_exact, replace=False)
    for s in slots[:n_near]:
        base = int(rng.integers(0, n))
        texts[s] = texts[base] + " dup"
    for s in slots[n_near:]:
        texts[s] = texts[int(rng.integers(0, n))]
    langs = rng.choice(LANGS, size=n, p=LANG_P)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array([f"src{i % 20}" for i in range(n)], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(rng: np.random.Generator, n: int) -> pa.Table:
    emb = rng.normal(0.0, 0.125, size=(n, 64)).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(list(emb), pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, size=n).astype(np.int32)),
        }
    )


def gen_orders(rng: np.random.Generator, n: int, n_cust: int) -> pa.Table:
    statuses = np.array(["O", "P", "F"])
    prios = np.array(
        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    )
    t0 = np.datetime64("1995-01-01")
    t1 = np.datetime64("2001-08-01")
    span_us = (t1 - t0).astype("timedelta64[D]").astype(np.int64) * 86400_000_000
    dates = t0.astype("datetime64[us]") + rng.integers(
        0, span_us, size=n
    ).astype("timedelta64[us]")
    return pa.table(
        {
            "o_orderkey": pa.array(np.arange(n), pa.int64()),
            "o_custkey": pa.array(rng.integers(0, n_cust, size=n), pa.int64()),
            "o_orderstatus": pa.array(statuses[rng.integers(0, 3, size=n)]),
            "o_totalprice": pa.array(
                np.round(rng.uniform(900.0, 470000.0, size=n), 2)
            ),
            "o_orderdate": pa.array(dates, pa.timestamp("us")),
            "o_orderpriority": pa.array(prios[rng.integers(0, 5, size=n)]),
        }
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=float, default=10.0,
                    help="multiple of sf0.1 row counts")
    ap.add_argument("--out", default="/tmp/testdata_sf1")
    ap.add_argument("--seed", type=int, default=71)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    m = args.mult
    pq.write_table(gen_documents(rng, int(5000 * m)),
                   os.path.join(args.out, "documents.parquet"))
    pq.write_table(gen_embeddings(rng, int(2000 * m)),
                   os.path.join(args.out, "embeddings.parquet"))
    pq.write_table(gen_orders(rng, int(150000 * m), int(15000 * m)),
                   os.path.join(args.out, "orders.parquet"))
    print(f"wrote documents/embeddings/orders x{m} to {args.out}")


if __name__ == "__main__":
    main()
