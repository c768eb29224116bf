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
- events: event_id sequential, ts ~ U[2024-01-01, 2024-01-31) us,
  user_id ~ U[0, 1.5k*mult), event_type ~ U{signup,click,error,view,
  purchase}, value ~ Exp(mean 50) rounded to cents (measured: mean
  49.9, median 34.8 = 50*ln2), props = '{"k": N}' with N ~ U[0,100).
- lineitem: lines per order ~ Poisson(4) (measured: ~2.7k of 150k
  orders have zero lines = P(0|λ=4)), linenumber ~ U[1,7] iid,
  partkey/suppkey uniform FKs, quantity ~ U{1..50}, extendedprice ~
  U[900, 105000) cents, discount ~ U{0.00..0.10}, tax ~ U{0.00..0.08},
  returnflag ~ U{A,N,R}, linestatus ~ U{O,F}, shipdate ~
  U[1995-01-02, 2001-11-04) (all measured independent).
- customer/supplier/part/nation/region: sequential keys, measured
  name/brand/type/segment vocabularies, acctbal ~ U[-1000, 10000),
  p_retailprice = 900 + (partkey % 1000)/10, nation/region fixed.

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


def gen_events(rng: np.random.Generator, n: int, n_users: int) -> pa.Table:
    kinds = np.array(["signup", "click", "error", "view", "purchase"])
    t0 = np.datetime64("2024-01-01").astype("datetime64[us]")
    span_us = 30 * 86400_000_000
    ts = t0 + rng.integers(0, span_us, size=n).astype("timedelta64[us]")
    ks = rng.integers(0, 100, size=n)
    return pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, n_users, size=n), pa.int64()),
            "event_type": pa.array(kinds[rng.integers(0, 5, size=n)]),
            "value": pa.array(np.round(rng.exponential(50.0, size=n), 2)),
            "props": pa.array([f'{{"k": {k}}}' for k in ks], pa.string()),
        }
    )


def gen_lineitem(
    rng: np.random.Generator, n_orders: int, n_parts: int, n_supps: int
) -> pa.Table:
    lines_per_order = rng.poisson(4.0, size=n_orders)
    okeys = np.repeat(np.arange(n_orders), lines_per_order)
    n = len(okeys)
    t0 = np.datetime64("1995-01-02").astype("datetime64[us]")
    span_us = 2498 * 86400_000_000  # through 2001-11-04
    flags = np.array(["A", "N", "R"])
    status = np.array(["O", "F"])
    return pa.table(
        {
            "l_orderkey": pa.array(okeys, pa.int64()),
            "l_partkey": pa.array(rng.integers(0, n_parts, size=n), pa.int64()),
            "l_suppkey": pa.array(rng.integers(0, n_supps, size=n), pa.int64()),
            "l_linenumber": pa.array(
                rng.integers(1, 8, size=n).astype(np.int32)
            ),
            "l_quantity": pa.array(
                rng.integers(1, 51, size=n).astype(np.float64)
            ),
            "l_extendedprice": pa.array(
                np.round(rng.uniform(900.0, 105000.0, size=n), 2)
            ),
            "l_discount": pa.array(
                np.round(rng.integers(0, 11, size=n) / 100.0, 2)
            ),
            "l_tax": pa.array(np.round(rng.integers(0, 9, size=n) / 100.0, 2)),
            "l_returnflag": pa.array(flags[rng.integers(0, 3, size=n)]),
            "l_linestatus": pa.array(status[rng.integers(0, 2, size=n)]),
            "l_shipdate": pa.array(
                t0 + rng.integers(0, span_us, size=n).astype("timedelta64[us]"),
                pa.timestamp("us"),
            ),
        }
    )


def gen_customer(rng: np.random.Generator, n: int) -> pa.Table:
    segs = np.array(
        ["MACHINERY", "FURNITURE", "HOUSEHOLD", "BUILDING", "AUTOMOBILE"]
    )
    return pa.table(
        {
            "c_custkey": pa.array(np.arange(n), pa.int64()),
            "c_name": pa.array([f"Customer#{i:09d}" for i in range(n)]),
            "c_nationkey": pa.array(
                rng.integers(0, 25, size=n).astype(np.int32)
            ),
            "c_acctbal": pa.array(
                np.round(rng.uniform(-1000.0, 10000.0, size=n), 2)
            ),
            "c_mktsegment": pa.array(segs[rng.integers(0, 5, size=n)]),
        }
    )


def gen_supplier(rng: np.random.Generator, n: int) -> pa.Table:
    return pa.table(
        {
            "s_suppkey": pa.array(np.arange(n), pa.int64()),
            "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n)]),
            "s_nationkey": pa.array(
                rng.integers(0, 25, size=n).astype(np.int32)
            ),
            "s_acctbal": pa.array(
                np.round(rng.uniform(-1000.0, 10000.0, size=n), 2)
            ),
        }
    )


def gen_part(rng: np.random.Generator, n: int) -> pa.Table:
    adjs = np.array(
        ["blue", "old", "cold", "red", "small", "new", "large", "hot"]
    )
    nouns = np.array(
        ["widget", "anvil", "ring", "gear", "gizmo", "bolt", "plate", "rod"]
    )
    types = np.array(
        ["ECONOMY", "SMALL", "PROMO", "LARGE", "STANDARD", "MEDIUM"]
    )
    names = [
        f"{adjs[rng.integers(0, 8)]} {nouns[rng.integers(0, 8)]}"
        for _ in range(n)
    ]
    return pa.table(
        {
            "p_partkey": pa.array(np.arange(n), pa.int64()),
            "p_name": pa.array(names),
            "p_brand": pa.array(
                [f"Brand#{int(b)}" for b in rng.integers(0, 25, size=n)]
            ),
            "p_type": pa.array(types[rng.integers(0, 6, size=n)]),
            "p_size": pa.array(rng.integers(1, 51, size=n).astype(np.int32)),
            "p_retailprice": pa.array(
                np.round(900.0 + (np.arange(n) % 1000) / 10.0, 1)
            ),
        }
    )


def gen_nation_region() -> tuple[pa.Table, pa.Table]:
    nation = pa.table(
        {
            "n_nationkey": pa.array(np.arange(25).astype(np.int32)),
            "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
            "n_regionkey": pa.array((np.arange(25) % 5).astype(np.int32)),
        }
    )
    region = pa.table(
        {
            "r_regionkey": pa.array(np.arange(5).astype(np.int32)),
            "r_name": pa.array(
                ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
            ),
        }
    )
    return nation, region


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=float, default=10.0,
                    help="multiple of sf0.1 row counts")
    ap.add_argument("--out", default="/tmp/testdata_sf1")
    ap.add_argument("--seed", type=int, default=71)
    ap.add_argument(
        "--tables", default="all",
        help="comma-separated subset to generate (default all 10); "
        "e.g. --tables documents for the g100 linear-family decade, "
        "where generating the 600M-row lineitem would cost 10x the "
        "disk/time of the one table the measured queries read",
    )
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    m = args.mult
    known = {"documents", "embeddings", "orders", "events", "lineitem",
             "customer", "supplier", "part", "nation", "region"}
    wanted = (
        None if args.tables == "all" else set(args.tables.split(","))
    )
    if wanted is not None and (unknown := sorted(wanted - known)):
        # A misspelled table name must error, not print a fake success
        # line with nothing written (ADVICE r07 #3).
        ap.error(f"unknown table(s) {unknown}; valid: {sorted(known)}")

    def want(name: str) -> bool:
        return wanted is None or name in wanted

    if want("documents"):
        pq.write_table(gen_documents(rng, int(5000 * m)),
                       os.path.join(args.out, "documents.parquet"))
    if want("embeddings"):
        pq.write_table(gen_embeddings(rng, int(2000 * m)),
                       os.path.join(args.out, "embeddings.parquet"))
    if want("orders"):
        pq.write_table(gen_orders(rng, int(150000 * m), int(15000 * m)),
                       os.path.join(args.out, "orders.parquet"))
    if want("events"):
        pq.write_table(gen_events(rng, int(100000 * m), int(1500 * m)),
                       os.path.join(args.out, "events.parquet"))
    if want("lineitem"):
        pq.write_table(
            gen_lineitem(rng, int(150000 * m), int(20000 * m), int(1000 * m)),
            os.path.join(args.out, "lineitem.parquet"),
        )
    if want("customer"):
        pq.write_table(gen_customer(rng, int(15000 * m)),
                       os.path.join(args.out, "customer.parquet"))
    if want("supplier"):
        pq.write_table(gen_supplier(rng, int(1000 * m)),
                       os.path.join(args.out, "supplier.parquet"))
    if want("part"):
        pq.write_table(gen_part(rng, int(20000 * m)),
                       os.path.join(args.out, "part.parquet"))
    if want("nation") or want("region"):
        nation, region = gen_nation_region()
        if want("nation"):
            pq.write_table(nation, os.path.join(args.out, "nation.parquet"))
        if want("region"):
            pq.write_table(region, os.path.join(args.out, "region.parquet"))
    done = args.tables if wanted else "ALL 10 tables"
    print(f"wrote {done} x{m} to {args.out}")


if __name__ == "__main__":
    main()
