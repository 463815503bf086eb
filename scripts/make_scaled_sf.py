"""Measurement-only generator: build an sfK-like dataset by scaling the
observed sf0.1 distributions (TESTDATA.md tables are driver-generated and
read-only; the driver's own BENCH escalation runs at sf1.0, which is not
shipped in /root/testdata). This reproduces the *shapes* that drive query
cost — dense key spaces, the 30-word document vocabulary with 10-100
words/doc and ~2.5% planted near-dup docs, 64-dim float32 embeddings,
single parquet file per table with ~1M-row row groups — so optimizations
can be A/B'd at the driver's measurement scale. It is NOT the driver's
generator: absolute row values differ, only distributions match. No query
path reads this output; bench.py points at it only via SPARK_GRAFT_SF_DIR.

Usage: python scripts/make_scaled_sf.py /tmp/sfbig 10
       (factor is relative to sf0.1: 10 -> sf1.0-like row counts)
"""

from __future__ import annotations

import datetime
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "row",
    "the", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]


def _write(path: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(path, f"{name}.parquet"),
                   row_group_size=1 << 20)
    print(f"{name}: {table.num_rows} rows")


def _ts_array(rng, n: int, start: str, end: str) -> pa.Array:
    t0 = datetime.datetime.fromisoformat(start).timestamp()
    t1 = datetime.datetime.fromisoformat(end).timestamp()
    us = rng.uniform(t0 * 1e6, t1 * 1e6, n).astype("int64")
    return pa.array(us, type=pa.timestamp("us"))


def main(out: str, factor: float) -> None:
    rng = np.random.default_rng(42)
    os.makedirs(out, exist_ok=True)
    n_cust = int(15_000 * factor)
    n_ord = int(150_000 * factor)
    n_part = int(20_000 * factor)
    n_supp = int(1_000 * factor)
    n_ev = int(100_000 * factor)
    n_doc = int(5_000 * factor)
    n_vec = int(2_000 * factor)

    _write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }))
    _write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION{i:02d}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    _write(out, "customer", pa.table({
        "c_custkey": np.arange(n_cust, dtype="int64"),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, n_cust).astype("int32"),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
        "c_mktsegment": np.array(
            ["MACHINERY", "FURNITURE", "AUTOMOBILE", "HOUSEHOLD", "BUILDING"]
        )[rng.integers(0, 5, n_cust)],
    }))
    _write(out, "supplier", pa.table({
        "s_suppkey": np.arange(n_supp, dtype="int64"),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, n_supp).astype("int32"),
        "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
    }))
    _write(out, "part", pa.table({
        "p_partkey": np.arange(n_part, dtype="int64"),
        "p_name": [f"part {i}" for i in range(n_part)],
        "p_brand": np.array([f"Brand#{i}" for i in range(1, 6)])[
            rng.integers(0, 5, n_part)],
        "p_type": np.array(["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY"])[
            rng.integers(0, 5, n_part)],
        "p_size": rng.integers(1, 51, n_part).astype("int32"),
        "p_retailprice": np.round(rng.uniform(900, 2100, n_part), 2),
    }))
    _write(out, "orders", pa.table({
        "o_orderkey": np.arange(n_ord, dtype="int64"),
        "o_custkey": rng.integers(0, n_cust, n_ord),
        "o_orderstatus": np.array(["O", "P", "F"])[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": _ts_array(rng, n_ord, "1995-01-01", "2001-08-01"),
        "o_orderpriority": np.array(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
        )[rng.integers(0, 5, n_ord)],
    }))

    # lineitem: ~4 lines/order (1..7 per order), dense l_orderkey
    lines_per = rng.integers(1, 8, n_ord)
    l_ok = np.repeat(np.arange(n_ord, dtype="int64"), lines_per)
    n_li = len(l_ok)
    l_ln = np.concatenate([np.arange(1, c + 1) for c in lines_per]).astype("int32")
    _write(out, "lineitem", pa.table({
        "l_orderkey": l_ok,
        "l_partkey": rng.integers(0, n_part, n_li),
        "l_suppkey": rng.integers(0, n_supp, n_li),
        "l_linenumber": l_ln,
        "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.uniform(0, 0.1, n_li), 2),
        "l_tax": np.round(rng.uniform(0, 0.08, n_li), 2),
        "l_returnflag": np.array(["N", "A", "R"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["O", "F"])[rng.integers(0, 2, n_li)],
        "l_shipdate": _ts_array(rng, n_li, "1995-01-02", "2001-11-04"),
    }))
    _write(out, "events", pa.table({
        "event_id": np.arange(n_ev, dtype="int64"),
        "ts": _ts_array(rng, n_ev, "2024-01-01", "2024-01-31"),
        "user_id": rng.integers(0, int(1_500 * factor), n_ev),
        "event_type": np.array(["purchase", "error", "view", "signup", "click"])[
            rng.integers(0, 5, n_ev)],
        "value": np.round(rng.uniform(0, 560, n_ev), 2),
        "props": [f'{{"k": {int(v)}}}' for v in rng.integers(0, 100, n_ev)],
    }))

    # documents: 30-word vocab, 10-100 words/doc, ~2.5% of docs planted as
    # near-dup pairs (copy + trailing 'dup' marker, like the base data)
    vocab = np.array(VOCAB)
    n_words = rng.integers(10, 101, n_doc)
    texts = [" ".join(vocab[rng.integers(0, len(vocab), w)]) for w in n_words]
    n_pairs = int(n_doc * 0.0125)
    planted = rng.choice(n_doc, size=2 * n_pairs, replace=False)
    for i in range(n_pairs):
        a, b = int(planted[2 * i]), int(planted[2 * i + 1])
        texts[a] = texts[a] + " dup"
        texts[b] = texts[a]
    _write(out, "documents", pa.table({
        "doc_id": np.arange(n_doc, dtype="int64"),
        "text": texts,
        "lang": np.array(LANGS)[rng.choice(5, n_doc, p=LANG_P)],
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": np.array([len(t) for t in texts], dtype="int64"),
    }))
    _write(out, "embeddings", pa.table({
        "vec_id": np.arange(n_vec, dtype="int64"),
        "embedding": pa.array(
            list(rng.normal(0, 0.12, (n_vec, 64)).astype("float32")),
            type=pa.list_(pa.float32())),
        "label": rng.integers(0, 10, n_vec).astype("int32"),
    }))


if __name__ == "__main__":
    main(sys.argv[1], float(sys.argv[2]) if len(sys.argv) > 2 else 10.0)
