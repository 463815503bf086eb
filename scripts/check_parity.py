"""Local replica of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01; compare
row-count, column names, and an order-insensitive value hash.

Usage: python scripts/check_parity.py [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(
        tuple(("NULL" if pd.isna(v) else repr(v)) for v in row)
        for row in df.itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update("|".join(r).encode())
    return h.hexdigest()[:16]


def main(names: list[str]) -> int:
    from fundcrawler_spark.entry_queries import QUERIES, resolve_oracle
    from fundcrawler_spark.session import get_spark

    spark = get_spark(app_name="parity", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    targets = names or list(QUERIES)
    n_fail = 0
    for name in targets:
        fn, sql = QUERIES[name]
        sql = resolve_oracle(sql)
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e)[:200]}")
            n_fail += 1
            continue
        if sql is None:
            print(f"ROWS {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:200]}")
            n_fail += 1
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} != {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} != {sorted(odf.columns)}")
        if not problems:
            hs, ho = value_hash(sdf), value_hash(odf)
            if hs != ho:
                problems.append(f"value-hash {hs} != {ho}")
                # show first differing rows for debugging
                a = sdf[sorted(sdf.columns)].astype(str).sort_values(by=sorted(sdf.columns)).reset_index(drop=True)
                b = odf[sorted(odf.columns)].astype(str).sort_values(by=sorted(odf.columns)).reset_index(drop=True)
                if len(a) == len(b):
                    neq = (a != b).any(axis=1)
                    if neq.any():
                        i = neq.idxmax()
                        problems.append(f"first diff @{i}:\n  spark : {a.iloc[i].to_dict()}\n  duckdb: {b.iloc[i].to_dict()}")
        status = "OK  " if not problems else "FAIL"
        if problems:
            n_fail += 1
        print(f"{status} {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]"
              + ("" if not problems else " — " + "; ".join(problems)))
    spark.stop()
    return n_fail


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1:]) else 0)
