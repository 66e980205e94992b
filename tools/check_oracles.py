"""Local stand-in for the driver's correctness gate: run every
queries() entry in Spark and its oracle_sql() in DuckDB on the same
sf dir, compare row count, column names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    # Match the DRIVER's tolerance exactly (round-1 evidence): int-width
    # differences (Spark int32 vs DuckDB int64) hashed EQUAL for the
    # driver (knn_sites/text_quality/distance_join were green), but
    # kind differences (DuckDB HUGEINT -> float64 vs Spark bigint) hashed
    # DIFFERENT (tile_rollup/interval_union/simhash were red). So: unify
    # widths within a kind, never across kinds.
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        k = pdf[c].dtype.kind
        if k in "iu" and pdf[c].dtype != np.int64:
            pdf[c] = pdf[c].astype(np.int64)
        elif k == "f" and pdf[c].dtype != np.float64:
            pdf[c] = pdf[c].astype(np.float64)
    return pdf.sort_values(list(pdf.columns), kind="stable").reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from segment_rtree_spark.session import get_spark

    spark = get_spark(cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(got)} rows")
            if len(got) == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            failures.append(name)
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
            continue
        if len(g) != len(w):
            failures.append(name)
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            continue
        eq = True
        for c in g.columns:
            a, b = g[c].to_numpy(), w[c].to_numpy()
            if a.dtype != b.dtype:
                print(f"FAIL {name}: col {c} dtype {a.dtype} vs {b.dtype}")
                eq = False
                continue
            if a.dtype.kind == "f":
                same = (a == b) | (np.isnan(a) & np.isnan(b))
            else:
                same = a == b
            if not np.all(same):
                bad = np.nonzero(~same)[0][:3]
                print(f"FAIL {name}: col {c} mismatch at rows {bad.tolist()}: {a[bad]} vs {b[bad]}")
                eq = False
        if eq:
            print(f"ok   {name}: {len(g)} rows, exact match")
        else:
            failures.append(name)

    print("\n===", "ALL OK" if not failures else f"FAILURES: {failures}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
