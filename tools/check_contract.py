"""Local mirror of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir,
compare row count, column names, and order-insensitive values.

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype(np.int64)
        elif df[c].dtype == bool:
            df[c] = df[c].astype(bool)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from prefix_filter_spark.session import get_spark

    spark = get_spark(app_name="contract-check", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"[FAIL-spark] {name}: {e}")
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"[rows-only] {name}: {len(got)} rows")
            continue
        try:
            want = con.execute(sql).df()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"[FAIL-duck ] {name}: {e}")
            continue
        if sorted(got.columns) != sorted(want.columns):
            failures.append((name, f"schema {sorted(got.columns)} vs {sorted(want.columns)}"))
            print(f"[FAIL-schem] {name}: {sorted(got.columns)} vs {sorted(want.columns)}")
            continue
        if len(got) != len(want):
            failures.append((name, f"rows {len(got)} vs {len(want)}"))
            print(f"[FAIL-rows ] {name}: {len(got)} vs {len(want)}")
            continue
        g, w = normalize(got), normalize(want)
        if not g.equals(w):
            diff_cols = [c for c in g.columns if not g[c].equals(w[c])]
            detail = []
            for c in diff_cols[:3]:
                neq = g[c] != w[c]
                i = int(np.argmax(neq.to_numpy()))
                detail.append(f"{c}[{i}]: {g[c][i]!r} vs {w[c][i]!r}")
            failures.append((name, f"values differ in {diff_cols}: {detail}"))
            print(f"[FAIL-value] {name}: {diff_cols} {detail}")
            continue
        print(f"[OK        ] {name}: {len(got)} rows")
    print()
    if failures:
        print(f"{len(failures)} FAILURES:", [f[0] for f in failures])
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
