"""Local stand-in for the driver's correctness harness.

Runs every __spark_entry__.queries() entry at a given SF and compares it to
its oracle_sql() via DuckDB: row count, sorted column names, and exact cell
values after sorting columns by name and rows by all columns. Stricter than
the driver's order-insensitive hash — if this passes, the hash passes.

Usage: python scripts/verify_local.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            # arrays/lists → tuples so they sort/compare
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple, np.ndarray)) else v
            )
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df


def cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) or pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    return a == b


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_df) != len(oracle_df):
        problems.append(f"row count: spark={len(spark_df)} oracle={len(oracle_df)}")
    sc, oc = sorted(spark_df.columns), sorted(oracle_df.columns)
    if sc != oc:
        problems.append(f"columns: spark={sc} oracle={oc}")
        return problems
    if problems:
        return problems
    s, o = normalize(spark_df), normalize(oracle_df)
    for c in s.columns:
        col_s, col_o = s[c].tolist(), o[c].tolist()
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(col_s, col_o)) if not cells_equal(x, y)
        ]
        if bad:
            i, x, y = bad[0]
            problems.append(
                f"column {c}: {len(bad)}/{len(col_s)} cells differ; first at sorted-row {i}: "
                f"spark={x!r} oracle={y!r} (dtype s={s[c].dtype} o={o[c].dtype})"
            )
    return problems


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--vanilla"]
    vanilla = "--vanilla" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as se

    if vanilla:
        # the driver's consumption path: a plain session, none of get_spark's
        # tuning — catches configs the engine silently depends on
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").appName("verify-vanilla").getOrCreate()
    else:
        from mysql_hbase_replicator_spark.session import get_spark

        spark = get_spark(app_name="verify-local")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = se.queries(), se.oracle_sql()
    names = [n for n in qs if not only or n in only]
    n_pass = n_fail = n_rowsonly = 0
    failures = {}
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            n_fail += 1
            failures[name] = f"SPARK ERROR: {exc}"
            print(f"FAIL  {name}: spark error: {str(exc)[:300]}")
            continue
        if name not in oracles:
            n_rowsonly += 1
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            n_fail += 1
            failures[name] = f"ORACLE ERROR: {exc}"
            print(f"FAIL  {name}: oracle error: {str(exc)[:300]}")
            continue
        problems = compare(name, sdf, odf)
        if problems:
            n_fail += 1
            failures[name] = "; ".join(problems)
            print(f"FAIL  {name}: {'; '.join(problems)[:500]}")
        else:
            n_pass += 1
            print(f"pass  {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only, sf={sf_dir}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
