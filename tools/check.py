#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run graft.Verify (done by
caller via sbt), then execute each oracle_sql.json entry in DuckDB over the
same parquet tables and compare with the Spark parquet dumps.

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import sys, json, glob, math
from decimal import Decimal

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True,
                            key=lambda s: s.astype(str))
    return df.reset_index(drop=True)


def cmp_cell(a, b) -> bool:
    """Mimic the driver's hash comparison: representation-sensitive.

    The driver canonicalizes each cell to a string and hashes, so a
    Decimal('0.50000000') vs float 0.5 is a FAIL even though the values are
    numerically equal — round 1 proved the old float-coercing compare here
    was blind to exactly that (claimed 57/57 while the driver found 7
    failures). Decimals therefore compare as exact Decimals only against
    other Decimals; float-vs-Decimal is a type mismatch (the engine should
    not emit DECIMAL where the oracle emits DOUBLE, or vice versa).
    """
    if pd.isna(a) and pd.isna(b):
        return True
    da, db = isinstance(a, Decimal), isinstance(b, Decimal)
    if da or db:
        return da and db and a == b
    if isinstance(a, float) or isinstance(b, float):
        # int-vs-float is a FAIL: the driver hashes string renderings, so
        # Spark int64 40 vs DuckDB float64 40.0 ("40" vs "40.0") mismatches.
        # DuckDB HUGEINT outputs (e.g. window SUM(BIGINT) descendants) land
        # in pandas as float64 — the oracle SQL must CAST them to BIGINT.
        if not (isinstance(a, float) and isinstance(b, float)):
            return False
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b  # bit-exact — the gate hashes, so we demand exact too
    return a == b or str(a) == str(b)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"[MISS] {name}: no spark output")
            n_fail += 1
            continue
        spark_df = canon(pd.concat([pd.read_parquet(f) for f in files]))
        try:
            duck_df = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"[ORACLE-ERR] {name}: {str(e)[:200]}")
            n_fail += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"[SCHEMA] {name}: spark={list(spark_df.columns)} "
                  f"duck={list(duck_df.columns)}")
            n_fail += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"[ROWS] {name}: spark={len(spark_df)} duck={len(duck_df)}")
            n_fail += 1
            continue
        bad = None
        for col in spark_df.columns:
            sv, dv = spark_df[col].tolist(), duck_df[col].tolist()
            for i, (a, b) in enumerate(zip(sv, dv)):
                if not cmp_cell(a, b):
                    bad = (col, i, a, b)
                    break
            if bad:
                break
        if bad:
            col, i, a, b = bad
            print(f"[VALUE] {name}: col={col} row={i} spark={a!r} duck={b!r}")
            n_fail += 1
        else:
            print(f"[PASS] {name} ({len(spark_df)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
