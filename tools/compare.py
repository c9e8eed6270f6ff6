#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (Spark output), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the fixture
tables, canonicalizes both sides (columns sorted by name, rows sorted by all
columns), and reports exact-match status per query.
"""
import json
import sys

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            failures += 1
            continue
        try:
            duck_df = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns spark={list(spark_df.columns)} "
                  f"oracle={list(duck_df.columns)}")
            failures += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows spark={len(spark_df)} oracle={len(duck_df)}")
            failures += 1
            continue
        # exact value compare, column by column (dtype-tolerant via repr)
        mismatch = None
        for c in spark_df.columns:
            a, b = spark_df[c], duck_df[c]
            try:
                import numpy as np
                an, bn = a.isna(), b.isna()
                if not (an == bn).all():
                    mismatch = (c, "null pattern")
                    break
                av, bv = a[~an], b[~bn]
                if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                    eq = (av.astype(float).values == bv.astype(float).values)
                else:
                    eq = (av.astype(str).values == bv.astype(str).values)
                if not eq.all():
                    bad = (~eq).nonzero()[0][:3]
                    mismatch = (c, [(av.iloc[i], bv.iloc[i]) for i in bad])
                    break
            except Exception as e:
                mismatch = (c, f"compare error: {e}")
                break
        if mismatch:
            print(f"FAIL {name}: col {mismatch[0]}: {mismatch[1]}")
            failures += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
