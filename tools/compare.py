#!/usr/bin/env python3
"""Local replica of the driver's correctness gate — dtype-strict.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (Spark output), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the fixture
tables, and reports exact-match status per query.

Round-1 lesson: the driver hashes Arrow values, so a DuckDB HUGEINT
(decimal128) vs Spark int64 mismatch FAILS at the driver even when pandas
coerces the values equal. This replica therefore compares Arrow-level type
classes strictly (int-vs-decimal, int-vs-float are failures; tz/unit and
string/large_string differences are normalized, since round-1 evidence shows
the driver tolerates those).

Also times each oracle SQL (3 runs, min) and writes
<verifyOutDir>/oracle_times.json so bench ratios are per-query facts.
"""
import json
import sys
import time

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def type_class(t: pa.DataType) -> str:
    """Collapse an Arrow type to the class the driver's hash is sensitive to."""
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        return "timestamp"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{type_class(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{type_class(f.type)}" for f in t)
        return f"struct<{inner}>"
    return str(t)


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
    oracle_times = {}
    for name, sql in sorted(oracle.items()):
        try:
            spark_tbl = pq.read_table(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            failures += 1
            continue
        try:
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                duck_tbl = con.execute(sql).arrow()
                best = min(best, time.perf_counter() - t0)
            oracle_times[name] = round(best, 4)
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        spark_types = {f.name: type_class(f.type) for f in spark_tbl.schema}
        duck_types = {f.name: type_class(f.type) for f in duck_tbl.schema}
        if sorted(spark_types) != sorted(duck_types):
            print(f"FAIL {name}: columns spark={sorted(spark_types)} "
                  f"oracle={sorted(duck_types)}")
            failures += 1
            continue
        dtype_bad = [(c, spark_types[c], duck_types[c])
                     for c in spark_types if spark_types[c] != duck_types[c]]
        if dtype_bad:
            print(f"FAIL {name}: dtype mismatch (driver hash fails on this): "
                  f"{dtype_bad}")
            failures += 1
            continue
        spark_df = canon(spark_tbl.to_pandas())
        duck_df = canon(duck_tbl.to_pandas())
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows spark={len(spark_df)} oracle={len(duck_df)}")
            failures += 1
            continue
        mismatch = None
        for c in spark_df.columns:
            a, b = spark_df[c], duck_df[c]
            try:
                an, bn = a.isna(), b.isna()
                if not (an.values == bn.values).all():
                    mismatch = (c, "null pattern")
                    break
                av, bv = a[an.values == False], b[bn.values == False]  # noqa: E712
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
            print(f"PASS {name} ({len(spark_df)} rows, oracle {oracle_times[name]}s)")
    with open(f"{out_dir}/oracle_times.json", "w") as f:
        json.dump({"sf": sf_dir, "times": oracle_times,
                   "total": round(sum(oracle_times.values()), 3)}, f, indent=1)
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match; "
          f"oracle total {sum(oracle_times.values()):.1f}s "
          f"(written to {out_dir}/oracle_times.json)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
