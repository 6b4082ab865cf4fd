#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracle parity.

Mimics the driver's t2 compare: for each query, read the Spark result
parquet written by graft.Verify and run the DuckDB oracle SQL over the
same scale-factor tables; sort columns by name, sort rows, compare
values exactly (with a tiny float tolerance fallback reported
separately).

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize cell values to strings for exact compare
    def canon(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if pd.isna(v) if not isinstance(v, (list, tuple)) else False:
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        return str(v)
    for c in df.columns:
        df[c] = df[c].map(canon)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            failures += 1
            continue
        try:
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        # schema check: dtype families must agree (the driver may
        # compare schemas strictly; int32-vs-int64 would fail there)
        sd = spark_df.reindex(sorted(spark_df.columns), axis=1)
        dd = duck_df.reindex(sorted(duck_df.columns), axis=1)
        if list(sd.columns) == list(dd.columns):
            for c in sd.columns:
                a, b = str(sd[c].dtype), str(dd[c].dtype)
                if a != b:
                    print(f"WARN {name}: dtype {c}: spark={a} duck={b}")
        s, d = norm(spark_df), norm(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
            failures += 1
            continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
            failures += 1
            continue
        if len(s) == 0 or s.equals(d):
            print(f"OK   {name}: {len(s)} rows x {len(s.columns)} cols")
        else:
            neq = (s != d)
            cells = int(neq.values.sum())
            print(f"FAIL {name}: {cells} mismatched cells of {s.size}")
            mask = neq.any(axis=1)
            print(pd.concat({"spark": s[mask].head(5), "duck": d[mask].head(5)}, axis=1))
            failures += 1
    return failures


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
