#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run Verify's parquet
dumps against the oracle SQL executed in DuckDB over the same sf dir, and
compare (schema-sorted columns, row-order-sensitive values).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result written"); n_fail += 1; continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        spark_df = spark_df.reindex(sorted(spark_df.columns), axis=1).reset_index(drop=True)
        duck_df = duck_df.reindex(sorted(duck_df.columns), axis=1).reset_index(drop=True)
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns {list(spark_df.columns)} vs {list(duck_df.columns)}")
            n_fail += 1; continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}")
            n_fail += 1; continue
        dt = [(c, str(spark_df[c].dtype), str(duck_df[c].dtype))
              for c in spark_df.columns
              if str(spark_df[c].dtype) != str(duck_df[c].dtype)]
        if dt:
            print(f"FAIL {name}: dtype mismatch {dt}")
            n_fail += 1; continue
        # value compare, exact (both sides already rounded per contract)
        mism = []
        for c in spark_df.columns:
            a, b = spark_df[c], duck_df[c]
            try:
                eq = (a.astype(str).values == b.astype(str).values)
            except Exception:
                eq = a.values == b.values
            bad = (~eq).sum()
            if bad:
                mism.append((c, int(bad)))
        if mism:
            print(f"FAIL {name}: value mismatches {mism}")
            i = next(i for i in range(len(spark_df))
                     if any(str(spark_df[c][i]) != str(duck_df[c][i]) for c, _ in mism))
            print(f"  first diff row {i}:\n  spark: {spark_df.iloc[i].to_dict()}\n  duck : {duck_df.iloc[i].to_dict()}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
