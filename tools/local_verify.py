#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/local_verify.py <verify_out_dir> <sf_dir>

Loads each <out_dir>/<name> parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB over <sf_dir>/*.parquet
tables, then compares: schema (column names), row count, and a hash of
values with columns sorted by name and rows sorted by all columns.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True,
                            key=lambda s: s.astype(str))
    return df.reset_index(drop=True)


def df_hash(df: pd.DataFrame) -> str:
    import hashlib
    h = hashlib.sha256()
    for c in df.columns:
        h.update(c.encode())
        for v in df[c]:
            if isinstance(v, float):
                v = repr(round(v, 9))
            h.update(str(v).encode())
            h.update(b"\x00")
    return h.hexdigest()


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    import glob
    names = sorted(n.rsplit("/", 1)[-1] for n in glob.glob(f"{out_dir}/*")
                   if not n.endswith(".json"))
    n_pass = n_fail = n_noracle = 0
    for name in names:
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL  {name}: cannot read spark result: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            status = "ROWS>0" if len(spark_df) > 0 else "EMPTY!"
            if status == "EMPTY!":
                n_fail += 1
                print(f"WEAK  {name}: no oracle, {status} ({len(spark_df)} rows)")
            else:
                n_noracle += 1
                print(f"noorc {name}: rows={len(spark_df)} ok")
            continue
        try:
            oracle_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        a, b = canon(spark_df), canon(oracle_df)
        problems = []
        if list(a.columns) != list(b.columns):
            problems.append(f"schema {list(a.columns)} vs {list(b.columns)}")
        elif len(a) != len(b):
            problems.append(f"rows {len(a)} vs {len(b)}")
        elif df_hash(a) != df_hash(b):
            problems.append("hash mismatch")
            diff = (a.astype(str) != b.astype(str))
            bad = diff.any(axis=1)
            if bad.any():
                i = bad.idxmax()
                problems.append(
                    f"first diff row {i}: spark={a.loc[i].to_dict()} "
                    f"oracle={b.loc[i].to_dict()}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(a)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} no-oracle")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
