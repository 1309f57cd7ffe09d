"""Targeted subset of the driver-emulation verify: run only the named
queries()/oracle_sql() entries (all when none given) at sf0.01 — the
fast inner loop while optimizing a single operator.

Usage: python scripts/check_queries.py [query ...]
       SF=/root/testdata/sf0.001 python scripts/check_queries.py knn_dup_names
"""
import hashlib
import importlib.util
import os
import sys

import duckdb
import pandas as pd

ENTRY = "/root/repo/__spark_entry__.py"
SF = os.environ.get("SF", "/root/testdata/sf0.01")

spec = importlib.util.spec_from_file_location("__spark_entry__", ENTRY)
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from serbian_osm_lint_spark.session import get_spark  # noqa: E402

spark = get_spark("check-queries", cpus=8)
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
for name in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{SF}/{name}.parquet'")


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def vhash(df: pd.DataFrame) -> str:
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()


queries, oracles = mod.queries(), mod.oracle_sql()
names = sys.argv[1:] or sorted(queries)
ok = True
for name in names:
    sdf = norm(queries[name](spark, SF).toPandas())
    odf = norm(con.execute(oracles[name]).df())
    match = len(sdf) == len(odf) and list(sdf.columns) == list(odf.columns) and vhash(sdf) == vhash(odf)
    ok = ok and match
    print(f"{name}: rows={len(sdf)}/{len(odf)} match={match}", flush=True)
print("ALL MATCH" if ok else "MISMATCH")
sys.exit(0 if ok else 1)
