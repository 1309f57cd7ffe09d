"""Emulate the driver's verify protocol against __spark_entry__.py.

Fresh-process consumption of the module surface: smoke entry(spark) at
sf0.001, then run every queries() entry at sf0.01 side-by-side with its
oracle_sql() on DuckDB and compare row-count + schema + order-insensitive
value hash. Usage: python scripts/driver_emulation.py [sf_dir]
"""
import hashlib
import importlib.util
import json
import sys

import duckdb
import pandas as pd

ENTRY = "/root/repo/__spark_entry__.py"
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

spec = importlib.util.spec_from_file_location("__spark_entry__", ENTRY)
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from serbian_osm_lint_spark.session import get_spark  # noqa: E402

spark = get_spark("driver-emulation", cpus=8)

# t1 smoke
edf = mod.entry(spark)
rows = edf.collect()
print(f"entry: rows={len(rows)} schema={[f.name for f in edf.schema.fields]}")
assert len(rows) >= 0

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
results = {}
ok = True
for name, fn in sorted(queries.items()):
    sdf = norm(fn(spark, SF).toPandas())
    if name not in oracles:
        results[name] = {"rows": len(sdf), "oracle": "none"}
        continue
    odf = norm(con.execute(oracles[name]).df())
    match = (
        list(sdf.columns) == list(odf.columns)
        and len(sdf) == len(odf)
        and vhash(sdf) == vhash(odf)
    )
    results[name] = {
        "rows": len(sdf),
        "oracle_rows": len(odf),
        "schema_match": list(sdf.columns) == list(odf.columns),
        "value_match": match,
    }
    ok = ok and match
print(json.dumps(results, indent=2))
print("ALL MATCH" if ok else "MISMATCH", f"({len(queries)} queries, sf={SF})")
sys.exit(0 if ok else 1)
