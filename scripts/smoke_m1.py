"""Dev smoke: lint verdicts Spark vs DuckDB oracle at sf0.001."""
import sys

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd

from serbian_osm_lint_spark.session import get_spark
from serbian_osm_lint_spark import synth
from serbian_osm_lint_spark.operators import checks

SF = "/root/testdata/sf0.001"

spark = get_spark(cpus=8)
docs = synth.docs_df(spark, SF)
docs.cache()
print("docs:", docs.count())
docs.show(3, truncate=120)

wiki = synth.wiki_pages_df(spark, SF)
wd = synth.wikidata_items_df(spark, SF)
v = checks.lint_verdicts_df(spark, docs, wiki, wd)
sdf = v.toPandas().sort_values(["doc_id", "map_name", "check_name"]).reset_index(drop=True)
print("spark verdicts:", len(sdf))

con = duckdb.connect()
con.execute(f"CREATE VIEW customer AS SELECT * FROM '{SF}/customer.parquet'")
sql = checks.sql_lint_verdicts(synth.sql_scalar_tags(), synth.sql_wiki_pages(), synth.sql_wikidata_items())
odf = con.execute(sql).df().sort_values(["doc_id", "map_name", "check_name"]).reset_index(drop=True)
print("oracle verdicts:", len(odf))

sdf["fixable"] = sdf["fixable"].astype(bool)
odf["fixable"] = odf["fixable"].astype(bool)
try:
    pd.testing.assert_frame_equal(sdf, odf, check_dtype=False)
    print("MATCH ✅")
except AssertionError as e:
    print("MISMATCH ❌")
    merged = sdf.merge(odf, on=["doc_id", "map_name", "check_name"], suffixes=("_s", "_o"))
    bad = merged[(merged.result_s != merged.result_o) | (merged.message_s != merged.message_o) | (merged.fixable_s != merged.fixable_o)]
    print(bad.head(30).to_string())
    print("bad rows:", len(bad))
    print(str(e)[:2000])
