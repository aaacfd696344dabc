"""Driver-contract smoke in a VANILLA Spark session (no tuned
builder config) — replicates the external driver's t1 check. Catches
anything that silently depends on xtdb_spark.session.build_spark
settings. Run:  python tools/smoke_vanilla.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

DEFAULT_NAMES = [
    "tpch_q1_pricing_summary",     # flagship (entry())
    "ts_asof_join",                # events table → nanos-timestamp path
    "mm_media_features",           # mapInPandas / arrow path
    "pipe_corpus_prep",            # pipeline composite
    "bitemp_valid_between",        # bitemporal resolution
    "src_info_schema_columns",     # reads every table's schema
]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or DEFAULT_NAMES

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    rows = entry.entry(spark).collect()
    print(f"entry(): {len(rows)} rows, ok")
    qs = entry.queries()
    for name in names:
        n = len(qs[name](spark, sf_dir).collect())
        print(f"{name}: {n} rows, ok")
    n_oracles = len(entry.oracle_sql())
    print(f"{len(qs)} queries, {n_oracles} oracles — smoke ok")


if __name__ == "__main__":
    main()
