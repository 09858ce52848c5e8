"""Capture .explain('formatted') for headline (and optionally all) queries.

Usage: python scripts/capture_plans.py <suffix> [query ...]
Writes plans/r06/<query>_<suffix>.txt
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from arc_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary", "q3_segment_revenue", "q5_region_volume",
    "top_orders_per_segment", "events_hourly", "events_json",
    "cdc_lww_events", "dedup_exact_documents", "doc_token_stats",
    "minhash_near_dup", "simhash_near_dup", "knn_brute", "embedding_near_dup",
]


def main():
    suffix = sys.argv[1]
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plans", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{suffix}.txt ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
