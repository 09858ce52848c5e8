"""Per-query, per-stage profiling via the UI REST API (guide §1/§7).

Usage: python scripts/profile_queries.py [query ...]  (default: headline)
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, ARC_PROF_REPS (default 2)
"""
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from arc_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary", "q3_segment_revenue", "q5_region_volume",
    "top_orders_per_segment", "events_hourly", "events_json",
    "cdc_lww_events", "dedup_exact_documents", "doc_token_stats",
    "minhash_near_dup", "simhash_near_dup", "knn_brute", "embedding_near_dup",
]


def stages(spark):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app}/stages?status=complete", timeout=10
    ) as r:
        return json.loads(r.read())


def main():
    names = sys.argv[1:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    reps = int(os.environ.get("ARC_PROF_REPS", "2"))
    spark = get_spark("profile", master=f"local[{cpus}]",
                      extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    # warm like bench.py does
    from pyspark.sql.functions import col
    from arc_spark.cdc.apply import normalize_and_fingerprint, sha256_hex
    region = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    region.select(sha256_hex(col("r_name"))).count()
    normalize_and_fingerprint(region.select(col("r_name").alias("content")), impl="arrow").count()

    qs = entry_mod.queries()
    for name in names:
        times = []
        for rep in range(reps):
            seen = {s["stageId"] for s in stages(spark)}
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            n = df.count()
            wall = time.time() - t0
            times.append(wall)
            if rep == reps - 1:
                new = [s for s in stages(spark) if s["stageId"] not in seen]
                new.sort(key=lambda s: -(s.get("executorRunTime") or 0))
                print(f"\n== {name}: walls={[round(t,3) for t in times]} rows={n}  stages={len(new)}")
                for s in new[:12]:
                    dur = None
                    if s.get("firstTaskLaunchedTime") and s.get("completionTime"):
                        pass
                    print(
                        f"   stage {s['stageId']:>4} tasks={s['numCompleteTasks']:>3} "
                        f"runTime={s.get('executorRunTime',0)/1000:7.2f}s "
                        f"cpuTime={s.get('executorCpuTime',0)/1e9:7.2f}s "
                        f"shW={s.get('shuffleWriteBytes',0)>>10}K shR={s.get('shuffleReadBytes',0)>>10}K "
                        f"in={s.get('inputBytes',0)>>10}K  {s.get('name','')[:60]}"
                    )
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
