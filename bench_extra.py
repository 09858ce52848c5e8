"""Extra benchmarks (bench.py is FROZEN for driver measurement; everything
exploratory lives here — guide §1.4 noop-sink isolation, §1.5 job labels).

Modes:
  python bench_extra.py noop [query ...]     # noop-sink timing (default headline)
  python bench_extra.py all                  # time EVERY queries() entry once
  python bench_extra.py replay [events] [cpus] [batches]   # one replay cell
                                             # with per-stage byte/time split

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from arc_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary", "q3_segment_revenue", "q5_region_volume",
    "top_orders_per_segment", "events_hourly", "events_json",
    "cdc_lww_events", "dedup_exact_documents", "doc_token_stats",
    "minhash_near_dup", "simhash_near_dup", "knn_brute", "embedding_near_dup",
]


def _warm(spark, sf_dir):
    from pyspark.sql.functions import col

    from arc_spark.cdc.apply import normalize_and_fingerprint, sha256_hex

    region = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    region.select(sha256_hex(col("r_name"))).count()
    normalize_and_fingerprint(
        region.select(col("r_name").alias("content")), impl="arrow"
    ).count()


def mode_noop(names):
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("bench-extra-noop", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    _warm(spark, sf_dir)
    qs = entry_mod.queries()
    out = {}
    for name in names or HEADLINE:
        spark.sparkContext.setJobDescription(f"noop:{name}")
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        # noop sink: computes every column of every row, no sink cost (§1.4)
        df.write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 3)
        spark.sparkContext.setJobDescription(None)
        print(f"# noop {name}: {out[name]}s", file=sys.stderr)
    print(json.dumps({"mode": "noop", "queries": out,
                      "total": round(sum(out.values()), 3)}))
    spark.stop()


def mode_all():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("bench-extra-all", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    _warm(spark, sf_dir)
    qs = entry_mod.queries()
    out = {}
    for name, fn in qs.items():
        spark.sparkContext.setJobDescription(f"all:{name}")
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        out[name] = round(time.time() - t0, 3)
        spark.sparkContext.setJobDescription(None)
        print(f"# {name}: {out[name]}s ({n} rows)", file=sys.stderr)
    print(json.dumps({"mode": "all", "queries": out,
                      "total": round(sum(out.values()), 3)}))
    spark.stop()


def mode_replay(argv):
    """One replay cell with stage metrics — the bench.py _cdc_replay shape
    (cold lake, warmed session) plus a per-stage top-10 cost table."""
    import shutil
    import tempfile
    import urllib.request

    n_events = int(argv[0]) if argv else 2_000_000
    cpus = argv[1] if len(argv) > 1 else "16"
    batches = int(argv[2]) if len(argv) > 2 else 2

    from arc_spark.cdc.apply import last_writer_wins, normalize_and_fingerprint
    from arc_spark.cdc.bootstrap import create_table_for_stream
    from arc_spark.cdc.generator import change_stream, write_change_stream
    from arc_spark.cdc.runner import ReplayRunner

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    gen = get_spark("bx-gen", master="local[32]", shuffle_partitions=64)
    gen.sparkContext.setLogLevel("ERROR")
    stream_dir = tempfile.mkdtemp(prefix="bx_stream_")
    stream = write_change_stream(
        gen, os.path.join(stream_dir, "ev"), n_events, seed=42,
        num_partitions=128,
    )
    gen.stop()

    conf = {"spark.ui.enabled": "true"}
    if shm:
        conf["spark.local.dir"] = f"{shm}/sparktmp"
    spark = get_spark(
        f"bx-replay-{cpus}", master=f"local[{cpus}]", shuffle_partitions=64,
        extra_conf=conf,
    )
    spark.sparkContext.setLogLevel("ERROR")
    lake = tempfile.mkdtemp(prefix="bx_lake_", dir=shm)
    try:
        warm = normalize_and_fingerprint(change_stream(spark, 2000, num_partitions=8))
        last_writer_wins(warm, ["repo", "path"], "seq").write.mode(
            "overwrite"
        ).parquet(os.path.join(lake, "warm"))
        table, _ = create_table_for_stream(
            spark, stream, os.path.join(lake, "t"), num_buckets=64
        )
        batch = (n_events + batches - 1) // batches
        runner = ReplayRunner(spark, stream, table, batch_size=batch)
        base = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId

        def stages():
            with urllib.request.urlopen(
                f"{base}/api/v1/applications/{app}/stages?status=complete",
                timeout=10,
            ) as r:
                return json.loads(r.read())

        seen = {s["stageId"] for s in stages()}
        t0 = time.time()
        runner.run()
        wall = time.time() - t0
        new = [s for s in stages() if s["stageId"] not in seen]
        new.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        print(f"replay {n_events} ev local[{cpus}] x{batches} epochs: "
              f"{wall:.2f}s = {n_events/wall:,.0f} ev/s", file=sys.stderr)
        for s in new[:14]:
            print(
                f"  stage {s['stageId']:>4} tasks={s['numCompleteTasks']:>3} "
                f"run={s.get('executorRunTime', 0)/1000:7.2f}s "
                f"cpu={s.get('executorCpuTime', 0)/1e9:7.2f}s "
                f"shW={s.get('shuffleWriteBytes', 0)>>20}M "
                f"shR={s.get('shuffleReadBytes', 0)>>20}M "
                f"in={s.get('inputBytes', 0)>>20}M "
                f"out={s.get('outputBytes', 0)>>20}M",
                file=sys.stderr,
            )
        print(json.dumps({"mode": "replay", "events_per_sec": round(n_events / wall, 1),
                          "wall_sec": round(wall, 2), "cpus": cpus,
                          "batches": batches, "n_events": n_events}))
    finally:
        shutil.rmtree(lake, ignore_errors=True)
        shutil.rmtree(stream_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "noop"
    if mode == "noop":
        mode_noop(sys.argv[2:])
    elif mode == "all":
        mode_all()
    elif mode == "replay":
        mode_replay(sys.argv[2:])
    else:
        raise SystemExit(f"unknown mode {mode!r}")
