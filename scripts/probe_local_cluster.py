"""N vs 4N *executor* scaling probe using Spark's local-cluster mode.

``local[k]`` scales executor THREADS inside one JVM; the judged criterion
is executor COUNT (``spark-submit ... --num-executors N`` vs ``4N``).
``local-cluster[W,C,M]`` is the closest single-box rendering: it launches
W real standalone workers, each hosting its own executor JVM with its own
heap, GC, shuffle server, and Python-worker pool — the engine code is
shipped to them via ``--py-files`` semantics (``spark.submit.pyFiles``
pointing at the zip built by ``python -m arc_spark.submit``), exactly as
a production submit would.

Protocol (mirrors bench.py `_cdc_replay`): pre-generated change
stream(s), cold lake per rep, interleaved reps at 1 executor and 4
executors (4 cores each), best-of reported with all samples.

Two regimes:
- ``strong`` (default): SAME input at both executor counts — the judged
  N→4N criterion read literally; on one box the 4-executor level
  contends for the same memory bus, so this is the pessimistic bound.
- ``weak``: N events on 1 executor vs 4N events on 4 executors — each
  executor owns the same per-executor workload, which is the regime a
  real cluster resize operates in (more machines AND more data). Ideal
  throughput is 4x the low level; efficiency uses the same
  tp_high / (4 * tp_low) formula.

Run:  python scripts/probe_local_cluster.py [n_events] [reps] [mode]
      (mode: strong | weak | both)
Emits one JSON line per mode, suitable for pasting into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arc_spark.session import get_spark  # noqa: E402

SHM = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()


def _build_pyfiles_zip() -> str:
    out = os.path.join(SHM, "arc_spark_probe.zip")
    subprocess.run(
        [sys.executable, "-m", "arc_spark.submit", f"--out={out}"],
        check=True,
        capture_output=True,
    )
    return out


def _replay(master: str, zip_path: str, stream_path: str, n_events: int) -> float:
    from arc_spark.cdc.apply import last_writer_wins, normalize_and_fingerprint
    from arc_spark.cdc.bootstrap import create_table_for_stream
    from arc_spark.cdc.generator import change_stream
    from arc_spark.cdc.runner import ReplayRunner

    conf = {
        "spark.ui.showConsoleProgress": "false",
        "spark.local.dir": os.path.join(SHM, "sparktmp"),
        # ship the engine to the executor JVMs the spark-submit way
        "spark.submit.pyFiles": zip_path,
        "spark.executor.memory": os.environ.get("ARC_PROBE_EXEC_MEM", "5g"),
        # keep rep-to-rep plans identical to bench.py's replay
    }
    spark = get_spark(
        f"lc-probe-{master.replace(',', '_')}",
        master=master,
        shuffle_partitions=64,
        extra_conf=conf,
    )
    spark.sparkContext.setLogLevel("ERROR")
    # spark.submit.pyFiles is honored by spark-submit; when launching the
    # session programmatically the runtime equivalent is addPyFile (same
    # mechanism: zip shipped to every executor, prepended to sys.path)
    spark.sparkContext.addPyFile(zip_path)
    lake_dir = tempfile.mkdtemp(prefix="lc_lake_", dir=SHM)
    try:
        # warmup: codegen, Arrow workers on EVERY executor, parquet write
        warm = normalize_and_fingerprint(change_stream(spark, 2000, num_partitions=8))
        last_writer_wins(warm, ["repo", "path"], "seq").write.mode(
            "overwrite"
        ).parquet(os.path.join(lake_dir, "warm"))

        table, _ = create_table_for_stream(
            spark, stream_path, os.path.join(lake_dir, "t"), num_buckets=64
        )
        batch = (n_events + 1) // 2  # 2 epochs, like bench.py
        runner = ReplayRunner(
            spark, stream_path, table, batch_size=batch, strategy="thin",
            # ARC_PROBE_FINGERPRINT=jvm removes every Python stage from
            # the epoch — isolates whether multi-JVM Python worker pools
            # are the one-box bottleneck (round-4 kernel A/B lever)
            fingerprint=os.environ.get("ARC_PROBE_FINGERPRINT", "arrow"),
        )
        t0 = time.time()
        runner.run()
        return n_events / (time.time() - t0)
    finally:
        shutil.rmtree(lake_dir, ignore_errors=True)
        spark.stop()
        time.sleep(2)  # let standalone workers tear down before the next rep


def _gen_stream(path: str, n_events: int) -> None:
    gen_spark = get_spark("lc-gen", master="local[16]", shuffle_partitions=32)
    from arc_spark.cdc.generator import write_change_stream

    shutil.rmtree(path, ignore_errors=True)
    t0 = time.time()
    write_change_stream(gen_spark, path, n_events, seed=42, num_partitions=64)
    print(f"gen {n_events} ev in {time.time() - t0:.1f}s", file=sys.stderr)
    gen_spark.stop()
    time.sleep(2)


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    mode = sys.argv[3] if len(sys.argv) > 3 else "strong"

    zip_path = _build_pyfiles_zip()
    stream_path = os.path.join(SHM, "lc_stream")
    _gen_stream(stream_path, n_events)
    stream_4x = None
    if mode in ("weak", "both"):
        stream_4x = os.path.join(SHM, "lc_stream_4x")
        _gen_stream(stream_4x, 4 * n_events)

    low_master = "local-cluster[1,4,6144]"
    high_master = "local-cluster[4,4,6144]"
    regimes = {"strong": ["strong"], "weak": ["weak"],
               "both": ["strong", "weak"]}[mode]
    for regime in regimes:
        high_stream = stream_path if regime == "strong" else stream_4x
        high_events = n_events if regime == "strong" else 4 * n_events
        samples: dict[str, list[float]] = {"low": [], "high": []}
        for rep in range(reps):  # interleaved: host drift hits both alike
            for level, master, st, ne in (
                ("low", low_master, stream_path, n_events),
                ("high", high_master, high_stream, high_events),
            ):
                tp = _replay(master, zip_path, st, ne)
                samples[level].append(round(tp, 1))
                print(f"[{regime}] rep{rep} {master} {tp:,.0f} ev/s",
                      file=sys.stderr)

        tp_low, tp_high = max(samples["low"]), max(samples["high"])
        print(
            json.dumps(
                {
                    "mode": (
                        f"local-cluster {regime} scaling "
                        "(separate executor JVMs, --py-files zip)"
                    ),
                    "n_events_low": n_events,
                    "n_events_high": high_events,
                    "executors_low": 1,
                    "executors_high": 4,
                    "cores_per_executor": 4,
                    "samples_low": samples["low"],
                    "samples_high": samples["high"],
                    "events_per_sec_low": tp_low,
                    "events_per_sec_high": tp_high,
                    "scaling_efficiency": round(tp_high / (4 * tp_low), 3),
                }
            )
        )


if __name__ == "__main__":
    main()
