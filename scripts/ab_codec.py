"""Decisive shuffle-codec A/B (lz4 default vs zstd): interleaved
best-of-N at local[4] and local[16], same pre-generated stream, cold lake
per rep — the protocol VERDICT r04 asked for to settle the per-window
flip seen in bench ab_kernels.

Run:  python scripts/ab_codec.py [n_events] [reps]
Emits one JSON line for BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuses _cdc_replay: identical job at each level)
from arc_spark.session import get_spark  # noqa: E402


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    stream = os.path.join(shm, "ab_codec_stream")
    gen = get_spark("ab-gen", master="local[16]", shuffle_partitions=32)
    from arc_spark.cdc.generator import write_change_stream

    shutil.rmtree(stream, ignore_errors=True)
    write_change_stream(gen, stream, n_events, seed=42, num_partitions=64)
    gen.stop()
    time.sleep(2)

    samples: dict[str, list[float]] = {}
    for rep in range(reps):  # interleaved: host drift hits all cells alike
        for level in (4, 16):
            for codec in ("lz4", "zstd"):
                tp = bench._cdc_replay(
                    f"local[{level}]", stream, n_events, batches=2,
                    codec=codec,
                )
                key = f"{codec}_{level}"
                samples.setdefault(key, []).append(round(tp, 1))
                print(f"rep{rep} {key} {tp:,.0f} ev/s", file=sys.stderr)
    best = {k: max(v) for k, v in samples.items()}
    print(json.dumps({
        "n_events": n_events, "reps": reps, "samples": samples, "best": best,
        "zstd_vs_lz4_4": round(best["zstd_4"] / best["lz4_4"], 3),
        "zstd_vs_lz4_16": round(best["zstd_16"] / best["lz4_16"], 3),
    }))


if __name__ == "__main__":
    main()
