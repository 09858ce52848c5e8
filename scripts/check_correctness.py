"""Local mirror of the driver's correctness gate: run every
__spark_entry__.queries() entry AND its oracle_sql() twin at a given SF,
compare row count, sorted-column schema, and a canonical value hash.

Run:  python scripts/check_correctness.py [sf_dir] [only_query ...]
Emits one JSON line per query + a summary line.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _canon(v):
    if v is None:
        return "\\N"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.10g}"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def _hash_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(_canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    import duckdb

    import __spark_entry__ as entry
    from arc_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("correctness", master="local[16]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, oracles = entry.queries(), entry.oracle_sql()
    ok = bad = weak = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(json.dumps({"q": name, "status": "SPARK_ERROR",
                              "error": str(e)[:200]}))
            bad += 1
            continue
        if name not in oracles:
            print(json.dumps({"q": name, "status": "rows_only",
                              "rows": len(rows)}))
            weak += 1
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            print(json.dumps({"q": name, "status": "ORACLE_ERROR",
                              "error": str(e)[:200]}))
            bad += 1
            continue
        res = {
            "q": name,
            "rows_match": len(rows) == len(orows),
            "schema_match": sorted(cols) == sorted(ocols),
            "hash_match": _hash_rows(cols, rows) == _hash_rows(ocols, orows),
            "rows": len(rows),
        }
        res["status"] = "ok" if all(
            res[k] for k in ("rows_match", "schema_match", "hash_match")
        ) else "MISMATCH"
        ok += res["status"] == "ok"
        bad += res["status"] != "ok"
        print(json.dumps(res))
    print(json.dumps({"summary": True, "ok": ok, "mismatch_or_error": bad,
                      "rows_only": weak, "sf_dir": sf_dir}))
    spark.stop()


if __name__ == "__main__":
    main()
