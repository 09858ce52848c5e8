"""spark-submit packaging: build the ``--py-files`` archive.

The north-rule deployment shape is::

    python -m arc_spark.submit --out /tmp/arc_spark.zip
    spark-submit --py-files /tmp/arc_spark.zip \
        --deploy-mode cluster --num-executors 4N ... \
        job.py   # or: $SPARK_HOME/bin/spark-submit ... -m arc_spark \
                 #     --etl.config.uri=job.conf

The archive contains the ``arc_spark`` package only (no tests, no
bytecode) so executors can import the Arrow-UDF kernels and the driver
can import everything else. Deterministic: entries are sorted and
timestamps zeroed, so re-building on CI produces an identical artifact
(byte-stable caching on object storage).
"""

from __future__ import annotations

import os
import sys
import zipfile


def build_pyfiles_zip(out_path: str, package_dir: str | None = None) -> str:
    """Write ``arc_spark`` as a deterministic zip importable via
    ``--py-files``; returns the path written."""
    if package_dir is None:
        package_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(package_dir)
    entries = []
    for dirpath, dirnames, filenames in os.walk(package_dir):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                entries.append((full, os.path.relpath(full, root)))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, arc in entries:
            info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            with open(full, "rb") as f:
                zf.writestr(info, f.read(), zipfile.ZIP_DEFLATED)
    return out_path


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    out = "arc_spark.zip"
    for a in argv:
        if a.startswith("--out="):
            out = a[len("--out="):]
        elif a == "--out":
            pass
        elif not a.startswith("--"):
            out = a
    path = build_pyfiles_zip(out)
    n = len(zipfile.ZipFile(path).namelist())
    print(f"wrote {path} ({n} modules) — pass via spark-submit --py-files {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
