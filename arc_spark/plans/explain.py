"""Physical-plan introspection: pushed filters, read schemas, codegen spans.

Reference parity: the reference scrapes partitionFilters/dataFilters from
FileSourceScanExec into its logs after every SQLTransform
(``util/QueryExecutionUtils.scala:8-24``, used ``transform/SQLTransform.
scala:189-190``). Same role here, via EXPLAIN FORMATTED text — plus
assertion helpers so tests can pin plan shape (a scan that reads all
columns for a 2-column projection is a bug, not a style issue).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def scan_info(df: DataFrame) -> list[dict]:
    """Per file-scan node: format, PushedFilters, ReadSchema, location."""
    text = explain_formatted(df)
    scans = []
    blocks = re.split(r"\n\n", text)
    for block in blocks:
        if "Scan " not in block:
            continue
        for m in re.finditer(r"\(\d+\) Scan (\w+)", block):
            scans.append({"format": m.group(1)})
        for key in ("PushedFilters", "ReadSchema", "Location", "PartitionFilters"):
            m = re.search(rf"{key}: (.+)", block)
            if m and scans:
                scans[-1][key] = m.group(1).strip()
    return scans


def pushed_filters(df: DataFrame) -> list[str]:
    """All data filters pushed into scans (flattened)."""
    out: list[str] = []
    for s in scan_info(df):
        pf = s.get("PushedFilters", "")
        out += re.findall(r"\w+\([^()]*(?:\([^()]*\)[^()]*)*\)", pf)
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Column names each scan actually reads (column-pruning check)."""
    cols: list[str] = []
    for s in scan_info(df):
        rs = s.get("ReadSchema", "")
        cols += re.findall(r"(\w+):", rs)
    return cols


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of distinct WholeStageCodegen spans — wider/fewer is better
    (fewer breaks out of generated code). Spark 4 formatted plans mark
    nodes with ``[codegen id : N]``; AQE plans only show them after the
    query has executed (final plan)."""
    text = explain_formatted(df)
    ids = set(re.findall(r"codegen id : (\d+)", text))
    ids |= set(re.findall(r"WholeStageCodegen \((\d+)\)", text))
    return len(ids)
