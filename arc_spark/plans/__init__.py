from arc_spark.plans.explain import (  # noqa: F401
    explain_formatted,
    pushed_filters,
    scan_info,
    wholestage_codegen_spans,
)
