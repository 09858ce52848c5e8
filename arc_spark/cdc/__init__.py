"""CDC engine: deterministic change-stream generation, the last-writer-wins
apply kernel, the micro-batch replay runner, and the brute-force reference
replay used as the correctness oracle.
"""

from arc_spark.cdc.generator import change_stream, write_change_stream  # noqa: F401
from arc_spark.cdc.apply import last_writer_wins, normalize_and_fingerprint  # noqa: F401
from arc_spark.cdc.reference import reference_replay  # noqa: F401
from arc_spark.cdc.runner import ReplayRunner  # noqa: F401
from arc_spark.cdc.debezium import (  # noqa: F401
    parse_debezium,
    stage_debezium,
    to_debezium_json,
)
from arc_spark.cdc.multi import (  # noqa: F401
    MultiTableReplay,
    bootstrap_catalog_for_stream,
)
