"""Operator library — each reference pattern re-expressed Spark-first.

Batch and streaming share the same column algebra; streaming-only
variants live in streamforge_spark.streaming.
"""

from streamforge_spark.operators.filters import filter_interceptor
from streamforge_spark.operators.dedup import deduplicator, stateful_merger
from streamforge_spark.operators.routing import parallel_splitter, watermark_aligned_fan_in
from streamforge_spark.operators.joins import static_joiner, dynamic_joiner
from streamforge_spark.operators.sessions import session_analyzer
from streamforge_spark.operators.materialize import materializer_latest, materializer_changelog
from streamforge_spark.operators.quality import (
    SchemaVersion, schema_enforcer, constraint_enforcer,
    not_null_rule, range_rule, format_rule,
)
from streamforge_spark.operators.observability import (
    latency_detector, metadata_decorator, online_observer, flow_silence_report,
)
from streamforge_spark.operators.processors import stamp_processor

__all__ = [
    "filter_interceptor", "deduplicator", "stateful_merger",
    "parallel_splitter", "watermark_aligned_fan_in",
    "static_joiner", "dynamic_joiner", "session_analyzer",
    "materializer_latest", "materializer_changelog",
    "SchemaVersion", "schema_enforcer", "constraint_enforcer",
    "not_null_rule", "range_rule", "format_rule",
    "latency_detector", "metadata_decorator", "online_observer",
    "flow_silence_report", "stamp_processor",
]
