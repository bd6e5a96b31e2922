"""grove_spark — a from-scratch, PySpark-native log/telemetry pipeline engine.

Re-expresses the capabilities of hashicorp-forge/grove (a single-process,
thread-pooled SaaS log-collection ETL: connectors -> processors -> outputs,
with pointer/dedup state) as an idiomatic Spark DataFrame pipeline:

    parse -> enrich (broadcast dims) -> route (multi-sink fan-out, salted
    repartition) -> aggregate (per-sink counts / telemetry)

over huge tables of pre-tokenized sequences
``(doc_id string, tokens array<int>, n_tok int, source string)``.

Nothing here is a port: the reference's per-record Python interpretation
(grove/connectors/__init__.py, grove/processors/*.py) becomes config-compiled
Catalyst column expressions; its thread pool becomes Spark task parallelism;
its pointer cache becomes a checkpointed run-state table committed with the
data write.
"""

__version__ = "0.1.0"

from grove_spark.session import get_spark  # noqa: F401
