"""The oracle-checked query corpus.

Importing this package populates the registry: every module below
registers its queries at import time via
:func:`pipeline_query_engine_demo_spark.plans.registry.query`.
"""

from pipeline_query_engine_demo_spark.plans import (  # noqa: F401  (registration side effects)
    analytics,
    curation,
    llm,
    quantization,
    relational,
    sinks,
    streams,
    tpch,
    udfs,
    windows,
)
from pipeline_query_engine_demo_spark.plans.registry import REGISTRY, QuerySpec, oracles, queries

__all__ = ["REGISTRY", "QuerySpec", "queries", "oracles"]
