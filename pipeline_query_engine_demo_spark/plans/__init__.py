"""The oracle-checked query corpus.

Importing this package populates the registry: every module below
registers its queries at import time via
:func:`pipeline_query_engine_demo_spark.plans.registry.query`.
"""

from pipeline_query_engine_demo_spark.plans import (  # noqa: F401  (registration side effects)
    analytics,
    curation,
    geo,
    llm,
    quantization,
    relational,
    sinks,
    sketches,
    tpch,
    udfs,
    windows,
)

# streams imports LAST (not alphabetically): its stream-twin queries
# reuse batch oracles verbatim via REGISTRY lookups (cusum from
# analytics, ewma from windows), so every batch module must have
# registered first.
from pipeline_query_engine_demo_spark.plans import streams  # noqa: F401,E402
from pipeline_query_engine_demo_spark.plans.registry import REGISTRY, QuerySpec, oracles, queries

__all__ = ["REGISTRY", "QuerySpec", "queries", "oracles"]
