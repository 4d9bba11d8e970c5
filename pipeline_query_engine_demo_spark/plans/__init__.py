"""The oracle-checked query corpus.

Importing this package populates the registry: every module below
registers its queries at import time via
:func:`pipeline_query_engine_demo_spark.plans.registry.query`.
"""

from pipeline_query_engine_demo_spark.plans import (  # noqa: F401  (registration side effects)
    analytics,
    curation,
    dedup,
    geo,
    graph,
    llm,
    partitioned,
    privacy,
    relational,
    retrieval,
    sinks,
    sketches,
    stats,
    timeseries,
    tpch,
    training,
    udfs,
    windows,
)

# quantization imports AFTER retrieval (not alphabetically): its PQ/OPQ
# recall oracles compose retrieval's cosine_topk_embeddings oracle via a
# REGISTRY lookup at import time.
from pipeline_query_engine_demo_spark.plans import quantization  # noqa: F401,E402

# streams imports LAST (not alphabetically): its stream-twin queries
# reuse batch oracles verbatim via REGISTRY lookups (cusum from
# analytics, ewma from windows), so every batch module must have
# registered first.
from pipeline_query_engine_demo_spark.plans import streams  # noqa: F401,E402
from pipeline_query_engine_demo_spark.plans.registry import REGISTRY, QuerySpec, oracles, queries

__all__ = ["REGISTRY", "QuerySpec", "queries", "oracles"]
