from pipeline_query_engine_demo_spark.operators import dedup, similarity
from pipeline_query_engine_demo_spark.operators.joins import asof_join, salted_join

__all__ = ["asof_join", "salted_join", "dedup", "similarity"]
