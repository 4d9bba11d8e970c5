from pipeline_query_engine_demo_spark.functions import multimodal, text, vectors

__all__ = ["text", "vectors", "multimodal"]
