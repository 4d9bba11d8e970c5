"""Vector-math expression edge cases."""

from __future__ import annotations

import math

from pipeline_query_engine_demo_spark.functions import vectors


def _one(spark, vec_a, vec_b, col):
    df = spark.createDataFrame([(vec_a, vec_b)], "a array<float>, b array<float>")
    return df.select(col.alias("v")).collect()[0].v


def test_dot_norm_euclidean(spark):
    a, b = [3.0, 4.0], [1.0, 0.0]
    assert _one(spark, a, b, vectors.dot("a", "b")) == 3.0
    assert _one(spark, a, b, vectors.norm("a")) == 5.0
    assert _one(spark, a, b, vectors.euclidean("a", "b")) == math.sqrt(4 + 16)


def test_cosine_zero_vector_is_null(spark):
    assert _one(spark, [0.0, 0.0], [1.0, 2.0], vectors.cosine("a", "b")) is None


def test_normalize(spark):
    out = _one(spark, [3.0, 4.0], [0.0, 0.0], vectors.normalize("a"))
    assert out == [0.6, 0.8]
    assert _one(spark, [0.0, 0.0], [1.0, 1.0], vectors.normalize("a")) == [None, None]
