"""Vector math over ``array<float>`` embedding columns.

All pure Column expressions (zip_with / aggregate higher-order
functions) — JVM-side, no Python round-trip, scale with the scan.
Elements are cast to DOUBLE before any arithmetic and folded strictly
left-to-right, which keeps results deterministic and lets the DuckDB
oracle (list_dot_product over DOUBLE[]) reproduce them bit-for-bit.

For very high dimensions (>> 1k) a vectorized Pandas UDF (numpy dot over
Arrow batches) wins on constant factors; helpers for that live in
operators.similarity. At dim=64 the expression form is faster than the
Arrow round-trip.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def as_double(vec: Column | str) -> Column:
    vec = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Strict left-fold dot product in double precision."""
    prods = F.zip_with(as_double(a), as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(vec: Column | str) -> Column:
    return F.sqrt(dot(vec, vec))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL-safe only in the sense that a zero vector
    yields NULL (division by zero), which sorts last under desc order."""
    denominator = norm(a) * norm(b)
    return dot(a, b) / F.nullif(denominator, F.lit(0.0))


def euclidean(a: Column | str, b: Column | str) -> Column:
    """L2 distance, same strict left-fold arithmetic as dot()."""
    diffs = F.zip_with(as_double(a), as_double(b), lambda x, y: (x - y) * (x - y))
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x))


def normalize(vec: Column | str) -> Column:
    """Unit-normalize; a zero vector normalizes to NULL elements rather
    than raising (division by NULLIF(0)). The norm is let-bound: HOF
    lambdas are interpreted, so capturing the O(d) fold directly in the
    divide lambda would re-fold the vector per element (O(d²) per row)."""
    from pipeline_query_engine_demo_spark.functions.text import let

    return let(
        F.nullif(norm(vec), F.lit(0.0)),
        lambda n: F.transform(as_double(vec), lambda x: x / n),
    )


def lit_matrix(rows: list[list[float]]) -> Column:
    """A literal array<array<double>> (centroids, hyperplanes) as ONE
    parsed SQL expression. Building it element-by-element with F.lit
    costs one py4j round-trip per element — ~0.5 s of driver time for a
    4x64 matrix on every query build — where the parser constructs the
    identical tree JVM-side in a single call. repr() round-trips
    doubles exactly, so the parsed literals are bit-identical to the
    Python floats."""
    inner = ", ".join(
        "array(" + ", ".join(f"CAST('{x!r}' AS DOUBLE)" for x in row) + ")"
        for row in rows
    )
    return F.expr(f"array({inner})")


def lit_vector(row: list[float]) -> Column:
    """A literal array<double> as one parsed SQL expression (see
    lit_matrix)."""
    return F.expr(
        "array(" + ", ".join(f"CAST('{x!r}' AS DOUBLE)" for x in row) + ")"
    )
