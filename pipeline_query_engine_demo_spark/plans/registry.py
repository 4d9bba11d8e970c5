"""Query registry: one place that maps names to (Spark builder, DuckDB oracle).

Every capability row from SURVEY.md §2 gets an entry here. The driver's
correctness gate runs each Spark builder at sf0.01 and hash-compares it
against the paired DuckDB SQL, so entries must be deterministic:

- explicit ``orderBy`` before any limit/offset;
- every computed column aliased identically on both sides;
- doubles that pass through untouched are fine; doubles that are
  *aggregated* are cast to DECIMAL first so both engines do exact
  arithmetic (float sum order differs between engines);
- timestamps emitted at microsecond precision or coarser.

Queries whose semantics SQL can't express (LSH banding, streaming state)
register ``oracle=None`` → the driver records the weaker rows-only check,
and tests/ carry the real validation (planted duplicates, parity checks).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    category: str
    build: Builder
    oracle: str | None
    doc: str


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, category: str, oracle: str | None) -> Callable[[Builder], Builder]:
    """Decorator: register a (spark builder, duckdb oracle) pair."""

    def wrap(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name,
            category=category,
            build=fn,
            oracle=oracle,
            doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return wrap


def queries() -> dict[str, Builder]:
    """Driver contract: name -> callable(spark, sf_dir) -> DataFrame."""
    return {name: spec.build for name, spec in REGISTRY.items()}


def oracles() -> dict[str, str]:
    """Driver contract: name -> DuckDB SQL (only oracle-expressible ones)."""
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
