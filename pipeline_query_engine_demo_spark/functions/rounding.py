"""Cross-engine-stable rounding for oracle-compared output columns.

Spark's ``round()`` routes through Java BigDecimal HALF_UP on the
decimal string, while DuckDB rounds the scaled double directly; on
boundary doubles the two disagree by one ulp of the last kept digit
(observed at sf0.1 on PageRank ranks: 8.2635e-05 vs 8.2636e-05).
Fixtures regenerate between rounds, so any ``F.round`` column paired
with a DuckDB ``round()`` in its oracle is a latent gate flake.

The fix: both engines evaluate the *identical* pure-IEEE expression

    floor(x * 10^d + 0.5) / 10^d

double multiply, double add, floor, double divide — bit-identical in
every engine regardless of sign (for negative x this is "half toward
+inf" rather than BigDecimal's "half away from zero", but parity only
needs both sides to agree, and the difference is confined to exact
.5 boundaries that IEEE doubles almost never hit anyway).

``round_half_up`` is the Column form; ``sql_round_half_up`` emits the
mirrored DuckDB SQL. Use the pair for every rounded column that the
correctness gate hashes. Spark's floor yields BIGINT, exact for
``|x| * 10^d < 2^53`` — all rank/score/ratio columns here.

Non-finite inputs round to NULL on BOTH sides: Spark's floor() maps
NaN to 0 and ±Inf to ±Long.MAX_VALUE while DuckDB's floor preserves
them, so a NaN/Inf produced by a degenerate regenerated fixture
(0/0 slope on a constant group, log of a zero revenue, a zero-norm
vector) would hash-diverge — the exact flake class this module
exists to kill. NULL is the one value the gate canonicalizes
identically from both engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def round_half_up(col: Column, digits: int = 0) -> Column:
    """``floor(col * 10^digits + 0.5) / 10^digits`` as a Column;
    NULL for NaN/±Inf (see module docstring)."""
    scale = float(10**digits)
    c = col.cast("double")
    rounded = F.floor(c * F.lit(scale) + F.lit(0.5)) / F.lit(scale)
    non_finite = (
        F.isnan(c) | (c == F.lit(float("inf"))) | (c == F.lit(float("-inf")))
    )
    return F.when(~non_finite, rounded)


def sql_round_half_up(expr: str, digits: int = 0) -> str:
    """The DuckDB-SQL twin of :func:`round_half_up`."""
    scale = float(10**digits)
    return (
        f"CASE WHEN isfinite({expr}) "
        f"THEN floor(({expr}) * {scale!r} + 0.5) / {scale!r} END"
    )
