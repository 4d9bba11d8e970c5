"""Distributed 2-D skyline (Pareto frontier) — the classic "maximal
vectors" operator (Börzsönyi et al., ICDE'01 "The Skyline Operator"):
return every row no other row dominates, where q dominates p iff q is
<= p in both dimensions and strictly < in at least one (both dimensions
minimized; flip a sign to maximize).

The reference has no skyline surface (its executor is 4 relational
operators, /root/reference/src/executor/mod.rs:250-466); multi-criteria
frontier extraction is a standard analytics ask (cheapest-AND-smallest
part, best price/quality supplier) that a single ORDER BY cannot
express.

Scale shape — the canonical two-phase plan:

1. **Local prune** (exact, not heuristic): partition rows by a hash of
   the id into ``buckets`` groups and compute the skyline WITHIN each
   bucket via one vectorized ``applyInPandas`` (O(n log n) sort +
   prefix-min, no Python row loop). Dominance inside a subset implies
   dominance globally, so dropping bucket-dominated rows never removes
   a global-skyline row; survivors per bucket ≈ the skyline size, so
   the candidate union is tiny relative to the input.
2. **Global verify**: broadcast the candidate set against itself in a
   dominance LEFT ANTI join. The candidate set is skyline-sized (worst
   case — fully anti-correlated dimensions — the skyline IS the data
   and no algorithm beats that), so the quadratic check runs on a
   bounded input the same way the LSH verify join does.

Float caveat: the local stage compares the dimensions as float64; the
final anti-join re-checks dominance on the ORIGINAL column types, so
results are exact whenever float64 preserves the ordering of each
dimension (true for DECIMAL(15,2) money and any integer < 2^53 —
pre-scale anything wider).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _local_skyline(pdf: pd.DataFrame) -> pd.DataFrame:
    """Exact skyline of one bucket, both dims minimized, vectorized.

    Sort by (x asc, y asc); in that order every earlier row has
    x <= mine, so a row survives iff
    - no earlier x-GROUP reached y <= mine (strict-x dominance), and
    - it matches its x-group's minimum y (an equal-(x,y) duplicate is
      NOT dominated — no strict coordinate — and is kept).
    """
    if len(pdf) == 0:
        return pdf
    s = pdf.sort_values(["_x", "_y"], kind="mergesort")
    xs = s["_x"].to_numpy()
    ys = s["_y"].to_numpy()
    new_x = np.empty(len(xs), dtype=bool)
    new_x[0] = True
    new_x[1:] = xs[1:] != xs[:-1]
    group_min_y = ys[new_x]  # sorted y asc within group -> head is min
    prev_groups_min = np.concatenate(
        ([np.inf], np.minimum.accumulate(group_min_y)[:-1])
    )
    gidx = np.cumsum(new_x) - 1
    dominated = (prev_groups_min[gidx] <= ys) | (ys > group_min_y[gidx])
    return s[~dominated]


def skyline_2d(
    df: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    maximize_y: bool = False,
    buckets: int = 32,
) -> DataFrame:
    """Rows of ``df`` on the (x minimized, y minimized-or-maximized)
    Pareto frontier, original columns preserved."""
    y_sign = -1.0 if maximize_y else 1.0
    keyed = df.select(
        F.col(id_col).alias("_id"),
        F.col(x_col).cast("double").alias("_x"),
        (F.col(y_col).cast("double") * F.lit(y_sign)).alias("_y"),
        F.pmod(F.hash(F.col(id_col)), F.lit(buckets)).alias("_b"),
    )
    cand_ids = (
        keyed.groupBy("_b")
        .applyInPandas(
            lambda pdf: _local_skyline(pdf), schema=keyed.schema
        )
        .select("_id")
    )
    cand = df.join(
        cand_ids.withColumnRenamed("_id", id_col), id_col, "left_semi"
    )
    p = cand.alias("p")
    q = cand.alias("q")
    px, py = F.col(f"p.{x_col}"), F.col(f"p.{y_col}")
    qx, qy = F.col(f"q.{x_col}"), F.col(f"q.{y_col}")
    if maximize_y:
        y_le, y_lt = qy >= py, qy > py
    else:
        y_le, y_lt = qy <= py, qy < py
    dominates = (qx <= px) & y_le & ((qx < px) | y_lt)
    return p.join(F.broadcast(q), dominates, "left_anti")
