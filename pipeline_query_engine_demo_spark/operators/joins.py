"""Composed join operators Spark lacks as primitives.

The reference implements exactly one join — inner hash equi-join with a
shared in-process hash table (``src/executor/mod.rs:310-381``); every
standard join type maps to ``DataFrame.join`` directly (SURVEY.md §2.3).
What Spark does NOT ship is an as-of join. The naive encoding
(inequality join + argmax) explodes: every probe row matches its entire
key-history and a per-key O(n*m) blow-up shuffles through the cluster
before the argmax prunes it.

:func:`asof_join` instead uses the union + ordered-window construction:

1. tag reference rows and probe rows, union them (no join at all);
2. one hash shuffle on the key, per-partition sort by event time;
3. ``last(payload, ignorenulls=True)`` over an unbounded-preceding frame
   carries the latest reference payload forward onto each probe row.

Cost at scale: ONE shuffle of |probe| + |reference| rows and a sort —
the same price as a sort-merge join, with zero row amplification. Skewed
keys are handled the same way any windowed op handles them (AQE skew
splitting does not apply to windows, so extreme single-key skew would
need key-salting with range re-stitching — not needed at fixture scale).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    right_values: list[str],
    how: str = "left",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each ``left`` row, attach the nearest ``right``
    row for the same key(s) — the greatest ``right_time`` <=
    ``left_time`` (``direction="backward"``, default) or the smallest
    ``right_time`` >= ``left_time`` (``direction="forward"``). Exact
    time matches count in both directions.

    Returns ``left``'s columns plus ``asof_ts`` (matched right time) and
    each of ``right_values`` (all NULL when nothing precedes the row —
    SQL ``ASOF LEFT JOIN`` semantics; pass ``how="inner"`` to drop
    unmatched rows).

    Requirements: ``right`` must be unique per (key, right_time) — ties
    there are ambiguous in any as-of definition; pre-aggregate to pick a
    winner. ``right_values`` must not collide with ``left`` column names.

    NULL keys never match (SQL equi-join semantics): a NULL-key probe
    row gets NULL payload, never another NULL-key reference — the
    window partitioner would otherwise group NULL with NULL.
    """
    keys = [on] if isinstance(on, str) else list(on)
    reserved = {"_asof_t", "_asof_payload", "_asof_is_ref", "_asof_match", "asof_ts"}
    clash = (reserved & set(left.columns)) | (set(right_values) & set(left.columns))
    if clash:
        raise ValueError(
            f"asof_join reserved/output column collision on left input: {sorted(clash)} "
            "(rename before joining — e.g. alias a prior asof_ts away when chaining)"
        )
    payload = F.struct(F.col(right_time).alias("asof_ts"), *[F.col(v) for v in right_values])
    # A NULL-timestamp reference matches nothing in any SQL ASOF join;
    # unfiltered it would sort nulls-first and its payload would be
    # carried onto every probe row with no real predecessor. A NULL-KEY
    # reference likewise matches nothing (NULL = NULL is never true in
    # an equi-join), but the window partitioner groups NULLs together —
    # drop those rows so NULL-key probes see an empty frame instead.
    null_key = None
    for k in keys:
        cond = F.col(k).isNull()
        null_key = cond if null_key is None else (null_key | cond)
    ref = right.filter(F.col(right_time).isNotNull() & ~null_key).select(
        *keys,
        F.col(right_time).alias("_asof_t"),
        payload.alias("_asof_payload"),
        F.lit(1).alias("_asof_is_ref"),
    )
    probe = (
        left.withColumn("_asof_t", F.col(left_time))
        .withColumn("_asof_is_ref", F.lit(0))
        .withColumn("_asof_payload", F.lit(None).cast(ref.schema["_asof_payload"].dataType))
    )
    # At equal timestamps the reference row must fall INSIDE the probe
    # row's frame: before it (backward, trailing frame) or after it
    # (forward, leading frame).
    if direction == "backward":
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("_asof_t").asc(), F.col("_asof_is_ref").desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carry = F.last("_asof_payload", ignorenulls=True).over(w)
    elif direction == "forward":
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("_asof_t").asc(), F.col("_asof_is_ref").asc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carry = F.first("_asof_payload", ignorenulls=True).over(w)
    else:
        raise ValueError(f"direction must be 'backward'|'forward', got {direction!r}")
    carried = probe.unionByName(ref, allowMissingColumns=True).withColumn(
        "_asof_match", carry
    )
    # A NULL-timestamp probe row likewise matches nothing (in the
    # forward window NULLs sort first and would otherwise see every
    # reference in their leading frame).
    match = F.when(F.col("_asof_t").isNotNull(), F.col("_asof_match"))
    out = (
        carried.filter(F.col("_asof_is_ref") == 0)
        .withColumn("_asof_match", match)
        .select(
            *left.columns,
            F.col("_asof_match.asof_ts").alias("asof_ts"),
            *[F.col(f"_asof_match.{v}").alias(v) for v in right_values],
        )
    )
    if how == "inner":
        out = out.filter(F.col("asof_ts").isNotNull())
    elif how != "left":
        raise ValueError(f"asof_join supports how='left'|'inner', got {how!r}")
    return out


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_src: Column,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-defusing equi-join: spread each hot key of ``big`` over
    ``buckets`` reducers.

    ``big`` gets a deterministic salt from ``salt_src`` (any column
    expression that varies within a key — e.g. a row id; determinism
    keeps results reproducible and oracle-checkable, unlike rand());
    ``small`` is replicated ``buckets`` times via an exploded sequence.
    The join runs on (key, salt), so a key holding half the table hashes
    to ``buckets`` partitions instead of one. Semantically identical to
    ``big.join(small, on, how)`` for ``how`` in {inner, left}; right and
    full outer are rejected — an unmatched small-side row would survive
    once per salt replica, not once.

    Cost model: |small| * buckets extra rows shuffled — the standard
    trade when AQE's skew-join splitting can't apply (e.g. the skewed
    side feeds a window or the join is part of a co-partitioned chain).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: outer joins "
            "would duplicate unmatched small-side rows once per salt replica"
        )
    if "_salt" in big.columns or "_salt" in small.columns:
        raise ValueError(
            "salted_join reserved column '_salt' already present on an input — "
            "it would be silently overwritten and dropped from the result"
        )
    salted_big = big.withColumn("_salt", F.pmod(F.xxhash64(salt_src), F.lit(buckets)))
    salted_small = (
        small.withColumn("_salt_i", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))))
        .withColumn("_salt", F.col("_salt_i").cast("long"))
        .drop("_salt_i")
    )
    return salted_big.join(salted_small, on=[on, "_salt"], how=how).drop("_salt")
