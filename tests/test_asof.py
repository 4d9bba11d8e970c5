"""As-of join edge cases (operators.joins.asof_join): exact-tie
timestamps match, rows with no predecessor get NULLs, inner mode drops
them, per-key isolation."""

from __future__ import annotations

import datetime as dt

import pytest

import pyspark.sql.functions as F
from pipeline_query_engine_demo_spark.operators.joins import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, "k1", _ts("2024-01-01 10:00:00")),  # before any ref → NULL
            (2, "k1", _ts("2024-01-01 12:00:00")),  # exact tie with ref @12:00
            (3, "k1", _ts("2024-01-01 13:30:00")),  # between refs → 12:00 ref
            (4, "k2", _ts("2024-01-01 12:30:00")),  # other key → k2's ref only
        ],
        "event_id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("k1", _ts("2024-01-01 12:00:00"), 100.0),
            ("k1", _ts("2024-01-01 14:00:00"), 200.0),
            ("k2", _ts("2024-01-01 12:15:00"), 300.0),
        ],
        "k string, ts timestamp, val double",
    )
    return left, right


def test_asof_left_semantics(spark, frames):
    left, right = frames
    out = {
        r.event_id: r
        for r in asof_join(left, right, "k", "ts", "ts", ["val"]).collect()
    }
    assert out[1].val is None and out[1].asof_ts is None  # no predecessor
    assert out[2].val == 100.0  # exact tie counts
    assert out[2].asof_ts == _ts("2024-01-01 12:00:00")
    assert out[3].val == 100.0  # latest preceding, not the later ref
    assert out[4].val == 300.0  # key isolation
    assert len(out) == 4  # left join preserves all probe rows


def test_asof_inner_drops_unmatched(spark, frames):
    left, right = frames
    ids = {r.event_id for r in asof_join(left, right, "k", "ts", "ts", ["val"], how="inner").collect()}
    assert ids == {2, 3, 4}


def test_asof_composite_key(spark):
    left = spark.createDataFrame(
        [(1, "k1", "x", _ts("2024-01-01 13:00:00"))],
        "event_id long, k string, sub string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("k1", "x", _ts("2024-01-01 12:00:00"), 1.0),
            ("k1", "y", _ts("2024-01-01 12:30:00"), 2.0),  # later, but other subkey
        ],
        "k string, sub string, ts timestamp, val double",
    )
    rows = asof_join(left, right, ["k", "sub"], "ts", "ts", ["val"]).collect()
    assert len(rows) == 1 and rows[0].val == 1.0  # matches within (k, sub) only


def test_asof_null_timestamps_match_nothing(spark):
    left = spark.createDataFrame(
        [(1, "k1", _ts("2024-01-01 13:00:00")), (2, "k1", None)],
        "event_id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("k1", None, 99.0), ("k1", _ts("2024-01-01 12:00:00"), 1.0)],
        "k string, ts timestamp, val double",
    )
    out = {r.event_id: r for r in asof_join(left, right, "k", "ts", "ts", ["val"]).collect()}
    assert out[1].val == 1.0  # NULL-ts reference never matches
    assert out[2].val is None and out[2].asof_ts is None  # NULL-ts probe matches nothing
    fwd = {
        r.event_id: r
        for r in asof_join(
            left, right, "k", "ts", "ts", ["val"], direction="forward"
        ).collect()
    }
    assert fwd[2].val is None  # forward direction too


def test_asof_forward_semantics(spark, frames):
    left, right = frames
    out = {
        r.event_id: r
        for r in asof_join(
            left, right, "k", "ts", "ts", ["val"], direction="forward"
        ).collect()
    }
    assert out[1].val == 100.0  # 10:00 → next ref at 12:00
    assert out[2].val == 100.0  # exact tie at 12:00 counts forward too
    assert out[3].val == 200.0  # 13:30 → next ref at 14:00
    assert out[4].val is None  # k2's only ref (12:15) precedes 12:30


def test_asof_bad_direction_raises(spark, frames):
    import pytest

    left, right = frames
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, "k", "ts", "ts", ["val"], direction="sideways").collect()


def test_asof_bad_how_raises(spark, frames):
    left, right = frames
    with pytest.raises(ValueError):
        asof_join(left, right, "k", "ts", "ts", ["val"], how="right")


def test_asof_null_keys_match_nothing(spark):
    """SQL equi-join semantics: NULL keys never equal NULL keys — a
    NULL-key probe row must get NULL payload even when a NULL-key
    reference row exists at an earlier timestamp."""
    left = spark.createDataFrame(
        [(1, None, _ts("2024-01-01 13:00:00")), (2, "k1", _ts("2024-01-01 13:00:00"))],
        "event_id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [(None, _ts("2024-01-01 12:00:00"), 99.0), ("k1", _ts("2024-01-01 12:00:00"), 1.0)],
        "k string, ts timestamp, val double",
    )
    out = {r.event_id: r for r in asof_join(left, right, "k", "ts", "ts", ["val"]).collect()}
    assert out[1].val is None and out[1].asof_ts is None
    assert out[2].val == 1.0


def test_asof_reserved_column_collision_raises(spark, frames):
    left, right = frames
    chained = asof_join(left, right, "k", "ts", "ts", ["val"])
    with pytest.raises(ValueError, match="collision"):
        asof_join(chained, right, "k", "ts", "ts", ["val"])


def test_asof_pandas_api_slice_is_row_budgeted(spark, sf_dir):
    """The pandas-API as-of row lowers to an inequality-join rewrite, so
    its input must be bounded BY CONSTRUCTION: the user-modulus is
    derived from the corpus size (m = ceil(n / BUDGET)), which caps the
    sliced left side near the budget at ANY scale factor. Pin (a) the
    derivation, (b) the realized row bound, and (c) that the oracle SQL
    replays the identical integer arithmetic."""
    from pipeline_query_engine_demo_spark.plans.registry import REGISTRY
    from pipeline_query_engine_demo_spark.plans.windows import ASOF_PANDAS_ROW_BUDGET
    from pipeline_query_engine_demo_spark.sources.catalog import load_table

    full = load_table(spark, sf_dir, "events")
    n = full.count()
    modulus = (n + ASOF_PANDAS_ROW_BUDGET - 1) // ASOF_PANDAS_ROW_BUDGET
    sliced = full.filter(F.col("user_id") % modulus == 0).count()
    # ~uniform events-per-user: the slice sits near n/m; 1.5x head-room
    # absorbs per-user count noise while still failing on any constant
    # that stops scaling with n.
    assert sliced <= 1.5 * ASOF_PANDAS_ROW_BUDGET
    oracle = REGISTRY["asof_join_pandas_api"].oracle
    assert f"+ {ASOF_PANDAS_ROW_BUDGET - 1}) // {ASOF_PANDAS_ROW_BUDGET}" in oracle
