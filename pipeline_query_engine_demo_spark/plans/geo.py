"""Spatial analytics: grid-bucketed radius joins, nearest-neighbor
lookup, and density rollups over point data (operators/spatial.py).

No geo columns ship in the fixtures, so both engines derive identical
synthetic coordinates from the integer keys (two-prime spread,
operators.spatial.synth_lat/lon — the same exact IEEE expression on
both sides). The DuckDB oracles run the BRUTE-FORCE cross-join form of
each query, so the gate proves the grid join is exactly the cross-join
semantics — the same adversarial construction as the banded-SimHash /
LSH oracles.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pipeline_query_engine_demo_spark.functions.rounding import (
    round_half_up,
    sql_round_half_up,
)
from pipeline_query_engine_demo_spark.operators import spatial
from pipeline_query_engine_demo_spark.plans.registry import query
from pipeline_query_engine_demo_spark.sources.catalog import load_table

_C_LAT, _C_LON = spatial.sql_synth_coords("c_custkey")
_S_LAT, _S_LON = spatial.sql_synth_coords("s_suppkey")
_D2 = spatial.sql_dist2("c.lat", "c.lon", "s.lat", "s.lon")

#: Radius (coordinate degrees) for the pair join; chosen so the pair
#: count stays in the hundreds at sf0.1 (expected pairs ~
#: |C|·|S|·πr²/64800).
_RADIUS = 1.0
#: Wider radius for nearest-supplier (inner semantics: customers with
#: no supplier within the radius drop out on both engines).
_NN_RADIUS = 5.0


def _customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("custkey"),
        spatial.synth_lat(F.col("c_custkey")).alias("lat"),
        spatial.synth_lon(F.col("c_custkey")).alias("lon"),
    )


def _suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    return s.select(
        F.col("s_suppkey").alias("suppkey"),
        spatial.synth_lat(F.col("s_suppkey")).alias("lat"),
        spatial.synth_lon(F.col("s_suppkey")).alias("lon"),
    )


@query(
    "spatial_radius_join_pairs",
    category="spatial",
    oracle=f"""
        WITH c AS (SELECT c_custkey AS custkey,
                          {_C_LAT} AS lat, {_C_LON} AS lon FROM customer),
        s AS (SELECT s_suppkey AS suppkey,
                     {_S_LAT} AS lat, {_S_LON} AS lon FROM supplier)
        SELECT c.custkey, s.suppkey, {_D2} AS dist2
        FROM c CROSS JOIN s
        WHERE {_D2} <= {_RADIUS} * {_RADIUS}
        ORDER BY custkey, suppkey
    """,
)
def spatial_radius_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All (customer, supplier) pairs within planar distance
    {_RADIUS} degrees — the spatial radius join. The Spark plan is the
    grid-bucketed form (operators.spatial.radius_join: 3x3 cell probe +
    cell equi-join + exact verify); the oracle is the brute-force cross
    join with the identical distance expression, so the gate proves the
    grid construction is recall-lossless, pair for pair.

    Scale: 9·|C| + |S| rows through one hash exchange on the cell id
    versus |C|·|S| for the cross join — at 100 TB of points the cross
    join does not finish; the grid join is the standard production
    shape (geohash/S2 bucketing). dist2 is exact IEEE arithmetic from
    identical inputs, so it hash-compares raw."""
    pairs = spatial.radius_join(
        _customers(spark, sf_dir),
        _suppliers(spark, sf_dir),
        _RADIUS,
        left_cols=("custkey", "lat", "lon"),
        right_cols=("suppkey", "lat", "lon"),
    )
    return pairs.select(
        F.col("_lid").alias("custkey"),
        F.col("_rid").alias("suppkey"),
        "dist2",
    ).orderBy("custkey", "suppkey")


@query(
    "spatial_nearest_supplier",
    category="spatial",
    oracle=f"""
        WITH c AS (SELECT c_custkey AS custkey,
                          {_C_LAT} AS lat, {_C_LON} AS lon FROM customer),
        s AS (SELECT s_suppkey AS suppkey,
                     {_S_LAT} AS lat, {_S_LON} AS lon FROM supplier),
        pairs AS (
            SELECT c.custkey, s.suppkey, {_D2} AS dist2
            FROM c CROSS JOIN s
            WHERE {_D2} <= {_NN_RADIUS} * {_NN_RADIUS}
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY custkey
                                         ORDER BY dist2, suppkey) AS rn
            FROM pairs
        )
        SELECT custkey, suppkey AS nearest_suppkey, dist2
        FROM ranked WHERE rn = 1 ORDER BY custkey
    """,
)
def spatial_nearest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest supplier per customer within {_NN_RADIUS} degrees —
    spatial 1-NN with a bounded search radius (inner semantics:
    customers with nothing in range drop out on BOTH engines; an
    unbounded 1-NN needs expanding ring search, which is this same
    query iterated with growing radius). Argmin ties break on the
    smaller supplier key.

    Scale: the radius join bounds candidates to the 3x3 cell
    neighborhood; the argmin is a per-customer window over candidates
    only — never a global pass over suppliers per customer."""
    pairs = spatial.radius_join(
        _customers(spark, sf_dir),
        _suppliers(spark, sf_dir),
        _NN_RADIUS,
        left_cols=("custkey", "lat", "lon"),
        right_cols=("suppkey", "lat", "lon"),
    )
    w = Window.partitionBy("_lid").orderBy("dist2", "_rid")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("_lid").alias("custkey"),
            F.col("_rid").alias("nearest_suppkey"),
            "dist2",
        )
        .orderBy("custkey")
    )


@query(
    "spatial_grid_density",
    category="spatial",
    oracle=f"""
        WITH c AS (SELECT {_C_LAT} AS lat, {_C_LON} AS lon FROM customer),
        cells AS (
            SELECT CAST(floor(lat / 15.0) AS BIGINT) AS cell_lat,
                   CAST(floor(lon / 15.0) AS BIGINT) AS cell_lon,
                   CAST(COUNT(*) AS BIGINT) AS n_points
            FROM c GROUP BY cell_lat, cell_lon
        ),
        tot AS (SELECT CAST(SUM(n_points) AS BIGINT) AS n FROM cells)
        SELECT cell_lat, cell_lon, n_points,
               {sql_round_half_up(
                   'CAST(n_points AS DOUBLE) / CAST(tot.n AS DOUBLE)', 9)}
                   AS density
        FROM cells CROSS JOIN tot
        ORDER BY n_points DESC, cell_lat, cell_lon
        LIMIT 20
    """,
)
def spatial_grid_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-density rollup on a 15-degree grid, top-20 cells — the
    heatmap aggregation behind every map dashboard, and the occupancy
    profile that sizes radius-join cells (a cell here is the hot-key
    diagnostic for operators.spatial.radius_join).

    Scale: map-side cell assignment + one combinable count; the total
    is a 1-row broadcast. The top-20 is a TakeOrdered, never a global
    sort."""
    c = _customers(spark, sf_dir)
    cells = (
        c.select(
            F.floor(F.col("lat") / F.lit(15.0)).cast("bigint").alias("cell_lat"),
            F.floor(F.col("lon") / F.lit(15.0)).cast("bigint").alias("cell_lon"),
        )
        .groupBy("cell_lat", "cell_lon")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_points"))
    )
    tot = cells.agg(F.sum("n_points").cast("bigint").alias("n"))
    return (
        cells.join(F.broadcast(tot))
        .select(
            "cell_lat",
            "cell_lon",
            "n_points",
            round_half_up(
                F.col("n_points").cast("double") / F.col("n").cast("double"), 9
            ).alias("density"),
        )
        .orderBy(F.col("n_points").desc(), "cell_lat", "cell_lon")
        .limit(20)
    )


_E_LAT, _E_LON = spatial.sql_synth_coords("event_id")


@query(
    "spatial_od_flows",
    category="spatial",
    oracle=f"""
        WITH pts AS (
            SELECT user_id, ts, event_id,
                   CAST(floor(({_E_LAT}) / 15.0) AS BIGINT) AS cell_lat,
                   CAST(floor(({_E_LON}) / 15.0) AS BIGINT) AS cell_lon
            FROM events
        ),
        hops AS (
            SELECT user_id, cell_lat, cell_lon,
                   lag(cell_lat) OVER w AS from_lat,
                   lag(cell_lon) OVER w AS from_lon
            FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        flows AS (
            SELECT from_lat, from_lon, cell_lat AS to_lat, cell_lon AS to_lon,
                   CAST(COUNT(*) AS BIGINT) AS n_trips,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
            FROM hops
            WHERE from_lat IS NOT NULL
              AND (from_lat <> cell_lat OR from_lon <> cell_lon)
            GROUP BY from_lat, from_lon, to_lat, to_lon
        )
        SELECT * FROM flows
        ORDER BY n_trips DESC, from_lat, from_lon, to_lat, to_lon
        LIMIT 20
    """,
)
def spatial_od_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Origin-destination matrix over the 15-degree grid — the
    movement-flow aggregation behind mobility dashboards: each user's
    event sequence (synthetic per-event coordinates, same two-prime
    derivation as the rest of the spatial family) becomes a series of
    cell-to-cell hops via one per-user lag; same-cell dwells drop;
    flows aggregate trip and unique-traveler counts, top-20 by volume.
    The spatial twin of event_transition_matrix (which hops over
    event TYPES), composing the grid bucketing with the
    sessionization-window machinery.

    Scale: one hash exchange on user_id for the lag window (users are
    high-cardinality — no low-cardinality reducer funnel), then a
    combinable group-by on the ~(24x12)^2-bounded cell-pair domain;
    top-20 is a TakeOrdered, never a global sort."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.floor(spatial.synth_lat(F.col("event_id")) / F.lit(15.0))
        .cast("bigint")
        .alias("cell_lat"),
        F.floor(spatial.synth_lon(F.col("event_id")) / F.lit(15.0))
        .cast("bigint")
        .alias("cell_lon"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hops = pts.select(
        "user_id",
        "cell_lat",
        "cell_lon",
        F.lag("cell_lat").over(w).alias("from_lat"),
        F.lag("cell_lon").over(w).alias("from_lon"),
    )
    flows = (
        hops.filter(
            F.col("from_lat").isNotNull()
            & (
                (F.col("from_lat") != F.col("cell_lat"))
                | (F.col("from_lon") != F.col("cell_lon"))
            )
        )
        .groupBy(
            "from_lat",
            "from_lon",
            F.col("cell_lat").alias("to_lat"),
            F.col("cell_lon").alias("to_lon"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_trips"),
            F.count_distinct("user_id").cast("bigint").alias("n_users"),
        )
    )
    return flows.orderBy(
        F.col("n_trips").desc(), "from_lat", "from_lon", "to_lat", "to_lon"
    ).limit(20)


_DB_D2 = spatial.sql_dist2("a.lat", "a.lon", "b.lat", "b.lon")
#: DBSCAN parameters for the registered query: tuned on the fixture so
#: all three roles appear (sf0.01: 436 core / 159 border / 6 noise in
#: 11 multi-core clusters). The <= 600-key slice exists for the
#: ORACLE's O(n^2) pair join + recursive closure, not the operator.
_DB_EPS = 7.0
_DB_MINPTS = 4
_DB_SLICE = 600


@query(
    "dbscan_customers_grid",
    category="spatial",
    oracle=f"""
        WITH RECURSIVE c AS (
            SELECT c_custkey AS pid, {_C_LAT} AS lat, {_C_LON} AS lon
            FROM customer WHERE c_custkey <= {_DB_SLICE}
        ),
        pr AS (
            SELECT a.pid AS a, b.pid AS b FROM c a JOIN c b
            ON {_DB_D2} <= {_DB_EPS} * {_DB_EPS}
        ),
        deg AS (SELECT a, COUNT(*) AS deg FROM pr GROUP BY a),
        core AS (SELECT a AS pid FROM deg WHERE deg >= {_DB_MINPTS}),
        ce AS (
            SELECT p.a, p.b FROM pr p
            JOIN core x ON x.pid = p.a
            JOIN core y ON y.pid = p.b
            WHERE p.a <> p.b
        ),
        reach(a, b) AS (
            SELECT a, b FROM ce
            UNION
            SELECT r.a, e.b FROM reach r JOIN ce e ON e.a = r.b
        ),
        comp AS (
            SELECT x.pid,
                   LEAST(x.pid, COALESCE(MIN(r.b), x.pid)) AS cluster_id
            FROM core x LEFT JOIN reach r ON r.a = x.pid
            GROUP BY x.pid
        ),
        bord AS (
            SELECT p.a AS pid, MIN(m.cluster_id) AS cluster_id
            FROM pr p JOIN comp m ON m.pid = p.b
            WHERE p.a NOT IN (SELECT pid FROM core)
            GROUP BY p.a
        )
        SELECT c.pid AS custkey,
               CASE WHEN comp.pid IS NOT NULL THEN 'core'
                    WHEN bord.pid IS NOT NULL THEN 'border'
                    ELSE 'noise' END AS role,
               CAST(COALESCE(comp.cluster_id, bord.cluster_id) AS BIGINT)
                   AS cluster_id
        FROM c
        LEFT JOIN comp ON comp.pid = c.pid
        LEFT JOIN bord ON bord.pid = c.pid
        ORDER BY custkey
    """,
)
def dbscan_customers_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN density clustering over synthetic customer coordinates
    (operators.clustering.dbscan_grid, Ester et al. KDD'96) — composed
    from two operators the engine already owns: the grid-bucketed
    radius join finds every eps-neighborhood and large-star/small-star
    contraction collapses the core graph in O(log n) rounds. Border
    points take the MINIMUM cluster over their core neighbors (textbook
    DBSCAN leaves this order-dependent; the min rule is deterministic,
    which is what lets the oracle replay it), noise gets NULL. The
    oracle is the literal definition: brute-force pair join, degree
    count, recursive transitive closure over core-core edges."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") <= _DB_SLICE
    )
    pts = c.select(
        F.col("c_custkey").alias("pid"),
        spatial.synth_lat(F.col("c_custkey")).alias("lat"),
        spatial.synth_lon(F.col("c_custkey")).alias("lon"),
    )
    from pipeline_query_engine_demo_spark.operators.clustering import dbscan_grid

    out = dbscan_grid(pts, "pid", "lat", "lon", eps=_DB_EPS, min_pts=_DB_MINPTS)
    return out.select(
        F.col("pid").cast("bigint").alias("custkey"),
        "role",
        F.col("cluster_id").cast("bigint").alias("cluster_id"),
    ).orderBy("custkey")
