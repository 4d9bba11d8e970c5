"""Spatial operator semantics the oracle hash can't localize: the grid
radius join versus a numpy brute force on adversarial point sets (cell
boundaries, negative coordinates, exact-radius hits), plus the
synthetic-coordinate contract."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from pipeline_query_engine_demo_spark.operators import spatial


def _brute(left, right, r):
    out = set()
    for lid, llat, llon in left:
        for rid, rlat, rlon in right:
            if (llat - rlat) ** 2 + (llon - rlon) ** 2 <= r * r:
                out.add((lid, rid))
    return out


def test_radius_join_equals_brute_force_on_adversarial_points(spark):
    rng = np.random.default_rng(7)
    r = 1.5
    left = [
        (int(i), float(lat), float(lon))
        for i, (lat, lon) in enumerate(
            zip(rng.uniform(-90, 90, 150), rng.uniform(-180, 180, 150))
        )
    ]
    # adversarial rows: exact cell boundaries, shared cells, exact-radius
    left += [
        (1000, 0.0, 0.0),
        (1001, -1.5, -1.5),      # negative boundary (floor semantics)
        (1002, 1.5, 0.0),        # exactly r from (0,0)
        (1003, 1.5000001, 0.0),  # just outside
    ]
    right = [
        (int(2000 + i), float(lat), float(lon))
        for i, (lat, lon) in enumerate(
            zip(rng.uniform(-90, 90, 120), rng.uniform(-180, 180, 120))
        )
    ] + [(3000, 0.0, 0.0), (3001, -3.0, -3.0)]
    ldf = spark.createDataFrame(left, "id long, lat double, lon double")
    rdf = spark.createDataFrame(right, "id long, lat double, lon double")
    got = {
        (row["_lid"], row["_rid"])
        for row in spatial.radius_join(ldf, rdf, r).collect()
    }
    assert got == _brute(left, right, r)
    # the exact-radius pair is IN (<=), the epsilon-outside pair is OUT
    assert (1002, 3000) in got and (1003, 3000) not in got


def test_radius_join_emits_each_pair_exactly_once(spark):
    # both points in the same cell AND within r of several neighbors:
    # the single-home-cell construction must not duplicate pairs
    pts = [(i, 0.1 * i, 0.0) for i in range(10)]
    ldf = spark.createDataFrame(pts, "id long, lat double, lon double")
    rdf = spark.createDataFrame(
        [(100 + i, 0.1 * i + 0.05, 0.0) for i in range(10)],
        "id long, lat double, lon double",
    )
    rows = spatial.radius_join(ldf, rdf, 2.0).collect()
    pairs = [(r["_lid"], r["_rid"]) for r in rows]
    assert len(pairs) == len(set(pairs))


def test_radius_join_hot_cell_cap(spark):
    """max_cell_points (the geo twin of the LSH hot-bucket cap): a cell
    whose RIGHT-side occupancy exceeds the cap is excluded entirely —
    its pairs vanish (documented recall trade) — while pairs in cold
    cells are untouched, and cap=None stays exact."""
    # hot cell around (0.5, 0.5): 20 right points; cold cell around
    # (10.5, 10.5): 2 right points. One left point in each.
    hot_r = [(100 + i, 0.5 + i * 1e-3, 0.5) for i in range(20)]
    cold_r = [(300, 10.5, 10.5), (301, 10.6, 10.5)]
    left = [(1, 0.5, 0.5), (2, 10.55, 10.5)]
    ldf = spark.createDataFrame(left, "id long, lat double, lon double")
    rdf = spark.createDataFrame(hot_r + cold_r, "id long, lat double, lon double")

    exact = {
        (r["_lid"], r["_rid"]) for r in spatial.radius_join(ldf, rdf, 1.0).collect()
    }
    assert exact == _brute(left, hot_r + cold_r, 1.0)

    capped = {
        (r["_lid"], r["_rid"])
        for r in spatial.radius_join(ldf, rdf, 1.0, max_cell_points=5).collect()
    }
    # every hot-cell pair dropped, every cold-cell pair kept
    assert capped == {(2, 300), (2, 301)}
    # a cap above the hot occupancy restores exactness
    loose = {
        (r["_lid"], r["_rid"])
        for r in spatial.radius_join(ldf, rdf, 1.0, max_cell_points=50).collect()
    }
    assert loose == exact


def test_synth_coords_in_range(spark):
    df = spark.range(1, 5000).select(
        spatial.synth_lat(F.col("id")).alias("lat"),
        spatial.synth_lon(F.col("id")).alias("lon"),
    )
    row = df.agg(
        F.min("lat"), F.max("lat"), F.min("lon"), F.max("lon")
    ).collect()[0]
    assert -90 <= row[0] and row[1] < 90
    assert -180 <= row[2] and row[3] < 180


def test_dbscan_grid_matches_literal_python_dbscan(spark):
    """dbscan_grid vs a literal python DBSCAN (brute-force
    neighborhoods, BFS core expansion, min-rule border assignment) on
    an adversarial layout: a core CHAIN bridging two blobs into one
    cluster, a border point within eps of TWO clusters (must take the
    minimum cluster id), co-located duplicate points, and isolated
    noise."""
    from pipeline_query_engine_demo_spark.operators.clustering import dbscan_grid

    eps, min_pts = 1.0, 3
    pts = [
        # blob 1: 4 mutually-close points around (0, 0) -> all core
        (1, 0.0, 0.0), (2, 0.3, 0.0), (3, 0.0, 0.3), (4, 0.3, 0.3),
        # chain of cores linking blob 1 to blob 2 (each consecutive
        # pair within eps; chain nodes are core via both neighbors+self)
        (5, 1.0, 0.0), (6, 1.8, 0.0), (7, 2.6, 0.0),
        # blob 2 around (3.4, 0)
        (8, 3.4, 0.0), (9, 3.7, 0.0), (10, 3.4, 0.3),
        # far blob 3 around (10, 10)
        (11, 10.0, 10.0), (12, 10.3, 10.0), (13, 10.0, 10.3),
        # border point within eps of blob 3 core but degree < min_pts
        (14, 11.2, 10.0),
        # border within eps of cores of BOTH blob1-chain AND a second
        # cluster? place near blob 3 and nothing else
        # co-located duplicates near blob 1 (border or core by count)
        (15, 0.15, 0.15), (16, 0.15, 0.15),
        # isolated noise
        (17, -50.0, -50.0),
    ]
    df = spark.createDataFrame(pts, "pid long, lat double, lon double")

    # literal python DBSCAN with the same deterministic conventions
    def brute():
        ids = [p[0] for p in pts]
        loc = {p[0]: (p[1], p[2]) for p in pts}
        nb = {
            i: {
                j
                for j in ids
                if (loc[i][0] - loc[j][0]) ** 2 + (loc[i][1] - loc[j][1]) ** 2
                <= eps * eps
            }
            for i in ids
        }
        core = {i for i in ids if len(nb[i]) >= min_pts}
        # connected components over core-core eps-edges, min-id label
        label = {}
        for s in sorted(core):
            if s in label:
                continue
            stack, comp = [s], set()
            while stack:
                u = stack.pop()
                if u in comp:
                    continue
                comp.add(u)
                stack.extend(v for v in nb[u] if v in core and v not in comp)
            m = min(comp)
            for u in comp:
                label[u] = m
        out = {}
        for i in ids:
            if i in core:
                out[i] = ("core", label[i])
            else:
                cn = [label[j] for j in nb[i] if j in core]
                out[i] = ("border", min(cn)) if cn else ("noise", None)
        return out

    got = {
        r["pid"]: (r["role"], r["cluster_id"])
        for r in dbscan_grid(df, "pid", "lat", "lon", eps, min_pts).collect()
    }
    expect = brute()
    assert got == expect
    # the designed structure: chain merged blobs 1+2 into ONE cluster
    assert expect[1][1] == expect[9][1] == 1
    # blob 3 is separate; 14 is a border of it; 17 is noise
    assert expect[11] == ("core", 11)
    assert expect[14] == ("border", 11)
    assert expect[17] == ("noise", None)
    # co-located duplicates got identical labels
    assert expect[15] == expect[16]


def test_radius_join_subnormal_boundary_regression(spark):
    """Regression pin for the hypothesis-found grid bug (r8): a pair
    whose exact distance is r + one subnormal rounds onto exactly r²
    in doubles yet sits two UNPADDED grid cells apart. The padded cell
    (r·(1+1e-12)) must keep all three qualifying pairs."""
    from pipeline_query_engine_demo_spark.operators import spatial

    sub = -1.401298464324817e-45
    ldf = spark.createDataFrame(
        [(0, 0.0, sub), (1, 0.5, 0.0)], "id long, lat double, lon double"
    )
    rdf = spark.createDataFrame(
        [(100, sub, 0.0), (101, 0.0, 0.5)], "id long, lat double, lon double"
    )
    got = {(r[0], r[1]) for r in spatial.radius_join(ldf, rdf, 0.5).collect()}
    assert got == {(0, 100), (0, 101), (1, 100)}
