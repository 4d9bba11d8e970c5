"""Skyline operator semantics the oracle hash can't localize: the
two-phase plan versus a literal O(n^2) dominance scan on adversarial
point sets — exact-duplicate points (kept: no strict coordinate), ties
in a single dimension, a fully anti-correlated diagonal (the skyline IS
the data), and bucket-count invariance."""

from __future__ import annotations

import numpy as np

from pipeline_query_engine_demo_spark.operators.skyline import skyline_2d


def _brute(points, maximize_y):
    out = set()
    for i, x, y in points:
        dominated = False
        for _, qx, qy in points:
            if maximize_y:
                dom = qx <= x and qy >= y and (qx < x or qy > y)
            else:
                dom = qx <= x and qy <= y and (qx < x or qy < y)
            if dom:
                dominated = True
                break
        if not dominated:
            out.add(i)
    return out


def test_skyline_matches_brute_force_on_adversarial_sets(spark):
    rng = np.random.default_rng(11)
    sets = {
        "random": [
            (i, float(x), float(y))
            for i, (x, y) in enumerate(
                zip(rng.integers(0, 50, 200), rng.integers(0, 50, 200))
            )
        ],
        # anti-correlated diagonal: EVERY point is in the skyline
        "diagonal": [(i, float(i), float(100 - i)) for i in range(60)],
        # identical duplicates + single-dim ties
        "ties": [
            (0, 1.0, 1.0),
            (1, 1.0, 1.0),   # exact duplicate of 0 -> both kept
            (2, 1.0, 2.0),   # dominated by 0 (tie x, strict y)
            (3, 2.0, 1.0),   # dominated by 0 (strict x, tie y)
            (4, 0.5, 3.0),
            (5, 3.0, 0.5),
        ],
    }
    for label, pts in sets.items():
        df = spark.createDataFrame(pts, "id long, x double, y double")
        for maximize_y in (False, True):
            got = {
                r["id"]
                for r in skyline_2d(
                    df, "id", "x", "y", maximize_y=maximize_y
                ).collect()
            }
            assert got == _brute(pts, maximize_y), (label, maximize_y)
    assert len(_brute(sets["diagonal"], False)) == 60  # worst case confirmed


def test_skyline_bucket_count_invariance(spark):
    """The local prune is exact within any partitioning, so the result
    must be identical for 1 bucket (global single-pass) and 32."""
    rng = np.random.default_rng(3)
    pts = [
        (i, float(x), float(y))
        for i, (x, y) in enumerate(
            zip(rng.integers(0, 30, 300), rng.integers(0, 30, 300))
        )
    ]
    df = spark.createDataFrame(pts, "id long, x double, y double")
    one = {r["id"] for r in skyline_2d(df, "id", "x", "y", buckets=1).collect()}
    many = {r["id"] for r in skyline_2d(df, "id", "x", "y", buckets=32).collect()}
    assert one == many == _brute(pts, False)
