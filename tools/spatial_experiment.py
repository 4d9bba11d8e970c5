"""Scale + skew evidence for the spatial family (r5 verdict task 5).

Part 1 — uniform x10 scale: the spatial gate queries derive their
coordinates from table KEYS (operators.spatial.synth_lat/lon), so a
key-shifted x10 customer replica — the exact construction
tools/scale_experiment.py uses for the fact tables — yields 10x
uniformly-spread points through the UNMODIFIED registered queries
(spatial_radius_join_pairs, spatial_nearest_supplier,
spatial_grid_density). A geo-scaled twin directory symlinks every
fixture table and replaces customer.parquet with the x10 replica.

Part 2 — hot-cell stress: every point (both sides) collapsed into ONE
cell of the default grid (point spread << radius) — the degenerate
limit of an urban cluster. The TRUE pair output is quadratic there (no
algorithm emits N^2 pairs in o(N^2)); the design claim under test is
the same as the LSH hot-bucket cap's: `radius_join(...,
max_cell_points=...)` detects the hot cell with one combinable count
and EXCLUDES it (documented recall trade), so wall time stays in the
uniform band instead of melting one reducer. The uncapped hot run is
timed at x1 only — at x1 it already exceeds the uniform x10 time,
which is the quadratic meltdown made visible without burning minutes.

Writes nothing to the repo; data in /tmp. Results go to SCALE.md.
Usage: python tools/spatial_experiment.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
FACTOR = 10
OUT_GEO = f"/tmp/spark_graft_geo{FACTOR}"

SPATIAL_QUERIES = [
    "spatial_radius_join_pairs",
    "spatial_nearest_supplier",
    "spatial_grid_density",
]


def build_geo_dir(spark) -> None:
    os.makedirs(OUT_GEO, exist_ok=True)
    from pipeline_query_engine_demo_spark.sources.catalog import load_table

    tables = [
        "region", "nation", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings",
    ]
    for t in tables:
        link = os.path.join(OUT_GEO, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(BASE, f"{t}.parquet"), link)
    dest = os.path.join(OUT_GEO, "customer.parquet")
    if os.path.exists(dest):
        return
    base = load_table(spark, BASE, "customer")
    copies = [
        base.withColumn("c_custkey", F.col("c_custkey") + F.lit(i * 10**9))
        for i in range(FACTOR)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.write.mode("overwrite").parquet(dest)
    print(f"built x{FACTOR} customer: {out.count()} rows", file=sys.stderr)


def time_queries(spark, sf_dir: str) -> dict[str, float]:
    from pipeline_query_engine_demo_spark import plans

    qs = plans.queries()
    out = {}
    for name in SPATIAL_QUERIES:
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()  # warm
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        out[name] = round(time.perf_counter() - t0, 2)
    return out


def hot_cell_points(spark, n: int, prefix: int):
    """n points all inside the (0, 0) cell of the side-1.0 grid:
    uniform jitter in [0.1, 0.9) derived from the key (deterministic,
    no Date/random)."""
    return spark.range(1, n + 1).select(
        (F.col("id") + F.lit(prefix)).alias("id"),
        ((F.col("id") * 7919 % 8000) / F.lit(10000.0) + F.lit(0.1)).alias("lat"),
        ((F.col("id") * 104729 % 8000) / F.lit(10000.0) + F.lit(0.1)).alias("lon"),
    )


def uniform_points(spark, n: int, prefix: int):
    from pipeline_query_engine_demo_spark.operators import spatial

    return spark.range(1, n + 1).select(
        (F.col("id") + F.lit(prefix)).alias("id"),
        spatial.synth_lat(F.col("id")).alias("lat"),
        spatial.synth_lon(F.col("id")).alias("lon"),
    )


def time_radius(left, right, r, cap=None) -> tuple[float, int]:
    from pipeline_query_engine_demo_spark.operators import spatial

    df = spatial.radius_join(left, right, r, max_cell_points=cap)
    t0 = time.perf_counter()
    n = df.count()
    return round(time.perf_counter() - t0, 2), n


def main() -> None:
    from pipeline_query_engine_demo_spark.session import get_spark

    spark = get_spark("spatial-experiment")
    spark.sparkContext.setLogLevel("ERROR")

    build_geo_dir(spark)
    base = time_queries(spark, BASE)
    scaled = time_queries(spark, OUT_GEO)
    scale_report = {
        name: {
            "sf0.1_sec": base[name],
            f"x{FACTOR}_sec": scaled[name],
            "scaling": round(scaled[name] / base[name], 1) if base[name] else None,
        }
        for name in SPATIAL_QUERIES
    }

    # hot-cell stress (operator level: coordinates are key-derived in
    # the fixture queries, so collapsing them requires synthetic points)
    n_c, n_s = 15000, 1000
    skew = {}
    # warm the operator path
    time_radius(uniform_points(spark, n_c, 0), uniform_points(spark, n_s, 10**8), 1.0)
    t_uni, p_uni = time_radius(
        uniform_points(spark, n_c, 0), uniform_points(spark, n_s, 10**8), 1.0
    )
    t_uni10, p_uni10 = time_radius(
        uniform_points(spark, FACTOR * n_c, 0),
        uniform_points(spark, n_s, 10**8),
        1.0,
    )
    t_hot1, p_hot1 = time_radius(
        hot_cell_points(spark, n_c, 0), hot_cell_points(spark, n_s, 10**8), 1.0
    )
    t_hot10_cap, p_hot10_cap = time_radius(
        hot_cell_points(spark, FACTOR * n_c, 0),
        hot_cell_points(spark, n_s, 10**8),
        1.0,
        cap=500,
    )
    skew["uniform_x1"] = {"sec": t_uni, "pairs": p_uni}
    skew["uniform_x10"] = {"sec": t_uni10, "pairs": p_uni10}
    skew["hot_x1_uncapped"] = {"sec": t_hot1, "pairs": p_hot1}
    skew["hot_x10_capped"] = {"sec": t_hot10_cap, "pairs": p_hot10_cap}
    skew["hot_x10_capped_vs_uniform_x10"] = (
        round(t_hot10_cap / t_uni10, 2) if t_uni10 else None
    )

    print(json.dumps({"scale": scale_report, "hot_cell": skew}, indent=2))


if __name__ == "__main__":
    main()
