"""Spatial joins the scale-correct way: grid-bucketed distance joins.

The reference engine has no spatial surface (its whole operator set is
scan/filter/hash-join/limit, ``/root/reference/src/executor/mod.rs:
250-466``); this family comes from the north star's "operations a
large-scale pipeline would need" mandate — radius joins and
nearest-neighbor lookups over point data are the geo twin of the ANN
bucket joins in :mod:`operators.similarity`.

The naive encoding of "pairs within distance r" is a cross join with a
distance filter — |A|·|B| pairs materialized before the filter prunes
them, the same quadratic melt-down LSH banding avoids for near-dup
text. The scale shape here is identical to every bucketed operator in
this repo:

1. snap every point to a grid cell of side >= r (``floor(coord / r)``);
2. one side additionally probes its 3x3 cell neighborhood (a bounded
   9-way explode — row amplification 9, not |B|);
3. cell equi-join (hash shuffle on cell id), then the exact distance
   predicate verifies candidates.

Any pair within r differs by at most one cell index per axis when the
cell side is >= r, so the 3x3 probe is RECALL-LOSSLESS — the join is
exactly the cross-join-filter semantics at a fraction of the cost, and
the DuckDB oracles prove that equivalence query-by-query (they run the
brute-force form).

Metric: PLANAR squared distance in coordinate units — pure
subtract/multiply/add, bit-identical across engines. Haversine needs
sin/cos/asin whose libm implementations are not bit-identical across
engines (the repo-wide transcendental rule, see functions/rounding),
so the gate metric stays planar; swapping ``_dist2`` for a haversine
expression changes nothing structural (grid cells then size by
r / 111 km per degree with the polar-cap caveat). Longitude wrap at
±180° is likewise ignored by BOTH engines identically — production
duplicates the ±180 strip into both wrap cells.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: Deterministic synthetic coordinates for fixture tables (no geo
#: columns ship in the TPC-H-ish fixtures): two primes spread keys
#: uniformly over the globe, and the arithmetic (integer multiply, mod,
#: one divide, one subtract) is the same exact IEEE sequence in Spark
#: and DuckDB.
LAT_PRIME = 7919
LON_PRIME = 104729


def synth_lat(key: Column) -> Column:
    """Latitude in [-90, 90) derived from an integer key."""
    return (key * LAT_PRIME % 18000) / F.lit(100.0) - F.lit(90.0)


def synth_lon(key: Column) -> Column:
    """Longitude in [-180, 180) derived from an integer key."""
    return (key * LON_PRIME % 36000) / F.lit(100.0) - F.lit(180.0)


def sql_synth_coords(key: str) -> tuple[str, str]:
    """The DuckDB twin of synth_lat/synth_lon for oracle SQL."""
    return (
        f"(({key} * {LAT_PRIME}) % 18000) / 100.0 - 90.0",
        f"(({key} * {LON_PRIME}) % 36000) / 100.0 - 180.0",
    )


def _dist2(lat_a: Column, lon_a: Column, lat_b: Column, lon_b: Column) -> Column:
    """Planar squared distance — exact IEEE arithmetic on both engines."""
    dlat = lat_a - lat_b
    dlon = lon_a - lon_b
    return dlat * dlat + dlon * dlon


def sql_dist2(lat_a: str, lon_a: str, lat_b: str, lon_b: str) -> str:
    """DuckDB twin of :func:`_dist2` with the same operation order."""
    return (
        f"(({lat_a}) - ({lat_b})) * (({lat_a}) - ({lat_b}))"
        f" + (({lon_a}) - ({lon_b})) * (({lon_a}) - ({lon_b}))"
    )


def radius_join(
    left: DataFrame,
    right: DataFrame,
    radius: float,
    left_cols: tuple[str, str, str] = ("id", "lat", "lon"),
    right_cols: tuple[str, str, str] = ("id", "lat", "lon"),
    max_cell_points: int | None = None,
) -> DataFrame:
    """All (left, right) pairs with planar distance <= ``radius``.

    ``left``/``right`` carry (id, lat, lon) under the given column
    names. Returns left id, right id, and ``dist2`` (exact squared
    distance, <= radius**2). The left side explodes into its 3x3 cell
    neighborhood; the right side keeps its single home cell, so every
    qualifying pair matches on EXACTLY one (cell_lat, cell_lon) key —
    no post-join distinct needed.

    Scale: one hash shuffle of 9·|left| + |right| rows on the cell id.
    Cell population is data-dependent; when a cell's RIGHT-side
    occupancy exceeds ``max_cell_points`` (an "urban cluster" — in the
    degenerate limit, every point in ONE cell), the per-cell candidate
    product goes quadratic, and if point spread is actually below the
    radius the TRUE output is quadratic too — no algorithm emits N²
    pairs in o(N²). ``max_cell_points`` is the geo twin of the LSH
    hot-bucket cap (operators.dedup.DEFAULT_MAX_BUCKET_SIZE): cells
    whose right-side count exceeds the cap are EXCLUDED entirely (a
    documented recall trade, detectable via spatial_grid_density /
    key_skew_profile before running), which bounds per-cell work at
    cap·9·occupancy_left instead of melting one reducer. Default None
    keeps exact semantics — the gate queries run uncapped and
    hash-match brute-force oracles."""
    lid, llat, llon = left_cols
    rid, rlat, rlon = right_cols
    r = float(radius)
    # Grid-cell size is radius PADDED by 1e-12 relative. The membership
    # predicate is double-evaluated dist2 <= r*r, and double rounding
    # can pull a pair whose EXACT distance is (r + subnormal) down onto
    # exactly r*r — hypothesis found the concrete case
    # ((0, -1.4e-45), (0.5, 0.0)) at r=0.5, where the two points sit in
    # cells -1 and +1 (two apart) yet pass the rounded test. Any pair
    # passing the double test has exact axis separation <= r*(1+2^-50),
    # so a cell size strictly above that keeps every passing pair
    # within one cell boundary and the 3x3 neighborhood stays
    # sufficient. Results only ever GAIN boundary pairs vs the unpadded
    # grid (prune is a superset), so distance-filter oracles are
    # unaffected.
    cell = r * (1.0 + 1e-12)
    l_pts = left.select(
        F.col(lid).alias("_lid"),
        F.col(llat).cast("double").alias("_llat"),
        F.col(llon).cast("double").alias("_llon"),
    )
    r_pts = right.select(
        F.col(rid).alias("_rid"),
        F.col(rlat).cast("double").alias("_rlat"),
        F.col(rlon).cast("double").alias("_rlon"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        ]
    )
    l_cells = l_pts.select(
        "_lid",
        "_llat",
        "_llon",
        F.explode(offsets).alias("_o"),
    ).select(
        "_lid",
        "_llat",
        "_llon",
        (F.floor(F.col("_llat") / F.lit(cell)) + F.col("_o.dy")).alias("_clat"),
        (F.floor(F.col("_llon") / F.lit(cell)) + F.col("_o.dx")).alias("_clon"),
    )
    r_cells = r_pts.select(
        "_rid",
        "_rlat",
        "_rlon",
        F.floor(F.col("_rlat") / F.lit(cell)).alias("_clat"),
        F.floor(F.col("_rlon") / F.lit(cell)).alias("_clon"),
    )
    if max_cell_points is not None:
        # Hot-cell exclusion: one partial-agg count per cell (skew-safe
        # map-side combine), then remove the HOT cells (count > cap)
        # from both sides with a broadcast left-anti join. The hot set
        # is bounded by |right| / cap regardless of data volume — the
        # cold set is nearly every occupied cell and grows with the
        # data, so broadcasting it would itself become the bottleneck
        # at 100 TB. Matches the LSH cap's drop-the-bucket semantics.
        hot = (
            r_cells.groupBy("_clat", "_clon")
            .agg(F.count(F.lit(1)).alias("_cn"))
            .filter(F.col("_cn") > F.lit(int(max_cell_points)))
            .select("_clat", "_clon")
        )
        r_cells = r_cells.join(F.broadcast(hot), ["_clat", "_clon"], "left_anti")
        l_cells = l_cells.join(F.broadcast(hot), ["_clat", "_clon"], "left_anti")
    d2 = _dist2(
        F.col("_llat"), F.col("_llon"), F.col("_rlat"), F.col("_rlon")
    )
    return (
        l_cells.join(r_cells, ["_clat", "_clon"])
        .select("_lid", "_rid", d2.alias("dist2"))
        .filter(F.col("dist2") <= F.lit(r * r))
    )
