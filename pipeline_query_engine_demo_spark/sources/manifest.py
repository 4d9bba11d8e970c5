"""File-level min/max stats manifest — hand-built Delta/Iceberg-style
data skipping.

The scan-reduction family the partitioned-layout queries demonstrate
has four tiers, each eliminating work at a different granularity:

1. **directory** — static partition pruning / DPP (PartitionFilters);
2. **file** — THIS module: a persisted per-file min/max manifest lets
   the planner drop whole files from the read *before Spark ever lists
   or opens them* — at 100 TB the footer reads themselves are the
   bottleneck this tier removes (a million files × one footer round
   trip each is minutes of pure metadata latency; Delta's add-file
   stats and Iceberg's manifest files exist for exactly this reason);
3. **row group / page** — parquet footer + column-index statistics
   (clustered_layout_rowgroup_skip);
4. **row** — the runtime bloom filter (bloom_filter_pruned_join).

Spark has no built-in persisted file-stats index for plain parquet
(that is the lakehouse formats' job), so the manifest is built the way
those formats build theirs: one DISTRIBUTED pass at write time
(charged to ingest, like Delta's stats collection) keyed by
``_metadata.file_path``, persisted as a tiny parquet table — one row
per data file. The read side consults the manifest on the DRIVER: this
is a metadata-plane read (pyarrow over a table whose row count equals
the file count, never the data), exactly as Delta reads its
transaction log or Iceberg its manifest list on the driver/coordinator
before handing the pruned file list to the distributed scan. No
``.collect()`` of query data is involved — the package-wide
zero-collect invariant covers the data plane, and this module never
touches it.

The reference engine scans one in-memory vector
(``src/executor/mod.rs:250-276``) and has no on-disk layout at all;
this module is part of the at-scale layout story SURVEY.md §4 claims.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pyspark.sql.functions as F
from pyspark.sql import SparkSession

#: Fixed manifest schema: one row per data file of the indexed layout.
MANIFEST_COLUMNS = ("file_path", "min_key", "max_key", "n_rows")


def write_file_manifest(
    spark: SparkSession, layout_path: str, key_col: str, manifest_path: str
) -> None:
    """One distributed pass over ``layout_path`` collecting per-file
    min/max/count of ``key_col`` into a parquet manifest. The groupBy
    key is the scan-provided ``_metadata.file_path`` (no UDF, no extra
    column stored in the data files); the manifest coalesces to one
    file because its cardinality is the FILE count, not the row count.
    Idempotent via overwrite; callers gate on the layout's own
    ``_SUCCESS`` marker."""
    (
        spark.read.parquet(layout_path)
        .select(F.col("_metadata.file_path").alias("file_path"), key_col)
        .groupBy("file_path")
        .agg(
            F.min(key_col).alias("min_key"),
            F.max(key_col).alias("max_key"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(manifest_path)
    )


def manifest_files(manifest_path: str) -> list[str]:
    """All data files the manifest indexes — the metadata-plane file
    listing (replaces a filesystem LIST, which at 100 TB object stores
    throttle and bill per call)."""
    d = pq.read_table(manifest_path, columns=["file_path"]).to_pydict()
    return list(d["file_path"])


def prune_files_by_range(
    manifest_path: str, lo: int, hi: int
) -> tuple[list[str], int]:
    """Driver-side metadata-plane read of the manifest: return the data
    files whose [min_key, max_key] interval intersects [lo, hi], plus
    the total file count. A file is skipped here without ever being
    listed, opened, or footer-read by the scan — the tier of
    elimination partition pruning can't express (no directory
    structure) and footer stats can't reach (the footer read IS the
    cost being avoided). pyarrow's dataset reader ignores
    underscore-prefixed members (``_SUCCESS``)."""
    man = pq.read_table(manifest_path, columns=list(MANIFEST_COLUMNS[:3]))
    d = man.to_pydict()
    total = len(d["file_path"])
    selected = [
        f
        for f, mn, mx in zip(d["file_path"], d["min_key"], d["max_key"])
        if mx >= lo and mn <= hi
    ]
    return selected, total
