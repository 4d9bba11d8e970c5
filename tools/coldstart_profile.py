"""Cold-start attribution (round-10 verdict item 7).

bench.py reports ~34 s cold vs ~16 s warm for the 17 headline queries;
this tool attributes the gap with measured phase timings in a FRESH
process (each phase timed the first time it can possibly happen):

  py_imports      import pyspark + this package (incl. the vendored
                  protobuf fallback probe in session.py)
  jvm_session     SparkSession.builder.getOrCreate() — JVM launch
  first_action    first tiny job (spark.range count): scheduler + codegen
                  warm-up, no data
  first_scan      first Parquet read (region, 5 rows): Hadoop FS init +
                  footer machinery
  python_workers  first Arrow pandas_udf job: Python worker pool spawn
  q1_cold/q1_warm the first real query, then its steady-state rerun

Prints one JSON line; the numbers land in a BENCH_DETAIL note. The
parent re-execs itself so the measured process is genuinely cold.

Usage: python tools/coldstart_profile.py
"""

# NOTE: no `from __future__ import annotations` here — it stringifies
# the pandas_udf type hints and Spark's eval-type inference rejects them.
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def phases() -> None:
    sys.path.insert(0, REPO)
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out: dict[str, float] = {}
    t = time.perf_counter()

    def mark(name: str) -> None:
        nonlocal t
        now = time.perf_counter()
        out[name] = round(now - t, 3)
        t = now

    import pyspark  # noqa: F401
    from pipeline_query_engine_demo_spark.session import get_spark

    mark("py_imports")
    spark = get_spark("coldstart-profile")
    mark("jvm_session")
    spark.range(10).count()
    mark("first_action")
    spark.read.parquet(f"{sf}/region.parquet").count()
    mark("first_scan")
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _one(s: pd.Series) -> pd.Series:
        return s * 0 + 1

    spark.range(1000).select(_one(F.col("id"))).count()
    mark("python_workers")

    import __spark_entry__ as entry

    qs = entry.queries()
    qs["q1_pricing_summary"](spark, sf).write.mode("overwrite").format("noop").save()
    mark("q1_cold")
    qs["q1_pricing_summary"](spark, sf).write.mode("overwrite").format("noop").save()
    mark("q1_warm")
    out["total_to_first_result"] = round(sum(
        out[k] for k in ("py_imports", "jvm_session", "first_action",
                          "first_scan", "q1_cold")
    ), 3)
    print(json.dumps(out))


def main() -> None:
    if "--phases" in sys.argv:
        phases()
        return
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--phases"],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "SPARK_GRAFT_CPUS": os.environ.get("SPARK_GRAFT_CPUS", "32")},
    )
    line = next(
        (ln for ln in reversed(p.stdout.strip().splitlines()) if ln.startswith("{")),
        None,
    )
    if line is None:
        print(p.stdout[-2000:], p.stderr[-2000:], file=sys.stderr)
        sys.exit(1)
    print(line)


if __name__ == "__main__":
    main()
