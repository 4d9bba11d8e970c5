"""Capture .explain("formatted") for queries into plans/<round>/<q>_<tag>.txt.

Usage: python tools/explain_capture.py <tag> <query>[,<query>...] [sf_dir]
The round directory defaults to r13; override with SPARK_GRAFT_PLAN_ROUND.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TAG = sys.argv[1]
NAMES = sys.argv[2].split(",")
SF_DIR = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r13"),
)


def main() -> None:
    from pipeline_query_engine_demo_spark import plans
    from pipeline_query_engine_demo_spark.session import get_spark

    spark = get_spark("explain-capture")
    spark.sparkContext.setLogLevel("ERROR")
    # Untruncated PushedFilters lists, same as tools/audit_plans.py.
    spark.conf.set("spark.sql.maxMetadataStringLength", "1000")
    qs = plans.queries()
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in NAMES:
        df = qs[name](spark, SF_DIR)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        out = os.path.join(OUT_DIR, f"{name}_{TAG}.txt")
        with open(out, "w") as f:
            f.write(txt)
        print(f"wrote {out} ({len(txt)} chars)")


if __name__ == "__main__":
    main()
