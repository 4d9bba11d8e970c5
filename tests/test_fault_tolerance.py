"""Task-retry fault tolerance: a transient Python-side failure must be
retried by the scheduler and the query must still return exact results.

Local mode defaults to maxFailures=1 (any task failure kills the job),
so this runs in a SUBPROCESS with ``local[4,4]`` — 4 threads, 4 task
attempts — the knob a real cluster always has on. The planted fault is
deterministic: the first attempt of one specific partition raises; the
retry (attemptNumber > 0) succeeds. This is the single-box stand-in for
the lost-executor story: every operator in the engine is expressed as
deterministic DataFrame transforms over re-readable sources, so any
task is safe to re-execute (no side effects in the hot path — the one
sink family writes through Spark's committer, which handles attempt
isolation)."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = textwrap.dedent(
    """
    import json, sys
    from pyspark.sql import SparkSession
    from pyspark import TaskContext
    import pyspark.sql.functions as F

    marker_dir = sys.argv[1]
    spark = (
        SparkSession.builder.master("local[4,4]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )

    def flaky(batches):
        import os
        import pandas as pd
        tc = TaskContext.get()
        pid = tc.partitionId()
        if pid == 0 and tc.attemptNumber() == 0:
            # record that the fault was actually planted, then die
            open(os.path.join(marker_dir, "fault_planted"), "w").write("1")
            raise RuntimeError("planted transient failure (attempt 0)")
        if pid == 0 and tc.attemptNumber() > 0:
            open(os.path.join(marker_dir, "retried"), "w").write(
                str(tc.attemptNumber())
            )
        for pdf in batches:
            pdf["doubled"] = pdf["v"] * 2
            yield pdf

    df = spark.range(0, 1000, 1, 4).select(F.col("id").alias("v"))
    out = df.mapInPandas(flaky, schema="v long, doubled long")
    total = out.agg(
        F.sum("v").alias("sv"), F.sum("doubled").alias("sd")
    ).collect()[0]
    print(json.dumps({"sv": total.sv, "sd": total.sd}))
    spark.stop()
    """
)


def test_task_retry_survives_transient_python_failure(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    proc = subprocess.run(
        [sys.executable, str(script), str(tmp_path)],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    n = 1000
    assert result == {"sv": n * (n - 1) // 2, "sd": n * (n - 1)}
    # the fault really happened AND the retry really ran
    assert (tmp_path / "fault_planted").exists()
    assert (tmp_path / "retried").exists()
