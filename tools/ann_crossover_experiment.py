"""Expression-vs-numpy ANN scoring crossover (r11 verdict item 2).

Measures where the BLAS (pandas_udf / cogroup-matmul) tier overtakes
the HOF-expression tier as embedding DIMENSION grows, holding the
corpus at sf0.1 scale (50 k vectors, 5 queries, k=10). Corpus for
dim > 64 is the embeddings table with its vector tiled dim/64 times —
same distribution, bigger payload.

Both costs scale O(rows x dim), but with very different constants:
- expression tier: interpreted HOF fold per element on the JVM — no
  transfer, big per-element constant;
- numpy tier: one C matmul per Arrow batch — tiny per-element constant,
  but every row's vector crosses the JVM->Python Arrow pipe once (and
  the cogroup tier also pays one corpus shuffle).

So the crossover is driven by dim (per-row math vs per-row transfer),
not rows alone — x100-rows results in SCALE.md show the expression
tier WINNING at dim=64, and this experiment shows where that flips.

Usage: python tools/ann_crossover_experiment.py [dims...]  (default 64 256 1024)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
DIMS = [int(d) for d in sys.argv[1:]] or [64, 256, 1024]


def main() -> None:
    from pipeline_query_engine_demo_spark.operators import similarity
    from pipeline_query_engine_demo_spark.session import get_spark
    from pipeline_query_engine_demo_spark.sources.catalog import load_table

    spark = get_spark("ann-crossover")
    spark.sparkContext.setLogLevel("ERROR")

    base = load_table(spark, SF_DIR, "embeddings")

    def corpus_at(dim: int):
        reps = dim // 64
        if reps == 1:
            return base
        return base.withColumn(
            "embedding", F.flatten(F.array_repeat(F.col("embedding"), reps))
        )

    def timed(df) -> float:
        ts = []
        df.write.format("noop").mode("overwrite").save()  # warmup
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        return round(statistics.median(ts), 3)

    print(f"{'dim':>5} {'expr_cosine':>12} {'numpy_cosine':>13} {'winner':>8}")
    for dim in DIMS:
        c = corpus_at(dim)
        q = c.filter(F.col("vec_id") < 5)
        t_expr = timed(similarity.cosine_topk(c, q, "vec_id", "embedding", k=10))
        t_np = timed(similarity.numpy_cosine_topk(c, q, "vec_id", "embedding", k=10))
        print(
            f"{dim:>5} {t_expr:>12.3f} {t_np:>13.3f} "
            f"{'numpy' if t_np < t_expr else 'expr':>8}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
