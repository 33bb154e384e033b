#!/usr/bin/env python
"""Round-7 optimization probes (bench.py is FROZEN for measurement; every
number cited in OPTIMIZATION_r07.md that does not come from bench.py comes
from here).

Modes:
  --flagship-stages   per-stage walls of the sf0.1 flagship pipeline
  --isolate Q [Q...]  fresh-session timing of single bench queries
  --explain Q [Q...]  dump .explain('formatted') for a query to stdout
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))


def _spark(cpus=None):
    from duplicate_image_detector_spark.session import get_spark

    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    return get_spark(app_name="bench_extra", master=f"local[{cpus}]")


def flagship_stages() -> None:
    """Stage-by-stage walls of the exact bench.py flagship flow."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _spark()
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    from duplicate_image_detector_spark.config import PipelineConfig
    from duplicate_image_detector_spark.plans import pipeline as P
    from duplicate_image_detector_spark.sources.checkpoints import (
        CheckpointManager,
    )

    walls: dict[str, float] = {}
    orig_run = CheckpointManager.run

    def timed_run(self, stage, fn, *args, **kwargs):
        t0 = time.time()
        out = orig_run(self, stage, fn, *args, **kwargs)
        walls[stage] = walls.get(stage, 0.0) + round(time.time() - t0, 3)
        return out

    CheckpointManager.run = timed_run
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        pages = docs.select(
            F.concat(F.lit("doc://"), F.col("doc_id")).alias("url"), "text"
        )
        t0 = time.time()
        res = P.run_pipeline(
            spark, pages, PipelineConfig(), enable_substring=True
        )
        n = res.clusters.count()
        total = time.time() - t0
        res.ckpt.unpersist_all()
    finally:
        CheckpointManager.run = orig_run
    print(json.dumps({"total_sec": round(total, 3), "n_clustered": n,
                      "stage_walls_sec": walls}))
    spark.stop()


def isolate(queries: list[str], out_path: str | None = None) -> None:
    """Time bench queries in THIS session (one fresh JVM per invocation),
    same cold-cache discipline as bench.py."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _spark()
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    results = {}
    for q in queries:
        E.clear_caches()
        fn = getattr(E, f"q_{q}")
        t0 = time.time()
        fn(spark, sf_dir).count()
        results[q] = round(time.time() - t0, 3)
    print(json.dumps({"isolated": results}))
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(results, fh)
    spark.stop()


def explain(queries: list[str]) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _spark()
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    for q in queries:
        E.clear_caches()
        fn = getattr(E, f"q_{q}")
        df = fn(spark, sf_dir)
        print(f"===== {q} =====")
        print(df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"))
    spark.stop()


if __name__ == "__main__":
    if "--flagship-stages" in sys.argv:
        flagship_stages()
    elif "--isolate" in sys.argv:
        i = sys.argv.index("--isolate")
        isolate(sys.argv[i + 1:])
    elif "--explain" in sys.argv:
        i = sys.argv.index("--explain")
        explain(sys.argv[i + 1:])
    else:
        print(__doc__)
