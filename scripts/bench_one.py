#!/usr/bin/env python
"""Time individual bench entries in isolation (min-of-N through the noop
sink, same session posture as bench.py) and optionally dump
.explain("formatted") + Spark job counts per entry.

Usage:  python scripts/bench_one.py [-n 3] [--explain DIR] [--jobs] q1 [q2 ...]

This is the guide-§1 measurement tool for the optimization rounds: it
reproduces bench.py's environment (16g pre-sized heap, /dev/shm shuffle dir,
warmed page cache, warmed percentile/window/HOF codegen) so an isolated
reading is comparable to the entry's in-bench min-of-2, then reports
  name  min  [all readings]  n_jobs
n_jobs counts Spark jobs triggered by plan construction + the noop write —
a query whose construction fires eager collect()s shows up here.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("-n", type=int, default=3, help="passes (min reported)")
    ap.add_argument("--explain", metavar="DIR", default=None,
                    help="write <DIR>/<name>.txt with explain('formatted')")
    ap.add_argument("--jobs", action="store_true",
                    help="report Spark job count per timed execution")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")
    extra = {"spark.driver.extraJavaOptions": "-Xms16g"}
    if os.path.isdir("/dev/shm"):
        shm_dir = "/dev/shm/spark-bench-local"
        os.makedirs(shm_dir, exist_ok=True)
        extra["spark.local.dir"] = shm_dir

    import bench as bench_mod
    import __spark_entry__ as entry_mod
    from flood_data_spark.session import get_spark

    spark = get_spark(app_name="bench_one", extra_conf=extra)
    sc = spark.sparkContext
    qs = entry_mod.queries()

    spark.read.parquet(f"{SF_DIR}/region.parquet") \
        .write.format("noop").mode("overwrite").save()

    # warm the same operator classes bench.py warms
    from pyspark.sql import Window, functions as F
    warm = spark.range(100).select(
        (F.col("id") % 10).alias("k"), F.rand(7).alias("v"))
    (warm.join(F.broadcast(spark.range(10).withColumnRenamed("id", "k")), "k")
     .groupBy("k")
     .agg(F.percentile("v", F.array(F.lit(0.25), F.lit(0.5))).alias("p"),
          F.percentile_approx("v", 0.5).alias("pa"),
          F.approx_count_distinct("v").alias("d"))
     .withColumn("rn", F.row_number().over(
         Window.partitionBy(F.lit(1)).orderBy("k")))
     .write.format("noop").mode("overwrite").save())
    from flood_data_spark.datapipe.bpe import bpe_train as _warm_bpe
    _warm_bpe(spark.createDataFrame([(0, "ab ab"), (1, "cd")],
                                    "doc_id long, text string"),
              n_merges=1)[1].write.format("noop").mode("overwrite").save()

    # tier inputs (not timed)
    needed_tiers = any(x.endswith(("_x10", "_x100")) or "full" in x
                       for x in args.queries)
    if needed_tiers:
        bench_mod._scaled_lineitem_path(spark, SF_DIR)
        bench_mod._scaled_documents_path(spark, SF_DIR)
        bench_mod._scaled_events_path(spark, SF_DIR)

    def n_jobs() -> int:
        tracker = sc.statusTracker()
        ids = tracker.getJobIdsForGroup(None)
        return len(ids)

    def _next_job_id(sc):
        # AtomicInteger on Spark 4: py4j unwraps .get() results of some
        # accessors to a plain int depending on the build — handle both
        v = sc._jsc.sc().dagScheduler().nextJobId()
        return v if isinstance(v, int) else v.get()

    for name in args.queries:
        fn = qs.get(name) or bench_mod.EXTRA_QUERIES.get(name)
        if fn is None:
            print(f"?? unknown entry {name}", file=sys.stderr)
            continue
        readings = []
        jobs_delta = None
        for i in range(args.n):
            entry_mod.STREAM_BATCHES.clear()
            j0 = _next_job_id(sc) if args.jobs else 0
            t0 = time.time()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            if args.jobs:
                j1 = _next_job_id(sc)
                jobs_delta = j1 - j0
            readings.append(round(dt, 3))
            if args.explain and i == 0:
                os.makedirs(args.explain, exist_ok=True)
                with open(os.path.join(args.explain, f"{name}.txt"), "w") as f:
                    f.write(df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution
                        .ExplainMode.fromString("formatted")))
            if name not in ("q_ivf_build", "q_bm25_index_build"):
                spark.catalog.clearCache()
            spark._jvm.System.gc()
        extra_s = f"  jobs={jobs_delta}" if args.jobs else ""
        print(f"{name}: min={min(readings):.3f}  all={readings}{extra_s}")


if __name__ == "__main__":
    main()
