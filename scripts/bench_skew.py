#!/usr/bin/env python
"""Skew-path microbenchmark: plans.scale.salted_join vs a plain shuffle
join on a planted-skew key, measured properly (N repetitions, min/median).

Deliberately NOT part of bench.py's single-shot headline set: on this
box's 8 GiB driver heap the 27M-row straggler sits near the GC/spill
boundary, and one-shot timings of the pair are bimodal (salted observed
anywhere from 4.5 s to 17 s in an aged session).  min-of-N isolates the
algorithmic effect from collector noise; the headline bench stays a
stable round-over-round comparator.

Shape (calibrated on local[32], 8 GiB heap — see docs/SCALE_NOTES.md):
- large side: 30M rows, key 0 holds 90% (range-generated: the map side
  must be near-free so wall clock isolates the REDUCE-side straggler; a
  parquet+explode large side measured map-dominated, no separation)
- small side: 250k keys — above the broadcast threshold in spirit; the
  run pins autoBroadcastJoinThreshold=-1 to enforce the no-broadcast
  regime salting exists for
- AQE skew-join splitting disabled for BOTH variants: it targets exactly
  this pattern and would (correctly) erase the difference; salted_join is
  for the shuffles AQE cannot re-split (first-line defense is always AQE)

Prints one JSON line:
  {"metric": "skew_join", "plain": {...}, "salted": {...},
   "speedup_min": N.NN, "runs": R}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = 30_000_000
KEY_DOMAIN = 250_000
SALT_BUCKETS = 16
RUNS = int(os.environ.get("SKEW_BENCH_RUNS", "3"))


def _inputs(spark):
    from pyspark.sql import functions as F
    big = spark.range(N_ROWS).select(
        F.when(F.col("id") % 10 < 9, F.lit(0))
        .otherwise(F.col("id") % KEY_DOMAIN).alias("k"),
        (F.col("id") * 3).alias("payload"))
    small = spark.range(KEY_DOMAIN).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("tag"))
    return big, small


def main():
    from flood_data_spark.plans.scale import salted_join
    from flood_data_spark.session import get_spark

    spark = get_spark(app_name="bench_skew")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def _conf(skew_on: bool, tuned: bool):
        # AQE itself stays on for all variants (it is on in every
        # production session); only the skew-join splitter + its
        # thresholds toggle.
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled",
                       "true" if skew_on else "false")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "2" if tuned else "5")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin."
            "skewedPartitionThresholdInBytes",
            "16m" if tuned else "256m")
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "16m" if tuned else "64m")

    # (skew_on, tuned, join_fn) per variant — all timed through the
    # identical noop write
    variants = {
        # no splitter: the raw straggler
        "plain": (False, False, lambda b, s: b.join(s, "k")),
        # the first-line defense AT DEFAULT thresholds (VERDICT r15
        # #7): measured, the splitter does NOT fire here — the
        # 27M-row hot partition is narrow longs that lz4-compress
        # UNDER the 256 MB byte threshold, so byte-calibrated skew
        # detection is blind to this row-count skew
        "aqe_default": (True, False, lambda b, s: b.join(s, "k")),
        # the same splitter with thresholds sized to the data
        # (16 MB): fires and re-balances
        "aqe_tuned": (True, True, lambda b, s: b.join(s, "k")),
        # explicit whole-row-hash salting: no byte heuristics, no
        # AQE preconditions
        "salted": (False, False,
                   lambda b, s: salted_join(b, s, "k",
                                            salt_buckets=SALT_BUCKETS)),
    }
    # warm codegen for both plan shapes outside the timed region
    _conf(False, False)
    for _on, _tuned, fn in variants.values():
        b, s = _inputs(spark)
        fn(b.limit(1000), s.limit(1000)) \
            .write.format("noop").mode("overwrite").save()

    results = {}
    for name, (skew_on, tuned, fn) in variants.items():
        _conf(skew_on, tuned)
        times = []
        for _ in range(RUNS):
            spark._jvm.System.gc()
            b, s = _inputs(spark)
            t0 = time.time()
            fn(b, s).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 2))
        results[name] = {"runs": times, "min": min(times),
                         "median": round(statistics.median(times), 2)}
        print(f"# {name}: {times} min={min(times)}", file=sys.stderr)
    _conf(False, False)

    print(json.dumps({
        "metric": "skew_join",
        "plain": results["plain"],
        "aqe_default": results["aqe_default"],
        "aqe_tuned": results["aqe_tuned"],
        "salted": results["salted"],
        "speedup_salted_min": round(results["plain"]["min"]
                                    / results["salted"]["min"], 2),
        "speedup_aqe_default_min": round(
            results["plain"]["min"] / results["aqe_default"]["min"], 2),
        "speedup_aqe_tuned_min": round(
            results["plain"]["min"] / results["aqe_tuned"]["min"], 2),
        "runs": RUNS,
        "n_rows": N_ROWS,
        "hot_share": 0.9,
        "salt_buckets": SALT_BUCKETS,
    }))


if __name__ == "__main__":
    main()
