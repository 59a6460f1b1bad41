#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query runs once, cold (timings include planning + execution), matching
how the daily pipeline actually runs — single-shot batch jobs.  Results are
materialized through the noop sink so every projected column is computed.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: the flagship flood aggregation, the window-heavy peak query,
# classic relational shapes, and one of each beyond-reference family
BENCH_QUERIES = [
    "q_threshold_summary",
    "q_peak_timing",
    "q_tendency",
    "q_intensity",
    "q_pricing_summary",
    "q_region_revenue",
    "q_upstream_mask",
    "q_events_daily",
    "q_dedup_exact",
    "q_token_count",
    "q_quality",
    "q_cosine_topk",
    "q_minhash_lsh",
    "q_summary_forecast",
    "q_embedding_dedup",
    "q_ngram_jaccard",
    "q_point_lookup",
]


def main():
    import __spark_entry__ as entry_mod
    from flood_data_spark.session import get_spark

    spark = get_spark(app_name="bench")
    qs = entry_mod.queries()

    # trigger JVM + parquet footer + noop-sink warm-up outside the timed
    # region (the first noop write otherwise pays one-time codegen setup)
    spark.read.parquet(f"{SF_DIR}/region.parquet") \
        .write.format("noop").mode("overwrite").save()

    timings = {}
    total = 0.0
    for name in BENCH_QUERIES:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        # noop sink, NOT count(): count() lets Catalyst prune unreferenced
        # projections, so pure per-row transform queries (token counting,
        # quality scoring) would measure only the parquet scan
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.2f}s", file=sys.stderr)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "headline_queries_total_runtime",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
