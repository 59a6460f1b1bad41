#!/usr/bin/env python
"""Dump .explain("formatted") for every bench entry (or a named subset)
WITHOUT executing the noop sink — guide-§1 plan triage for the
optimization rounds.  Probes that collect during plan construction still
run (bounded by their own contracts).

Usage: python scripts/dump_plans.py OUTDIR [name ...]
"""

from __future__ import annotations

import io
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    outdir = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(outdir, exist_ok=True)

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")
    extra = {}
    if os.path.isdir("/dev/shm"):
        shm_dir = "/dev/shm/spark-bench-local"
        os.makedirs(shm_dir, exist_ok=True)
        extra["spark.local.dir"] = shm_dir

    import bench as bench_mod
    import __spark_entry__ as entry_mod
    from flood_data_spark.session import get_spark

    spark = get_spark(app_name="dump_plans", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    todo = names or bench_mod.BENCH_QUERIES
    for name in todo:
        fn = qs.get(name) or bench_mod.EXTRA_QUERIES.get(name)
        if fn is None:
            print(f"SKIP {name}: unknown", flush=True)
            continue
        try:
            df = fn(spark, SF_DIR)
            buf = io.StringIO()
            stdout, sys.stdout = sys.stdout, buf
            try:
                df.explain("formatted")
            finally:
                sys.stdout = stdout
            with open(os.path.join(outdir, f"{name}.txt"), "w") as fh:
                fh.write(buf.getvalue())
            print(f"ok   {name}", flush=True)
        except Exception:
            print(f"ERR  {name}", flush=True)
            traceback.print_exc()
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
