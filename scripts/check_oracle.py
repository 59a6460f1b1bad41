#!/usr/bin/env python
"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every __spark_entry__.queries() entry on Spark at sf0.01 and its
oracle_sql() twin on DuckDB over the same parquet files, then compares:
row count, sorted column names, and order-insensitive values (floats rounded
to 9 significant digits, dates/timestamps ISO-normalized).

Usage:  python scripts/check_oracle.py [query ...]

Env:
  CHECK_ORACLE_SF_DIR   parquet dir (default /root/testdata/sf0.01)
  CHECK_ORACLE_VANILLA  bare SparkSession (driver-harness replica)
  CHECK_ORACLE_JSON     path: also write a per-query JSON artifact
                        (the round-end CORRECTNESS_FULL_r{N}.json)
  CHECK_ORACLE_PERTURB  "1": partition-perturbation mode — every
                        value-gated query whose Spark result carries
                        float/double columns is rerun under perturbed
                        partitionings (shuffle.partitions 1 and 7, tiny
                        files.maxPartitionBytes so the scan splits
                        differently) and the canonical rows must be
                        IDENTICAL to the baseline run.  This is the
                        local harness for the r8/r9 lesson: a raw double
                        sum is not a pure function of the data — a gate
                        that only passes under one partitioning is a red
                        gate waiting for the driver's partitioning.
"""

from __future__ import annotations

import datetime
import math
import os
import sys
import time

import duckdb

# Pin the PROCESS timezone, not just the Spark session: PySpark collect()
# converts TimestampType to naive datetimes in the host's LOCAL zone
# (session timeZone governs computation, not Python-side conversion), while
# DuckDB returns the stored UTC-equivalent naive value — on a non-UTC host
# every timestamp-returning query would spuriously mismatch.
os.environ["TZ"] = "UTC"
if hasattr(time, "tzset"):
    time.tzset()

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("CHECK_ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Perturbation profiles: each changes BOTH the scan partitioning (tiny
# maxPartitionBytes → many input splits → different mapInPandas/partial-agg
# groupings) and the shuffle width (different reduce-side accumulation
# order).  A deterministic operator must produce bit-identical canonical
# rows under all of them.
PERTURB_PROFILES = [
    {"spark.sql.shuffle.partitions": "1",
     "spark.sql.files.maxPartitionBytes": "1g"},
    {"spark.sql.shuffle.partitions": "7",
     "spark.sql.files.maxPartitionBytes": "131072"},
]


def norm_val(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return "0"
        return f"{v:.9g}"
    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat()
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canon(rows, cols):
    # lowercase sort key: the column-name equality check is
    # case-insensitive, so the value alignment must be too — a case-only
    # alias difference must not permute columns differently per side
    order = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    out = []
    for r in rows:
        out.append(tuple(norm_val(r[i]) for i in order))
    out.sort()
    return out


def main():
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = sys.argv[1:] or list(qs.keys())
    unknown = [n for n in names if n not in qs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}; available: {sorted(qs)}")

    if os.environ.get("CHECK_ORACLE_VANILLA"):
        # Replicate the driver's harness: a bare SparkSession with NO
        # factory SQL confs — queries must be self-sufficient (e.g. set the
        # nanos-parquet and timezone confs at runtime themselves).  Only the
        # master string follows the env (parallelism isn't a SQL conf).
        from pyspark.sql import SparkSession
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
        spark = (SparkSession.builder.master(f"local[{cpus}]")
                 .appName("oracle-check-vanilla").getOrCreate())
    else:
        from flood_data_spark.session import get_spark
        spark = get_spark(app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    failures = []
    records = {}
    for name in names:
        fn = qs[name]
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            records[name] = {"status": "fail",
                             "error": f"spark error: {e}"[:300]}
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            records[name] = {"status": "rows_only", "rows": len(s_rows),
                             "sec": round(time.time() - t0, 1)}
            print(f"rows  {name}: {len(s_rows)} rows (no oracle — rows-only "
                  f"check), {time.time()-t0:.1f}s")
            continue
        try:
            o = con.execute(oracles[name])
            o_cols = [d[0] for d in o.description]
            o_rows = o.fetchall()
            # typed view: HUGEINT-derived columns (e.g. a window sum(BIGINT))
            # surface as float64 through pandas even when every value is an
            # integer — the driver's comparator sees 3.0 vs Spark's 3 and
            # hash-fails while this script's stringified compare passes
            # (the r4/r5 q_pack_sequences divergence).  Flag any column
            # that is float in pandas but integral on the Spark side.
            # LIMIT 0: the pandas dtype mapping is schema-driven, so the
            # probe must not re-execute the (sometimes deliberately
            # quadratic) oracle a second time for its rows.
            o_pdtypes = dict(
                con.execute(f"SELECT * FROM ({oracles[name]}) _q LIMIT 0")
                .fetchdf().dtypes.astype(str))
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue

        problems = []
        s_types = dict(sdf.dtypes)
        for c in s_types:
            if (s_types[c] in ("bigint", "int", "smallint", "tinyint")
                    and o_pdtypes.get(c, "").startswith("float")):
                problems.append(
                    f"typed mismatch: {c} is {s_types[c]} on Spark but "
                    f"{o_pdtypes[c]} via DuckDB->pandas (cast the oracle "
                    f"column to BIGINT)")
            # and the reverse direction: a Spark double against a DuckDB
            # integer stringifies equal here ('3' == '3') but 3.0 vs 3
            # hash-fails at the driver just the same
            if (s_types[c] in ("double", "float")
                    and o_pdtypes.get(c, "").startswith("int")):
                problems.append(
                    f"typed mismatch: {c} is {s_types[c]} on Spark but "
                    f"{o_pdtypes[c]} via DuckDB->pandas (cast one side so "
                    f"the value types agree)")
        if len(s_rows) != len(o_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(o_rows)}")
        if sorted(c.lower() for c in s_cols) != sorted(c.lower() for c in o_cols):
            problems.append(f"columns spark={sorted(s_cols)} duck={sorted(o_cols)}")
        if not problems:
            cs, co = canon(s_rows, s_cols), canon(o_rows, o_cols)
            if cs != co:
                ndiff = sum(1 for a, b in zip(cs, co) if a != b)
                problems.append(f"values differ ({ndiff} of {len(cs)} rows)")
                for a, b in zip(cs, co):
                    if a != b:
                        problems.append(f"  spark {a}")
                        problems.append(f"  duck  {b}")
                        break
        if not problems and os.environ.get("CHECK_ORACLE_PERTURB") and any(
                t in ("double", "float") for t in s_types.values()):
            cs0 = canon(s_rows, s_cols)
            keys = sorted({k for p in PERTURB_PROFILES for k in p})
            saved = {k: spark.conf.get(k, None) for k in keys}
            try:
                for prof in PERTURB_PROFILES:
                    for k, v in prof.items():
                        spark.conf.set(k, v)
                    spark.catalog.clearCache()
                    try:
                        p_rows = [tuple(r) for r in
                                  qs[name](spark, SF_DIR).collect()]
                    except Exception as e:
                        problems.append(f"perturb {prof}: spark error: "
                                        f"{e}"[:300])
                        break
                    if canon(p_rows, s_cols) != cs0:
                        nd = sum(1 for a, b in zip(canon(p_rows, s_cols),
                                                   cs0) if a != b)
                        problems.append(
                            f"NOT partition-invariant under {prof}: "
                            f"{nd} rows flipped vs baseline run")
                        break
            finally:
                for k, v in saved.items():
                    if v is None:
                        spark.conf.unset(k)
                    else:
                        spark.conf.set(k, v)

        if problems:
            failures.append(name)
            records[name] = {"status": "fail", "problems": problems[:4]}
            print(f"FAIL  {name}: " + "; ".join(problems[:1]))
            for p in problems[1:4]:
                print("      " + p)
        else:
            rec = {"status": "ok", "rows": len(s_rows),
                   "sec": round(time.time() - t0, 1)}
            if os.environ.get("CHECK_ORACLE_PERTURB"):
                # explicit 0 for gates with no float columns (integer
                # outputs are partition-invariant by construction), so
                # the round-end artifact shows invariance COVERAGE, not
                # just the queries that happened to be rerun
                rec["perturbed"] = (
                    len(PERTURB_PROFILES) if any(
                        t in ("double", "float")
                        for t in s_types.values()) else 0)
            records[name] = rec
            print(f"ok    {name}: {len(s_rows)} rows match"
                  + (", partition-invariant"
                     if rec.get("perturbed", 0) > 0 else "")
                  + f", {time.time()-t0:.1f}s")
        # the contract queries cache relations internally (kept/dropped,
        # sigs, exact truth sides) and cannot unpersist before their
        # result is consumed — clear between queries so a full run doesn't
        # accumulate pinned blocks for its whole lifetime (same hygiene as
        # bench.py)
        spark.catalog.clearCache()

    out_path = os.environ.get("CHECK_ORACLE_JSON")
    if out_path:
        import json
        n_ok = sum(1 for r in records.values() if r["status"] == "ok")
        n_rows_only = sum(1 for r in records.values()
                          if r["status"] == "rows_only")
        n_perturbed = sum(1 for r in records.values()
                          if r.get("perturbed", 0) > 0)
        with open(out_path, "w") as f:
            json.dump({"sf_dir": SF_DIR, "n_queries": len(names),
                       "n_value_match": n_ok, "n_rows_only": n_rows_only,
                       "n_perturbed": n_perturbed,
                       "n_failed": len(failures), "failed": failures,
                       "queries": records}, f, indent=1, sort_keys=True)
        print(f"wrote {out_path}")

    print()
    if failures:
        print(f"{len(failures)} FAILED: {failures}")
        sys.exit(1)
    print(f"all {len(names)} queries passed")


if __name__ == "__main__":
    main()
