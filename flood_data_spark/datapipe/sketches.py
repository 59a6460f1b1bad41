"""Sketch-backed corpus statistics — the one-pass summary path at 100 TB.

Exact per-column cardinality needs a distinct shuffle per column; the HLL++
sketch (`approx_count_distinct`, Spark-native, mergeable across partitions)
answers all columns in ONE scan with ~rsd relative error and constant
memory.  Heavy-hitter extraction stays exact but shuffle-light: tokens
partial-aggregate map-side, so the exchange carries one row per DISTINCT
token, not per occurrence — the groupBy formulation IS the scalable one
when the domain (vocabulary) is far smaller than the corpus.

No reference analog (SURVEY.md §2.11 family); same zero-UDF discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_distinct_stats(df: DataFrame, cols, rsd: float = 0.05) -> DataFrame:
    """One row: exact row count + HLL++ approximate distinct per column.

    One pass, no shuffle beyond the single-row final merge — the scale
    replacement for `SELECT count(DISTINCT c1), count(DISTINCT c2), ...`
    which plans one expand+shuffle per distinct column.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.approx_count_distinct(c, rsd)
                    .alias(f"{c}_approx_distinct"))
    return df.agg(*aggs)


def hll_contract(df: DataFrame, cols, rsd: float = 0.05,
                 tolerance_multiple: float = 4.0) -> DataFrame:
    """Bounds contract for the HLL path: one row with the EXACT distinct
    counts (oracle-checkable) plus a boolean per column asserting the
    sketch landed within tolerance_multiple × rsd of the truth.

    HLL++ rsd is a standard deviation, not a hard bound — 4σ makes a false
    alarm vanishingly rare while still catching implementation drift.
    """
    exact = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.countDistinct(c).alias(f"{c}_distinct") for c in cols])
    approx = df.agg(
        *[F.approx_count_distinct(c, rsd).alias(f"{c}_approx") for c in cols])
    checks = [
        (F.abs(F.col(f"{c}_approx") - F.col(f"{c}_distinct"))
         <= F.lit(tolerance_multiple * rsd) * F.col(f"{c}_distinct"))
        .alias(f"{c}_hll_ok")
        for c in cols]
    return (exact.crossJoin(approx)
            .select("n_rows",
                    *[F.col(f"{c}_distinct") for c in cols],
                    *checks))


def token_heavy_hitters(df: DataFrame, text_col: str = "text",
                        min_fraction: float = 0.01) -> DataFrame:
    """Tokens appearing in at least `min_fraction` of all token positions:
    (token, occurrences, fraction), descending.

    explode → groupBy partial-aggregates map-side: the shuffle moves one
    row per distinct token per partition — vocabulary-bounded, not
    corpus-bounded.  The total derives from the already-aggregated counts
    relation (sum of per-token occurrences == total token positions), so
    the corpus text is scanned and tokenized exactly ONCE — an
    independent `toks.agg(count)` plan would pay the full explode twice.
    """
    toks = (df.select(F.explode(
        F.split(F.trim(F.col(text_col)), r"\s+")).alias("token"))
        .filter(F.col("token") != ""))
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("occurrences"))
    total = counts.agg(F.sum("occurrences").alias("_total"))
    return (counts.crossJoin(F.broadcast(total))
            .filter(F.col("occurrences") >= F.col("_total") * min_fraction)
            .select("token", "occurrences",
                    F.round(F.col("occurrences") / F.col("_total"), 6)
                    .alias("fraction"))
            .orderBy(F.desc("occurrences"), F.asc("token")))


def _cms_col(key_col, row: int, width: int):
    """Row `row`'s hash position: md5 with a per-row salt, truncated to 13
    hex digits (fits a 52-bit int exactly — the bloom/uniform trick at
    `dedup._bloom_positions`) mod width.  Deterministic and replicable in
    ANSI SQL, so sketches are engine-portable artifacts."""
    h = F.md5(F.concat(F.lit(f"cms{row}:"), key_col))
    return (F.conv(F.substring(h, 1, 13), 16, 10).cast("bigint")
            % F.lit(width))


def cms_build(df: DataFrame, key_col: str = "token",
              width: int = 1024, depth: int = 4,
              weight_col: str | None = None) -> DataFrame:
    """Count-min sketch of a key column as a (row, col, cnt) relation —
    depth x width cells, upper-bounding every key's true (weighted) count.

    ONE scan: each input row explodes to its `depth` (row, col) positions
    and groupBy(row, col) partial-aggregates map-side, so the exchange
    carries at most depth*width cells per partition regardless of corpus
    size.  The result is MERGEABLE (`cms_merge` — cell-wise sum), which is
    what makes it the 100-TB running-frequency artifact: per-day sketches
    union into a month without rescanning, the way `bloom_bits` merges
    membership.  Estimates (`cms_estimate`) never undercount; they
    overcount by ~N*e/width with probability 1 - exp(-depth).
    """
    if width < 2 or depth < 1:
        raise ValueError("cms_build: need width >= 2 and depth >= 1")
    wcol = F.col(weight_col).cast("long") if weight_col else F.lit(1)
    positions = F.array(*[_cms_col(F.col(key_col), j, width)
                          for j in range(depth)])
    return (df.select(F.posexplode(positions).alias("row", "col"),
                      wcol.alias("_w"))
            .groupBy("row", "col")
            .agg(F.sum("_w").alias("cnt")))


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum of two same-shape sketches — the mergeability that
    lets sketches roll up across batches/partitions/days."""
    return (a.unionByName(b)
            .groupBy("row", "col")
            .agg(F.sum("cnt").alias("cnt")))


def cms_estimate(sketch: DataFrame, keys: DataFrame,
                 key_col: str = "token",
                 width: int = 1024, depth: int = 4) -> DataFrame:
    """Point estimates for a key relation against a built sketch:
    (key_col, est) with est = min over the key's depth cells — the classic
    count-min upper bound (missing cells read as 0).

    The sketch is depth*width rows, so the join broadcasts; the probe
    relation explodes to depth rows per key and re-groups on the key —
    query-sized work, corpus-free.

    (width, depth) MUST match the build: a mismatch silently probes
    absent cells, which coalesce to 0 and break the never-undercount
    contract.  Depth is validated against the sketch itself (a nonempty
    build populates exactly the row ids 0..depth-1 — one aggregate over
    the sketch-bounded relation, cheap by contract); width cannot be
    recovered from a sparse sketch relationally, so it stays a
    documented caller obligation.
    """
    if width < 2 or depth < 1:
        raise ValueError("cms_estimate: need width >= 2 and depth >= 1")
    # localCheckpoint BEFORE the validation action: the shape aggregate
    # materializes the (bounded) sketch once and the probe join below
    # reuses it — otherwise a lazily-derived sketch would re-run its
    # corpus-sized build inside this plan (the multiply-consumed-
    # bounded-relation rule, curation.py:502)
    sketch = sketch.localCheckpoint(eager=False)
    shape = sketch.agg(F.count_distinct("row").alias("nrows"),
                       F.max("row").alias("maxrow"),
                       F.max("col").alias("maxcol")).first()
    if shape.nrows and (shape.nrows != depth or shape.maxrow != depth - 1):
        raise ValueError(
            f"cms_estimate: sketch has row ids 0..{shape.maxrow} "
            f"({shape.nrows} distinct) but depth={depth} was given — "
            "build and probe parameters must match")
    if shape.maxcol is not None and shape.maxcol >= width:
        raise ValueError(
            f"cms_estimate: sketch has col {shape.maxcol} >= width={width}"
            " — build and probe parameters must match")
    positions = F.array(*[_cms_col(F.col(key_col), j, width)
                          for j in range(depth)])
    probe = keys.select(F.col(key_col),
                        F.posexplode(positions).alias("row", "col"))
    return (probe.join(F.broadcast(sketch), ["row", "col"], "left")
            .groupBy(key_col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est")))


def corpus_report(df: DataFrame, text_col: str = "text",
                  lang_col: str = "lang",
                  source_col: str = "source") -> DataFrame:
    """Long-format corpus summary: (metric, value) rows from ONE scan —
    the ops artifact a curation run logs next to its output.  All metrics
    are conditional aggregates of a single groupBy-less agg (one partial-
    agg pass, one single-row merge), unpivoted JVM-side with `stack`."""
    t = F.trim(F.col(text_col))
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length(text_col)).alias("total_chars"),
        F.round(F.avg(F.length(text_col)), 6).alias("avg_chars"),
        F.sum((t == "").cast("long")).alias("n_blank"),
    ]
    # lang/source are conventions, not requirements — report what exists
    if source_col in df.columns:
        aggs.append(F.countDistinct(source_col).alias("n_sources"))
    if lang_col in df.columns:
        aggs.append(F.countDistinct(lang_col).alias("n_langs"))
    agg = df.agg(*aggs)
    n = len(agg.columns)
    pairs = ", ".join(f"'{c}', cast({c} as double)" for c in agg.columns)
    return agg.select(F.expr(f"stack({n}, {pairs}) as (metric, value)"))


_KMV_SPACE = float(2 ** 52)


def _kmv_hash(key_col, salt: str = "") -> Column:
    """52-bit uniform hash of a key: md5 truncated to 13 hex digits (the
    `_cms_col`/bloom trick — exactly representable in a BIGINT and
    replicable in ANSI SQL, so sketches are engine-portable artifacts)."""
    h = F.md5(F.concat(F.lit(f"kmv{salt}:"), key_col.cast("string")))
    return F.conv(F.substring(h, 1, 13), 16, 10).cast("bigint")


def kmv_sketch(df: DataFrame, key_col: str, k: int = 256,
               salt: str = "") -> DataFrame:
    """K-minimum-values sketch of a key column: the k SMALLEST distinct
    52-bit hashes, as a ≤k-row relation of BIGINTs (column `h`).

    Why KMV next to HLL (`corpus_distinct_stats`): HLL registers merge
    only by max — union cardinality works, INTERSECTIONS don't.  KMV
    sketches support set algebra (Beyer et al. 2007): the union of two
    sketches' bottom-k is the bottom-k of the union, and membership of a
    hash in both sketches estimates the Jaccard directly
    (`kmv_jaccard`).  That is the "how much do these two corpora / days /
    sources overlap" primitive a dedup planner reads BEFORE paying for a
    full cross-corpus join.

    Plan: one scan → distinct hash (key-bounded shuffle) → TakeOrdered
    k (Spark's orderBy+limit physical plan — a per-partition heap + a
    k-row driver merge, never a global sort).  Mergeable: union sketches
    and re-take bottom-k, no rescan.  Deterministic (md5): the sketch —
    and every estimate from it — is a pure function of the key SET.
    """
    if k < 2:
        raise ValueError(f"kmv_sketch: k must be >= 2, got {k}")
    # NULL keys carry no identity AND sort first in Spark but last in
    # ANSI engines — drop them before they poison the bottom-k
    return (df.filter(F.col(key_col).isNotNull())
            .select(_kmv_hash(F.col(key_col), salt).alias("h"))
            .distinct().orderBy(F.asc("h")).limit(k))


def kmv_distinct_estimate(sketch: DataFrame, k: int) -> DataFrame:
    """1-row (n_kept, est_distinct): when the sketch saturated (n == k),
    D̂ = (k-1) · 2^52 / h_(k) — the classic bottom-k estimator; when it
    didn't, every key was seen and the count IS the answer."""
    agg = sketch.agg(F.count(F.lit(1)).alias("n_kept"),
                     F.max("h").alias("_hk"))
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise((F.lit(float(k - 1)) * F.lit(_KMV_SPACE))
                / F.col("_hk").cast("double"))
    return agg.select("n_kept", F.round(est, 6).alias("est_distinct"))


def kmv_jaccard(sketch_a: DataFrame, sketch_b: DataFrame,
                k: int) -> DataFrame:
    """1-row (n_union_kept, n_both, jaccard): bottom-k of the union as
    the sample X, Ĵ = |X ∩ A ∩ B| / |X| (Beyer et al. 2007).  All
    relations are ≤k rows — the estimate costs nothing at any corpus
    size once the sketches exist."""
    x = (sketch_a.unionByName(sketch_b).distinct()
         .orderBy(F.asc("h")).limit(k))
    both = (x.join(sketch_a, on="h", how="left_semi")
            .join(sketch_b, on="h", how="left_semi"))
    nx = x.agg(F.count(F.lit(1)).alias("n_union_kept"))
    nb = both.agg(F.count(F.lit(1)).alias("n_both"))
    return (nx.crossJoin(nb)
            .select("n_union_kept", "n_both",
                    F.round(F.col("n_both").cast("double")
                            / F.col("n_union_kept"), 6).alias("jaccard")))
