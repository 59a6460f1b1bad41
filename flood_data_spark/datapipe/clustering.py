"""Distributed Lloyd's k-means over an embedding column (array<float/double>).

100 TB rationale: the sample-fit quantizer in `similarity._kmeans_driver`
is the right tool for TRAINING an index (the FAISS train() contract — a
bounded sample sees the driver, iterations are in-memory matmuls), but a
corpus-wide CLUSTERING — topic bucketing for curriculum mixing, SemDeDup's
cluster stage at full fidelity, per-cluster sampling quotas — must assign
and re-estimate over ALL rows.  This module runs Lloyd's iterations as
Spark jobs: the assignment step is a broadcast-literal argmin (centroids
ride into the executors as one array literal, k*d doubles — no join, no
shuffle), and the update step is one partial-aggregated groupBy whose
result is k*d cells, collected to the driver to build the next round's
literal.  Per iteration: one scan + one k*d-sized shuffle.  The corpus
never comes to the driver; only k*d centroid cells per round do.

Determinism: init picks the k ids with the smallest xxhash64(id) — a
data-order-independent, partitioning-independent choice — and every
subsequent step is an exact aggregate, so (data, seed-free) runs converge
identically whatever the cluster layout.  Ties in the argmin break on the
lower cluster id.

No reference analog (the reference has no embedding operators); part of
the beyond-reference datapipe inventory (SURVEY.md §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flood_data_spark.datapipe.similarity import (
    _as_double, _matrix_lit)


def _normalized(vec_col) -> "F.Column":
    """L2-normalize an array<double> column (epsilon-guarded), so Euclidean
    argmin == cosine argmax (spherical k-means) — consistent with every
    other operator in the similarity family."""
    v = _as_double(vec_col)
    n = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    n = F.greatest(n, F.lit(1e-12))
    return F.transform(v, lambda x: x / n)


def _assign_expr(norm_col, centroids: list) -> "F.Column":
    """argmax_j <v, C_j> over the broadcast centroid literal; ties break on
    the lower cluster id (max_by on struct(dot, -j)).  Centroids are unit
    vectors, so dot-argmax == Euclidean-argmin on the normalized corpus."""
    C = _matrix_lit(centroids)
    k = len(centroids)
    scores = F.transform(
        C, lambda c: F.aggregate(
            F.zip_with(norm_col, c, lambda a, b: a * b),
            F.lit(0.0), lambda acc, x: acc + x))
    best = F.aggregate(
        F.zip_with(scores,
                   F.sequence(F.lit(0), F.lit(k - 1)),
                   lambda s, j: F.struct(s.alias("s"), j.alias("j"))),
        F.struct(F.lit(-1e18).alias("s"), F.lit(-1).alias("j")),
        lambda acc, e: F.when(
            (e["s"] > acc["s"])
            | ((e["s"] == acc["s"]) & (e["j"] < acc["j"])), e
        ).otherwise(acc))
    return best["j"]


def kmeans_fit(df: DataFrame, k: int,
               id_col: str = "vec_id", vec_col: str = "embedding",
               max_iter: int = 10, tol: float = 1e-6) -> tuple:
    """Distributed spherical k-means; returns (centroids, history) where
    centroids is a plain k x d nested list (unit rows) and history is the
    per-iteration inertia list (mean 1 - cosine to the assigned centroid —
    non-increasing up to the empty-cluster reseed).

    Each iteration is ONE distributed job: the per-row assignment (pure
    Column expressions against the centroid literal) feeds posexplode →
    groupBy(cluster, component) — partial aggregation combines map-side,
    the shuffle carries k*d keys, and the driver collects exactly k*d
    cells to build the next literal.  NEVER collect_list-of-vectors: a
    hot cluster's members must not materialize in one row.  The per-row
    inertia term rides the exploded rows as err/d so one aggregate serves
    both the update and the convergence history.  Empty clusters keep
    their previous centroid (they can re-acquire points later).  Early
    exit when the max component shift drops below `tol`.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    norm = df.select(F.col(id_col).alias("_id"),
                     _normalized(F.col(vec_col)).alias("_v"))
    # deterministic, order-independent init: k smallest xxhash64(id)
    seed_rows = (norm
                 .withColumn("_h", F.xxhash64(F.col("_id")))
                 .orderBy("_h", "_id")
                 .limit(k)
                 .select("_v")
                 .collect())
    if not seed_rows:
        raise ValueError("kmeans_fit: empty input")
    centroids = [list(r._v) for r in seed_rows]
    d = len(centroids[0])
    history = []
    for _ in range(max_iter):
        C = _matrix_lit(centroids)
        assigned = norm.withColumn("_c", _assign_expr(F.col("_v"), centroids))
        # C[_c]: getItem on an array Column is 0-based, matching
        # _assign_expr's 0-based cluster ids
        err_row = (F.lit(1.0) - F.aggregate(
            F.zip_with(F.col("_v"), C[F.col("_c")], lambda a, b: a * b),
            F.lit(0.0), lambda acc, x: acc + x))
        cells = (assigned
                 .withColumn("_e", err_row / F.lit(float(d)))
                 .select("_c", "_e", F.posexplode("_v").alias("pos", "x"))
                 .groupBy("_c", "pos")
                 .agg(F.sum("x").alias("s"),
                      F.count("*").alias("n"),
                      F.sum("_e").alias("e"))
                 .collect())
        by_cluster: dict = {}
        for r in cells:
            slot = by_cluster.setdefault(r._c, {"n": r.n, "e": 0.0,
                                                "s": [0.0] * d})
            slot["s"][r.pos] = r.s
            slot["e"] += r.e
        total_n = sum(v["n"] for v in by_cluster.values()) or 1
        history.append(sum(v["e"] for v in by_cluster.values()) / total_n)
        new_c = [list(c) for c in centroids]  # empty clusters keep position
        for cid, v in by_cluster.items():
            s = [x / v["n"] for x in v["s"]]
            nn = sum(x * x for x in s) ** 0.5 or 1e-12
            new_c[cid] = [x / nn for x in s]
        shift = max(abs(a - b)
                    for row_a, row_b in zip(new_c, centroids)
                    for a, b in zip(row_a, row_b))
        centroids = new_c
        if shift < tol:
            break
    return centroids, history


def kmeans_assign(df: DataFrame, centroids: list,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  cluster_col: str = "cluster") -> DataFrame:
    """Final assignment pass: the input plus a `cluster` int column.  Pure
    Column expressions against the centroid literal — no join, no shuffle;
    composes with partitioned writes (`partitionBy(cluster)`) so per-topic
    reads prune at the directory level."""
    return df.withColumn(
        cluster_col,
        _assign_expr(_normalized(F.col(vec_col)), centroids))


def cluster_balanced_sample(df: DataFrame, centroids: list,
                            per_cluster: int,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            cluster_col: str = "cluster") -> DataFrame:
    """Diversity sampling: keep at most `per_cluster` rows from each
    k-means cluster — the quota step of SemDeDup/DC-style pipelines, where
    pruning happens PER semantic cluster so no topic is wiped out by a
    global cut.

    Row selection within a cluster is deterministic and engine-portable:
    rows rank by md5(id) (a pseudo-random but reproducible order — the
    same trick as curation.hash_sample), tie-broken by id, so the chosen
    subset is independent of partitioning, run, and engine.

    Plan: the assignment is `kmeans_assign`'s expression-only argmin (no
    join, no shuffle) and the quota is ONE window partitioned by cluster —
    a single k-keyed exchange whose partitions are cluster-sized.  With a
    skewed cluster distribution the hot cluster's partition carries its
    full membership; at 100 TB cap the skew the same way `cap_per_key`
    documents (salt the window key, take per-salt quotas, re-cap) or
    pre-filter with a sampled quantile of the md5 rank.
    """
    if per_cluster < 1:
        raise ValueError("cluster_balanced_sample: per_cluster must be >= 1")
    from pyspark.sql import Window

    assigned = kmeans_assign(df, centroids, id_col, vec_col, cluster_col)
    w = (Window.partitionBy(cluster_col)
         .orderBy(F.md5(F.col(id_col).cast("string")).asc(),
                  F.col(id_col).asc()))
    return (assigned
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= per_cluster)
            .drop("_rn"))
