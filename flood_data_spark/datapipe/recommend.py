"""Item-item collaborative filtering over implicit feedback — the
"customers who bought X also bought Y" co-occurrence recommender
(Sarwar et al. 2001 / the Amazon item-to-item paper), expressed as pure
Spark aggregates.

Where this sits: the same one-mode-projection shape as the co-purchase
graph feeding `graph.triangle_counts`, but weighted — cosine similarity
over binary user-item vectors reduces to pair counts over shared users,
so the whole model is counting.

Scale posture (the all-pairs trap and its cure):
- The self-join on the user key fans out quadratically in BASKET SIZE,
  not corpus size.  `max_basket` caps it: each user contributes at most
  cap·(cap-1)/2 pairs (deterministic lowest-item-id truncation — the
  doc-freq-cap precedent from `dedup.ngram_jaccard_pairs`; power users
  are boilerplate, their marginal signal per pair is lowest).  With the
  cap, total pair volume is Σ min(|basket|, cap)² — linear in users.
- Pair counts groupBy (item_a, item_b) with map-side combine; item
  degree counts are an item-cardinality relation joined twice —
  broadcast when small, and "small" is decided by AQE from the measured
  post-aggregation size (an unconditional hint would OOM on huge
  catalogs; `broadcast_degrees` lets a caller force either way).
- `min_count` prunes the pair tail BEFORE the degree joins.

Determinism: counts are exact integers; cosine = c_ab / sqrt(c_a·c_b) is
one fixed double expression over them, round(…, 6); top-k carries the
(score DESC, neighbor ASC) tiebreak.

No reference analog; beyond-reference datapipe inventory (SURVEY.md
§2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _baskets(df: DataFrame, user_col: str, item_col: str,
             max_basket: int | None) -> DataFrame:
    """Distinct (user, item) with the deterministic per-user cap."""
    b = df.select(F.col(user_col).alias("user"),
                  F.col(item_col).alias("item")).distinct()
    if max_basket is not None:
        if max_basket < 2:
            raise ValueError(f"max_basket must be >= 2, got {max_basket}")
        w = Window.partitionBy("user").orderBy(F.col("item").asc())
        b = (b.withColumn("_rk", F.row_number().over(w))
             .filter(F.col("_rk") <= max_basket).drop("_rk"))
    return b


def item_cooccurrence(df: DataFrame, user_col: str, item_col: str,
                      max_basket: int | None = 64,
                      min_count: int = 1,
                      _baskets_df: DataFrame | None = None) -> DataFrame:
    """Canonical co-occurrence pairs (item_a < item_b, n_common BIGINT):
    one distinct, one capped self-join on the user key, one pair-keyed
    groupBy.  `_baskets_df` lets `item_similarity` share ONE basket
    relation across the pair and degree computations (r16 — guide §2.4:
    the capped window otherwise runs three times)."""
    b = (_baskets_df if _baskets_df is not None
         else _baskets(df, user_col, item_col, max_basket))
    a = b.select("user", F.col("item").alias("item_a"))
    c = b.select(F.col("user").alias("user2"),
                 F.col("item").alias("item_b"))
    pairs = (a.join(c, (a["user"] == c["user2"])
                    & (F.col("item_a") < F.col("item_b")))
             .groupBy("item_a", "item_b")
             .agg(F.count(F.lit(1)).alias("n_common")))
    if min_count > 1:
        pairs = pairs.filter(F.col("n_common") >= min_count)
    return pairs


def item_similarity(df: DataFrame, user_col: str, item_col: str,
                    max_basket: int | None = 64,
                    min_count: int = 1,
                    broadcast_degrees: bool | None = None) -> DataFrame:
    """Cosine similarity over binary user-item vectors:
    cos(a, b) = n_common / sqrt(n_a · n_b).  Degree counts use the SAME
    capped basket relation as the pairs (so the estimator is consistent
    under the cap).  Returns (item_a, item_b, n_common, n_a, n_b,
    cosine round-6).

    `broadcast_degrees` honors the module's broadcast-when-small
    contract: the degree relation is ITEM-cardinality, which is small
    for retail catalogs but can be huge (every n-gram, every URL) —
    an unconditional broadcast hint there is a driver/executor OOM.
    None (default) leaves the choice to Catalyst/AQE, which sees the
    post-aggregation size at runtime and broadcasts only under the
    autoBroadcastJoinThreshold — the shuffle-join fallback is automatic.
    True forces the hint (a caller contract that the catalog is small);
    False forbids it."""
    # ONE basket relation, cached: it feeds the self-join twice and the
    # degree count once (three corpus-distinct passes before r16), and
    # the cache preserves the cap window's user-hash partitioning so the
    # self-join consumes both sides exchange-free (guide §2.4, §5).
    b = _baskets(df, user_col, item_col, max_basket).cache()
    pairs = item_cooccurrence(df, user_col, item_col, max_basket,
                              min_count, _baskets_df=b)
    deg = b.groupBy("item").agg(F.count(F.lit(1)).alias("n"))

    def _side(alias_item, alias_n):
        s = deg.select(F.col("item").alias(alias_item),
                       F.col("n").alias(alias_n))
        if broadcast_degrees:
            return F.broadcast(s)
        if broadcast_degrees is False:
            return s.hint("shuffle_hash")
        return s

    out = (pairs
           .join(_side("item_a", "n_a"), on="item_a")
           .join(_side("item_b", "n_b"), on="item_b"))
    cos = (F.col("n_common").cast("double")
           / F.sqrt(F.col("n_a").cast("double")
                    * F.col("n_b").cast("double")))
    return (out.withColumn("cosine", F.round(cos, 6))
            .select("item_a", "item_b", "n_common", "n_a", "n_b",
                    "cosine"))


def item_topk(sim: DataFrame, k: int = 5) -> DataFrame:
    """Top-k neighbors per item from the canonical pair relation:
    symmetric expansion (each pair serves both directions — the pair
    table is stored once, halved), then a per-item rank window with the
    (cosine DESC, neighbor ASC) deterministic tiebreak.  The window runs
    over the SIMILARITY relation (already min_count-pruned), never the
    interaction corpus."""
    if k < 1:
        raise ValueError(f"item_topk: k must be >= 1, got {k}")
    # symmetric expansion through ONE explode, not a fwd ∪ rev union:
    # a union instantiates the entire upstream similarity plan (pair
    # self-join + degree joins) twice — "stored once" only holds when
    # the plan references sim once (r16, guide §2.4; measured two full
    # SortMergeJoin branches in the q_item_cf plan before)
    both = (sim.select(F.explode(F.array(
        F.struct(F.col("item_a").alias("item"),
                 F.col("item_b").alias("neighbor"), F.col("cosine")),
        F.struct(F.col("item_b").alias("item"),
                 F.col("item_a").alias("neighbor"), F.col("cosine"))))
        .alias("_e"))
        .select("_e.item", "_e.neighbor", "_e.cosine"))
    w = (Window.partitionBy("item")
         .orderBy(F.col("cosine").desc(), F.col("neighbor").asc()))
    return (both.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("item", "neighbor", "cosine",
                    F.col("rank").cast("int").alias("rank")))
