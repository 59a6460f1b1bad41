"""Market-basket analysis — frequent item pairs and association rules,
as pure Spark aggregates (the Apriori order-2 core).

Where this sits: `text.py`'s PMI co-occurrence ranks TOKEN pairs inside a
sliding window; this module ranks ITEM pairs inside transactional baskets
and derives directional rules (antecedent → consequent with support /
confidence / lift) — the retail / recommendation classic, and at corpus
scale the "documents that share entity X also share entity Y" miner.

Scale posture:
- Item supports are one (item)-keyed aggregate; the Apriori property
  prunes BEFORE the quadratic step: only items that are frequent alone
  can appear in a frequent pair, so infrequent items never enter the
  per-basket self-join.
- The per-basket self-join is the quadratic hazard (a basket with k
  surviving items mints k(k−1)/2 pair rows).  `max_basket_size` drops
  oversized baskets up front (the dedup doc-freq-cap / adamic_adar
  max_degree analog): fan-out is bounded by Σ min(k, cap)², and the
  docstring-visible bias is "giant baskets don't vote", which is the
  standard trade.
- Pair counts shuffle on the (item_a, item_b) key with map-side partial
  aggregation; baskets themselves never shuffle twice.

Engine-portable determinism: supports and counts are exact integers;
support/confidence/lift are fixed-operand-order double divisions rounded
to 6 decimals once — full value oracles (q_assoc_rules).

No reference analog; part of the beyond-reference inventory
(SURVEY.md §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _baskets(df: DataFrame, id_col: str, item_col: str,
             max_basket_size: int | None) -> DataFrame:
    """Distinct (basket, item) pairs, oversized baskets dropped whole."""
    b = df.select(F.col(id_col).alias("bid"),
                  F.col(item_col).alias("item")).distinct()
    if max_basket_size is not None:
        if max_basket_size < 2:
            raise ValueError(
                f"max_basket_size must be >= 2, got {max_basket_size}")
        sizes = (b.groupBy("bid")
                 .agg(F.count(F.lit(1)).alias("_sz"))
                 .filter(F.col("_sz") <= max_basket_size)
                 .select("bid"))
        b = b.join(sizes, "bid")
    return b


def frequent_pairs(df: DataFrame, id_col: str = "basket_id",
                   item_col: str = "item", min_support: float = 0.01,
                   max_basket_size: int | None = None) -> DataFrame:
    """Frequent item pairs: (item_a, item_b, pair_count, n_a, n_b,
    n_baskets) for every unordered pair co-occurring in at least
    ceil(min_support · n_baskets) baskets, with item_a < item_b.  Item
    supports n_a/n_b ride along for rule derivation.  Apriori pruning:
    items below the support threshold never enter the pair join."""
    if not 0.0 < min_support <= 1.0:
        raise ValueError(
            f"min_support must be in (0, 1], got {min_support}")
    b = _baskets(df, id_col, item_col, max_basket_size)
    b = b.localCheckpoint(eager=False)  # consumed 3x below
    n_baskets = b.select("bid").distinct().count()
    # the oracle mirrors this as CEIL(min_support * n) — same IEEE product
    import math
    thresh = math.ceil(min_support * n_baskets)
    item_n = (b.groupBy("item")
              .agg(F.count(F.lit(1)).alias("n_item"))
              .filter(F.col("n_item") >= thresh))
    fb = b.join(F.broadcast(item_n), "item")
    lhs = fb.select("bid", F.col("item").alias("item_a"),
                    F.col("n_item").alias("n_a"))
    rhs = fb.select(F.col("bid").alias("bid2"),
                    F.col("item").alias("item_b"),
                    F.col("n_item").alias("n_b"))
    return (lhs.join(rhs, lhs["bid"] == rhs["bid2"])
            .filter(F.col("item_a") < F.col("item_b"))
            .groupBy("item_a", "item_b", "n_a", "n_b")
            .agg(F.count(F.lit(1)).alias("pair_count"))
            .filter(F.col("pair_count") >= thresh)
            .select("item_a", "item_b", "pair_count", "n_a", "n_b",
                    F.lit(n_baskets).alias("n_baskets")))


def association_rules(df: DataFrame, id_col: str = "basket_id",
                      item_col: str = "item", min_support: float = 0.01,
                      min_confidence: float = 0.0,
                      max_basket_size: int | None = None) -> DataFrame:
    """Directional rules from the frequent pairs: (antecedent,
    consequent, pair_count, support, confidence, lift) — each unordered
    frequent pair yields the two rules a→b and b→a, filtered by
    min_confidence.

    support    = pair_count / n_baskets
    confidence = pair_count / n_antecedent
    lift       = (pair_count · n_baskets) / (n_antecedent · n_consequent)

    All three are single fixed-operand-order double expressions rounded
    to 6 decimals; the min_confidence filter runs on the UNROUNDED value
    (mirrored verbatim in the oracle)."""
    pairs = frequent_pairs(df, id_col, item_col, min_support,
                           max_basket_size)
    # both directions through ONE explode, not a fwd ∪ rev union that
    # would instantiate the frequent-pairs plan (basket self-join +
    # pair groupBy) twice (r16, guide §2.4; the item_topk fix)
    both = (pairs.select(F.explode(F.array(
        F.struct(F.col("item_a").alias("antecedent"),
                 F.col("item_b").alias("consequent"),
                 F.col("pair_count"),
                 F.col("n_a").alias("n_ante"),
                 F.col("n_b").alias("n_cons"),
                 F.col("n_baskets")),
        F.struct(F.col("item_b").alias("antecedent"),
                 F.col("item_a").alias("consequent"),
                 F.col("pair_count"),
                 F.col("n_b").alias("n_ante"),
                 F.col("n_a").alias("n_cons"),
                 F.col("n_baskets")))).alias("_e"))
        .select("_e.antecedent", "_e.consequent", "_e.pair_count",
                "_e.n_ante", "_e.n_cons", "_e.n_baskets"))
    conf_raw = F.col("pair_count") / F.col("n_ante").cast("double")
    return (both.filter(conf_raw >= min_confidence)
            .select(
                "antecedent", "consequent", "pair_count",
                F.round(F.col("pair_count")
                        / F.col("n_baskets").cast("double"), 6)
                .alias("support"),
                F.round(conf_raw, 6).alias("confidence"),
                F.round((F.col("pair_count")
                         * F.col("n_baskets").cast("double"))
                        / (F.col("n_ante").cast("double")
                           * F.col("n_cons").cast("double")), 6)
                .alias("lift")))
