"""Pairwise-preference strength fitting — the Bradley-Terry model that
turns RLHF/eval preference pairs (A beat B) into per-item strength
scores.  The immediate uses in a training-data pipeline: ranking
candidate responses / models / prompt sources from noisy pairwise
judgments, downweighting annotators, and building preference-curriculum
mixtures.

Model: P(i beats j) = w_i / (w_i + w_j).  The classic MM (minorize-
maximize) update (Hunter 2004, public) iterates

    w_i  <-  W_i / sum_j n_ij / (w_i + w_j)

where W_i = total wins of i and n_ij = games between i and j, then
rescales so the weights average 1.  Each iteration is ONE join of the
pair-bounded comparison relation against the k-item weight relation +
one item-keyed aggregate — the PageRank shape: the corpus of raw pair
rows collapses ONCE into (i, j, n, wins) cells, and every subsequent
pass touches only distinct-pair-bounded relations.  k items stay a
DataFrame throughout; nothing corpus-sized is collected.

Regularization: a virtual win and a virtual loss against a dummy
opponent of fixed weight 1 per item (the standard conjugate prior
trick: W_i + 1 wins, denominator + 2/(w_i + 1)) — without it, an item
with zero wins drives its weight to 0 and an undefeated item diverges;
with it the MLE is always finite and the update well-defined.

Determinism discipline (datapipe/linalg.py): weights live as exact
integer micro-units end to end.  Every per-term quotient
n_ij/(w_i + w_j) quantizes to micro via `_idiv_half_up` on the exact
integer ratio n_ij*1e12 / (wq_i + wq_j), the per-item denominator is an
order-free integer sum, the update W_i*1e12/denom and the mean-1
rescale k*wq*1e6/S are again exact integer divisions — no double
arithmetic anywhere until the final display division, so the oracle
unrolls the full iteration in HUGEINT SQL and hash-matches.

No reference analog; beyond-reference inventory (SURVEY.md §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flood_data_spark.datapipe.linalg import _idiv_half_up

_DEC = "decimal(38,0)"
_MICRO = 1_000_000


def pairwise_counts(df: DataFrame, winner_col: str,
                    loser_col: str) -> DataFrame:
    """Collapse raw preference rows into the canonical comparison
    relation: (item_a, item_b, n_games, wins_a) with item_a < item_b —
    the ONE corpus-sized pass; everything downstream is bounded by the
    number of distinct pairs.  Self-preferences and NULLs drop."""
    w, l_ = F.col(winner_col), F.col(loser_col)
    base = (df.filter(w.isNotNull() & l_.isNotNull() & (w != l_))
            .select(F.least(w, l_).alias("item_a"),
                    F.greatest(w, l_).alias("item_b"),
                    F.when(w < l_, 1).otherwise(0).alias("_wa")))
    return (base.groupBy("item_a", "item_b")
            .agg(F.count(F.lit(1)).alias("n_games"),
                 F.sum("_wa").alias("wins_a")))


def bradley_terry(df: DataFrame, winner_col: str, loser_col: str,
                  iterations: int = 2) -> DataFrame:
    """Fit Bradley-Terry strengths from (winner, loser) rows; returns
    (item, n_wins, n_games, strength) with strength = the mean-1
    rescaled weight after `iterations` MM rounds, rounded to 6 decimals
    (micro-exact by construction — module docstring).

    Each iteration costs one broadcast join over the distinct-pair
    relation + one item-keyed exchange; the raw rows are touched once.
    """
    if iterations < 1:
        raise ValueError("bradley_terry: iterations must be >= 1")
    comp = pairwise_counts(df, winner_col, loser_col).localCheckpoint()
    # directed view: (i, j, n_ij) both ways + per-item win/game totals
    e = (comp.select(F.col("item_a").alias("i"), F.col("item_b").alias("j"),
                     F.col("n_games").alias("n"))
         .unionByName(
             comp.select(F.col("item_b").alias("i"),
                         F.col("item_a").alias("j"),
                         F.col("n_games").alias("n"))))
    totals = (comp.select(F.col("item_a").alias("i"),
                          F.col("wins_a").alias("w"),
                          F.col("n_games").alias("g"))
              .unionByName(
                  comp.select(F.col("item_b").alias("i"),
                              (F.col("n_games") - F.col("wins_a")).alias("w"),
                              F.col("n_games").alias("g")))
              .groupBy("i")
              .agg(F.sum("w").alias("n_wins"), F.sum("g").alias("n_games"))
              .localCheckpoint())
    k_row = totals.agg(F.count(F.lit(1)).alias("_k"))
    tera = F.lit(10 ** 12).cast(_DEC)
    mega = F.lit(_MICRO).cast(_DEC)
    weights = totals.select("i", F.lit(_MICRO).cast(_DEC).alias("wq"))
    for _ in range(iterations):
        wi = weights.select(F.col("i"), F.col("wq").alias("_wi"))
        wj = weights.select(F.col("i").alias("j"), F.col("wq").alias("_wj"))
        term = _idiv_half_up(F.col("n").cast(_DEC) * tera,
                             F.col("_wi") + F.col("_wj")).cast(_DEC)
        denom = (e.join(F.broadcast(wi), "i")
                 .join(F.broadcast(wj), "j")
                 .select("i", term.alias("_t"))
                 .groupBy("i")
                 .agg(F.sum("_t").alias("_d")))
        # + the virtual game vs the weight-1 dummy (prior), + its win
        upd = (totals.join(denom, "i")
               .join(F.broadcast(wi), "i")
               .select(
                   "i",
                   _idiv_half_up(
                       (F.col("n_wins").cast(_DEC) + F.lit(1).cast(_DEC))
                       * tera,
                       F.col("_d")
                       + _idiv_half_up(F.lit(2).cast(_DEC) * tera,
                                       F.col("_wi") + mega).cast(_DEC))
                   .cast(_DEC).alias("wq")))
        s_row = upd.agg(F.sum("wq").alias("_s"))
        # floor at 1 micro: an item crushed badly enough can round to 0
        # micro-units, and a comparison between TWO zero-weight items
        # would divide by zero next round (r11 self-review finding) —
        # the dummy-opponent prior bounds weights away from zero in the
        # real-number recurrence, so the floor only repairs the
        # quantization, never masks the model
        weights = (upd.crossJoin(F.broadcast(s_row))
                   .crossJoin(F.broadcast(k_row))
                   .select("i",
                           F.greatest(
                               _idiv_half_up(
                                   F.col("wq")
                                   * F.col("_k").cast(_DEC) * mega,
                                   F.col("_s")).cast(_DEC),
                               F.lit(1).cast(_DEC)).alias("wq"))
                   .localCheckpoint(eager=False))
    return (totals.join(weights, "i")
            .select(F.col("i").alias("item"), "n_wins", "n_games",
                    (F.col("wq").cast("double")
                     / F.lit(float(_MICRO))).alias("strength")))
