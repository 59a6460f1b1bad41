"""Preference-data curation for RLHF-style training — the relational
ops a post-training pipeline runs over (prompt, response, reward)
triples: group-relative advantage normalization (the GRPO estimator),
best-of-n selection, and DPO chosen/rejected pair construction.

Every shape here is the engine's bread and butter: one group-keyed
exchange of exact integer partials per operator, no windows over more
than a group, no driver-side loops.  Rewards quantize ONCE to integer
micro-units; means/variances assemble as exact integer ratios (the
datapipe/linalg dim_stats discipline) with the single float seam being
the IEEE sqrt of an exact integer (both engines round it identically),
so every output is bit-stable under partitioning and engine swap.

Scale posture: groups are prompt-sized (n ~ 4..64 sampled responses),
cells are many — identical to the verification family's per-cell
argument.  The group aggregate relation is prompt-bounded; the
advantage/pair projections join it back by group key (broadcast when
the prompt set is small, shuffled hash otherwise — Catalyst's call).

No reference analog; beyond-reference inventory (SURVEY.md §2.11).
Companion to `datapipe/preference.py` (Bradley-Terry fitting): BT
consumes the PAIRS this module's `dpo_pairs` emits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flood_data_spark.datapipe.linalg import _idiv_half_up

MICRO = 1_000_000
_DEC = "decimal(38,0)"


def _q(col) -> "F.Column":
    """Quantize once to integer micro-units (sign-aware half-up floor —
    the verification._micro formulation)."""
    c = col.cast("double")
    return (F.signum(c) * F.floor(F.abs(c) * MICRO + F.lit(0.5))) \
        .cast("long")


def group_advantages(df: DataFrame, group_col: str, id_col: str,
                     reward_col: str) -> DataFrame:
    """Group-relative advantage normalization (the GRPO estimator):
    per prompt group with rewards r_1..r_n,

        adv_i = (r_i − mean(r)) / std_pop(r)

    and adv_i = 0 when the group is degenerate (n = 1 or all rewards
    equal — no gradient signal, matching the GRPO convention of
    skipping zero-variance groups rather than dividing by eps).

    Exact-integer assembly: with qr in micro-units, S = Σqr and
    SS = Σqr², both r_i − mean = (qr_i·n − S)/n and std_pop·n =
    sqrt(SS·n − S²) are exact up to ONE float seam — the IEEE sqrt of
    the exact integer SS·n − S² (identically rounded in every engine),
    quantized back via floor(+0.5) to qstdn = std·n in micro.  The n's
    cancel, so

        adv · 1e6 = half_up( (qr_i·n − S) · 1e6 , qstdn )

    mirrored operand-for-operand in the oracle.  Returns
    (group, id, reward, advantage) with reward echoed at micro
    resolution."""
    g, i, r = group_col, id_col, reward_col
    qr = _q(F.col(r))
    stats = (df.select(F.col(g).alias("_g"), qr.alias("_qr"))
             .groupBy("_g")
             .agg(F.count(F.lit(1)).cast(_DEC).alias("_n"),
                  F.sum(F.col("_qr").cast(_DEC)).alias("_s"),
                  F.sum(F.col("_qr").cast(_DEC)
                        * F.col("_qr").cast(_DEC)).alias("_ss")))
    # var·n² in micro² is the exact integer SS·n − S²; its sqrt is
    # std·n in micro — ONE IEEE sqrt of an exact integer, floor+0.5
    # quantized, identical in every engine
    varn2 = F.col("_ss") * F.col("_n") - F.col("_s") * F.col("_s")
    qstdn = F.floor(F.sqrt(varn2.cast("double")) + F.lit(0.5)) \
        .cast(_DEC)
    stats = stats.withColumn("_qstdn", qstdn)
    base = df.select(F.col(g).alias("_g"), F.col(i).alias("_id"),
                     F.col(r).cast("double").alias("_r"),
                     qr.alias("_qr"))
    j = base.join(stats, "_g")
    num = (F.col("_qr").cast(_DEC) * F.col("_n") - F.col("_s"))
    mega = F.lit(MICRO).cast(_DEC)
    adv = F.when(
        F.col("_qstdn") > 0,
        _idiv_half_up(num * mega, F.col("_qstdn")).cast("double")
        / F.lit(float(MICRO))).otherwise(F.lit(0.0))
    reward6 = F.col("_qr").cast("double") / F.lit(float(MICRO))
    return j.select(F.col("_g").alias(g), F.col("_id").alias(i),
                    reward6.alias("reward"), adv.alias("advantage"))


def best_of_n(df: DataFrame, group_col: str, id_col: str,
              reward_col: str) -> DataFrame:
    """Best-of-n selection: per prompt group keep the highest-reward
    response (ties broken toward the SMALLEST id — deterministic, the
    W1 tiebreak discipline).  One group-keyed aggregate of a
    (reward, −id) struct max — no window, no second exchange.  Returns
    (group, best_id, best_reward, n_candidates)."""
    g, i, r = group_col, id_col, reward_col
    qr = _q(F.col(r))
    agg = (df.select(F.col(g).alias("_g"), F.col(i).alias("_id"), qr.alias("_qr"))
           .groupBy("_g")
           .agg(F.max(F.struct(F.col("_qr"),
                               (-F.col("_id")).alias("_ni"))).alias("_top"),
                F.count(F.lit(1)).alias("n_candidates")))
    best_r = (F.col("_top._qr").cast("double") / F.lit(float(MICRO)))
    return agg.select(F.col("_g").alias(g),
                      (-F.col("_top._ni")).alias("best_id"),
                      best_r.alias("best_reward"),
                      "n_candidates")


def dpo_pairs(df: DataFrame, group_col: str, id_col: str,
              reward_col: str, min_margin: float = 0.0) -> DataFrame:
    """DPO chosen/rejected pair construction: per prompt group, pair
    the best response (max reward, ties to smallest id) against the
    worst (min reward, ties to smallest id), keep groups with at least
    2 responses and a reward margin STRICTLY above `min_margin`
    (micro-quantized, so the cut is an integer comparison — no float
    boundary ambiguity).  One group-keyed struct-min/max aggregate.
    Returns (group, chosen_id, rejected_id, chosen_reward,
    rejected_reward, margin) sorted by group."""
    g, i, r = group_col, id_col, reward_col
    qr = _q(F.col(r))
    qm = int(round(float(min_margin) * MICRO))
    agg = (df.select(F.col(g).alias("_g"), F.col(i).alias("_id"),
                     qr.alias("_qr"))
           .groupBy("_g")
           .agg(F.max(F.struct(F.col("_qr"),
                               (-F.col("_id")).alias("_ni"))).alias("_hi"),
                F.min(F.struct(F.col("_qr"),
                               F.col("_id").alias("_i"))).alias("_lo"),
                F.count(F.lit(1)).alias("_n")))
    margin_q = F.col("_hi._qr") - F.col("_lo._qr")
    mega_f = F.lit(float(MICRO))
    out = (agg.filter((F.col("_n") >= 2) & (margin_q > F.lit(qm)))
           .select(F.col("_g").alias(g),
                   (-F.col("_hi._ni")).alias("chosen_id"),
                   F.col("_lo._i").alias("rejected_id"),
                   (F.col("_hi._qr").cast("double") / mega_f)
                   .alias("chosen_reward"),
                   (F.col("_lo._qr").cast("double") / mega_f)
                   .alias("rejected_reward"),
                   (margin_q.cast("double") / mega_f).alias("margin")))
    return out.orderBy(g)
