"""Forecast post-processing — empirical quantile-mapping bias
correction (Panofsky & Brier 1968; the CDF-matching method
operational hydrology applies between a model's climate and the
observed one before thresholds are compared — GloFAS-class discharge
reforecasts are corrected exactly this way before skill is scored).

For each simulated value x with within-group plotting position
p = i/(n+1) (Weibull), the corrected value is the OBSERVED empirical
quantile at p, linearly interpolated between observed order statistics
(the type-7/linear convention):

    h = 1 + p·(m−1),   f = ⌊h⌋,   corrected = o_(f) + (h−f)·(o_(f+1) − o_(f))

Determinism discipline (datapipe/linalg.py): ranks are integers off
one window per side; h splits into EXACT integer quotient/remainder
(num = i·(m−1), den = n+1 — f = 1 + num div den, rem = num mod den),
and the interpolation closes as ONE `_idiv_half_up` of
rem·(o_(f+1) − o_(f)) over den in quantized micro space.  ZERO double
seams — the whole operator is integer arithmetic, so the oracle
matches bit-for-bit by construction.  Because i ≤ n implies
num/den < m−1, f+1 ≤ m always exists; m = 1 degenerates to rem = 0
and maps everything to the single observed value.

Scale posture: one rank window per side on the SAME group-keyed
exchange, then ONE equi-join of the sim relation against the
m-bounded observed order statistics on (group, f) — co-partitioned,
no broadcast needed when obs is large, broadcastable when it is the
usual station climatology.  At 100 TB the sim corpus moves once.

Duplicate sim values: row_number assigns distinct ranks to equal
values, so tied rows receive adjacent plotting positions — the OUTPUT
MULTISET is permutation-invariant (tied input rows are
indistinguishable), which is the determinism contract the gates hash.

No reference analog; beyond-reference inventory (SURVEY.md §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flood_data_spark.datapipe.linalg import _idiv_half_up

MICRO = 1_000_000


def quantile_map(sim: DataFrame, obs: DataFrame, value_col: str,
                 group_keys) -> DataFrame:
    """Map each `sim` row's value onto the observed distribution of
    its group (module docstring).  Both frames need `group_keys` and
    `value_col`; groups present in sim but absent from obs emit NULL
    mapped values (left join).  Returns (keys…, value, p, mapped),
    sorted by (keys, value)."""
    keys = list(group_keys)
    if not keys:
        raise ValueError("quantile_map: need at least one group key")
    dec = "decimal(38,0)"

    def q(col):
        c = col.cast("double")
        return (F.signum(c) * F.floor(F.abs(c) * MICRO + F.lit(0.5))) \
            .cast("long")

    ws = Window.partitionBy(*keys).orderBy("_qx")
    wn = (Window.partitionBy(*keys)
          .rowsBetween(Window.unboundedPreceding,
                       Window.unboundedFollowing))
    s = (sim.select(*keys, F.col(value_col).alias("value"),
                    q(F.col(value_col)).alias("_qx"))
         .withColumn("_i", F.row_number().over(ws))
         .withColumn("_n", F.count(F.lit(1)).over(wn)))
    wo = Window.partitionBy(*keys).orderBy("_oq")
    won = (Window.partitionBy(*keys)
           .rowsBetween(Window.unboundedPreceding,
                        Window.unboundedFollowing))
    o = (obs.select(*keys, q(F.col(value_col)).alias("_oq"))
         .withColumn("_j", F.row_number().over(wo))
         .withColumn("_m", F.count(F.lit(1)).over(won))
         .withColumn("_onext", F.lead("_oq").over(wo)))
    # the group-bounded obs count joins onto sim FIRST (tiny relation,
    # one row per group), so f/rem can be computed before the order-
    # statistic join — which then stays a plain equi-join on (keys, f),
    # never an m-way theta scan per sim row
    mcnt = obs.groupBy(*keys).agg(F.count(F.lit(1)).alias("_m"))
    s = s.join(mcnt, keys, "left")
    num = F.col("_i").cast(dec) * (F.col("_m").cast(dec)
                                   - F.lit(1).cast(dec))
    den = F.col("_n").cast(dec) + F.lit(1).cast(dec)
    # f = 1 + num div den via the exact decimal floor-quotient idiom;
    # rem = num − f0·den (both non-negative)
    f0 = ((num - num % den) / den).cast(dec)
    rem = num % den
    s2 = s.select(*keys, "value", "_qx",
                  (f0 + F.lit(1).cast(dec)).cast("long").alias("_f"),
                  rem.alias("_rem"), den.alias("_den"),
                  _idiv_half_up(
                      F.col("_i").cast(dec) * F.lit(MICRO).cast(dec),
                      den).alias("_pq"))
    j = s2.join(o.select(*keys, F.col("_j").alias("_f"),
                         "_oq", "_onext"),
                [*keys, "_f"], "left")
    interp = F.when(
        F.col("_rem") == 0, F.lit(0).cast(dec)) \
        .otherwise(_idiv_half_up(
            F.col("_rem")
            * (F.col("_onext").cast(dec) - F.col("_oq").cast(dec)),
            F.col("_den")))
    mapped_q = F.when(F.col("_oq").isNotNull(),
                      F.col("_oq").cast(dec) + interp)
    mega_f = F.lit(float(MICRO))
    return (j.select(*keys, "value",
                     (F.col("_pq").cast("double") / mega_f)
                     .alias("p"),
                     (mapped_q.cast("double") / mega_f)
                     .alias("mapped"))
            .orderBy(*keys, "value"))
