"""Blocked fuzzy matching (entity resolution) over short text keys —
near-identical product/entity names that exact dedup can't collapse.

100 TB rationale: edit-distance matching is O(n^2) if expressed naively
(a levenshtein cross join is the classic scale-killer).  This module keeps
every plan candidate-bounded:

1. collapse the row relation to the DISTINCT-name relation first
   (`name_groups` — a digest-style groupBy; the corpus never reaches the
   matcher, only the name dictionary does, the same shrink exact_dedup
   exploits);
2. self-join on a cheap BLOCKING key (last token / prefix), so candidates
   are sum(|block|^2), never n^2 — the minhash-banding shape
   (`dedup.minhash_lsh_pairs`) with a semantic key instead of a hash;
3. prune with the length band |len_a - len_b| <= d BEFORE the distance
   call (levenshtein >= length difference, so the band is lossless), and
   evaluate `levenshtein(a, b, threshold)` — Spark's bounded variant stops
   the DP early once the threshold is exceeded;
4. hot blocks (a stop-token block can be corpus-sized) are capped by
   `max_block`, the doc-freq-cap tradeoff `dedup._cap_doc_freq` documents:
   bounded work for bounded recall, loudly opt-in.

Blocking recall contract: a pair is only found if both names share a block
key, so pairs that disagree on the key (e.g. an edit inside the last
token under `last_token` blocking) are missed — the standard blocking
tradeoff; pick the key where your edits aren't.

No reference analog (SURVEY.md §2.11 beyond-reference family); zero-UDF —
blocking, banding, and distance are all JVM-side Column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_name(col) -> Column:
    """lower + trim + collapse internal whitespace — the same normalization
    `dedup._digest` applies before exact matching, kept identical so the
    fuzzy layer composes with exact dedup's keys."""
    return F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))


def _block_key(name_col, block: str, prefix_len: int) -> Column:
    if block == "last_token":
        return F.element_at(F.split(name_col, " "), -1)
    if block == "prefix":
        return F.substring(name_col, 1, prefix_len)
    raise ValueError(f"unknown blocking strategy {block!r} "
                     "(expected 'last_token' or 'prefix')")


def name_groups(df: DataFrame, id_col: str = "p_partkey",
                text_col: str = "p_name",
                normalize: bool = True) -> DataFrame:
    """The distinct-name relation: (name, rep_id, n_rows) with rep_id the
    min id of the group.  ONE groupBy on the normalized name — identical
    rows collapse here, so all downstream fuzzy work is dictionary-sized.
    """
    name = normalize_name(F.col(text_col)) if normalize else F.col(text_col)
    return (df.select(name.alias("name"), F.col(id_col).alias("_id"))
            .groupBy("name")
            .agg(F.min("_id").alias("rep_id"),
                 F.count(F.lit(1)).alias("n_rows")))


def _capped(groups: DataFrame, key: Column, max_block: int | None):
    g = groups.withColumn("_bk", key)
    if max_block is None:
        return g
    if max_block < 2:
        raise ValueError("blocked fuzzy: max_block must be >= 2 "
                         "(a 1-name block can't pair)")
    # the capped path consumes g twice (the sizes aggregate + the join
    # side): checkpoint so the name relation's corpus-sized scan isn't
    # replanned per consumer, whichever caller we're under — the
    # dictionary-sized materialization is cheap by contract
    g = g.localCheckpoint(eager=False)
    sizes = g.groupBy("_bk").agg(F.count(F.lit(1)).alias("_bn"))
    return (g.join(F.broadcast(sizes.filter(F.col("_bn") <= max_block)),
                   "_bk").drop("_bn"))


def blocked_fuzzy_pairs(df: DataFrame, id_col: str = "p_partkey",
                        text_col: str = "p_name", max_dist: int = 2,
                        block: str = "last_token", prefix_len: int = 4,
                        max_block: int | None = None,
                        normalize: bool = True) -> DataFrame:
    """Within-corpus near-name pairs: (name_a, name_b, id_a, id_b, n_a,
    n_b, dist) with name_a < name_b and dist = levenshtein <= max_dist.

    Plan: distinct-name shrink → equi-join on the blocking key (hash
    shuffle on the key — NEVER a cartesian; tests/test_plan_shapes.py
    style assert in tests/test_fuzzy.py) → lossless length-band prune →
    bounded levenshtein.  ids/counts ride the name relation so the row
    corpus is scanned exactly once.
    """
    if max_dist < 1:
        raise ValueError("blocked_fuzzy_pairs: max_dist must be >= 1")
    # localCheckpoint: the name relation feeds BOTH join sides — without
    # it Catalyst replans the corpus-sized scan+aggregate subtree per
    # side (the multiply-consumed-bounded-relation lesson, curation.py
    # :502 / the Bloom bits materialization).  The checkpointed relation
    # is dictionary-sized, so the materialization is cheap by contract.
    g = _capped(name_groups(df, id_col, text_col, normalize)
                .localCheckpoint(eager=False),
                _block_key(F.col("name"), block, prefix_len), max_block)
    a = g.select(F.col("_bk"), F.col("name").alias("name_a"),
                 F.col("rep_id").alias("id_a"), F.col("n_rows").alias("n_a"))
    b = g.select(F.col("_bk"), F.col("name").alias("name_b"),
                 F.col("rep_id").alias("id_b"), F.col("n_rows").alias("n_b"))
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"), max_dist)
    return (a.join(b, "_bk")
            .filter(F.col("name_a") < F.col("name_b"))
            .filter(F.abs(F.length("name_a") - F.length("name_b"))
                    <= max_dist)
            .withColumn("dist", dist)
            .filter(F.col("dist") >= 0)  # bounded variant returns -1 above
            .select("name_a", "name_b", "id_a", "id_b", "n_a", "n_b",
                    "dist"))


def fuzzy_match_against(batch: DataFrame, reference: DataFrame,
                        batch_id: str = "doc_id", batch_text: str = "text",
                        ref_id: str = "ref_id", ref_text: str = "name",
                        max_dist: int = 2, block: str = "last_token",
                        prefix_len: int = 4,
                        max_block: int | None = None,
                        normalize: bool = True) -> DataFrame:
    """Canonicalize batch names against a reference catalog: for each
    distinct batch name, the single best reference name within max_dist —
    (name, match_name, match_id, dist), deterministic (min dist, then min
    match_name, then min match_id).  Unmatched names are absent (join the
    result back left to keep them).

    Same candidate-bounded shape as `blocked_fuzzy_pairs`; the per-name
    argmin is ONE window over the candidate relation (candidate-sized,
    not corpus-sized).
    """
    from pyspark.sql import Window

    if max_dist < 1:
        raise ValueError("fuzzy_match_against: max_dist must be >= 1")
    bg = _capped(name_groups(batch, batch_id, batch_text, normalize),
                 _block_key(F.col("name"), block, prefix_len), max_block)
    rg = _capped(name_groups(reference, ref_id, ref_text, normalize),
                 _block_key(F.col("name"), block, prefix_len), max_block)
    cand = (bg.select("_bk", "name")
            .join(rg.select(F.col("_bk"),
                            F.col("name").alias("match_name"),
                            F.col("rep_id").alias("match_id")), "_bk")
            .filter(F.abs(F.length("name") - F.length("match_name"))
                    <= max_dist)
            .withColumn("dist", F.levenshtein(F.col("name"),
                                              F.col("match_name"), max_dist))
            .filter(F.col("dist") >= 0))
    w = (Window.partitionBy("name")
         .orderBy(F.col("dist").asc(), F.col("match_name").asc(),
                  F.col("match_id").asc()))
    return (cand.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("name", "match_name", "match_id", "dist"))


def snm_pairs(df: DataFrame, id_col: str = "p_partkey",
              text_col: str = "p_name", window: int = 3,
              max_dist: int = 2, prefix_len: int = 1,
              normalize: bool = True) -> DataFrame:
    """Sorted-neighborhood candidate pairs (Hernández & Stolfo 1995):
    sort the distinct-name relation, compare each name with its next
    `window` neighbors in sort order — the OTHER classic blocker, which
    catches pairs `blocked_fuzzy_pairs` misses (edits inside the
    blocking token move a name to a different block but rarely far in
    SORT order when the edit is late in the string).

    Scale posture: a truly global sort is the single-task window trap,
    so the sort runs WITHIN coarse prefix partitions (first
    `prefix_len` chars of the normalized name) — the standard
    distributed SNM compromise.  Boundary contract: pairs whose names
    disagree in the first `prefix_len` chars are missed (they'd sort
    into different partitions); early-string edits are exactly where
    sort order diverges anyway, so the recall loss concentrates where
    SNM is weakest regardless.  Run both blockers and union for the
    practical recall ceiling.

    Neighbors materialize as `window` lead() PROJECTION COLUMNS over one
    ordered exchange (the winnowing lag/lead lesson — never an
    explode+self-join whose post-Generate statistics Catalyst
    misestimates), then one explode of the w-struct array, the lossless
    length band, and bounded levenshtein.  Names are distinct by
    construction, so the sort order is total and deterministic.

    Returns (name_a, name_b, id_a, id_b, n_a, n_b, dist), name_a <
    name_b in sort order (adjacent-in-sort, so no canonical min/max
    swap needed).
    """
    if window < 1:
        raise ValueError(f"snm_pairs: window must be >= 1, got {window}")
    if max_dist < 1:
        raise ValueError(f"snm_pairs: max_dist must be >= 1, "
                         f"got {max_dist}")
    from pyspark.sql import Window

    g = (name_groups(df, id_col, text_col, normalize)
         .withColumn("_pk", F.substring(F.col("name"), 1, prefix_len)))
    w_spec = Window.partitionBy("_pk").orderBy(F.col("name").asc())
    # lead columns must materialize as a PROJECTION before the explode —
    # Spark rejects window expressions inside a generator
    led = g.select(
        F.col("name").alias("name_a"), F.col("rep_id").alias("id_a"),
        F.col("n_rows").alias("n_a"),
        *[c for i in range(1, window + 1) for c in (
            F.lead("name", i).over(w_spec).alias(f"_nm{i}"),
            F.lead("rep_id", i).over(w_spec).alias(f"_id{i}"),
            F.lead("n_rows", i).over(w_spec).alias(f"_nr{i}"))])
    neigh = F.array(*[
        F.struct(F.col(f"_nm{i}").alias("name_b"),
                 F.col(f"_id{i}").alias("id_b"),
                 F.col(f"_nr{i}").alias("n_b"))
        for i in range(1, window + 1)])
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"), max_dist)
    return (led.select("name_a", "id_a", "n_a",
                       F.explode(neigh).alias("nb"))
            .select("name_a", "id_a", "n_a", "nb.name_b", "nb.id_b",
                    "nb.n_b")
            .filter(F.col("name_b").isNotNull())
            .filter(F.abs(F.length("name_a") - F.length("name_b"))
                    <= max_dist)
            .withColumn("dist", dist)
            .filter(F.col("dist") >= 0)
            .select("name_a", "name_b", "id_a", "id_b", "n_a", "n_b",
                    "dist"))


def fs_linkage_weights(pairs: DataFrame, agreement_cols,
                       match_col: str = "match",
                       laplace: float = 0.5) -> DataFrame:
    """Fellegi-Sunter record-linkage weights (Fellegi & Sunter 1969) —
    the probabilistic scoring layer on top of this module's candidate
    generators (blocked_fuzzy_pairs / snm_pairs): from LABELED pairs,
    per agreement field k estimate

        m_k = P(agree_k | match),   u_k = P(agree_k | non-match)

    (Laplace-smoothed: (hits + a)/(n + 2a)) and emit the two
    log-likelihood-ratio weights

        w_agree = ln(m/u),   w_disagree = ln((1-m)/(1-u))

    each rounded ONCE to integer micro-nats (the WoE discipline, so
    downstream pair scores are exact integer sums).  One melt
    (explode of K field structs) + one K-group aggregate — the pair
    corpus moves once, the weight relation is K rows.  Returns
    (field, n_match, n_nonmatch, agree_match, agree_nonmatch,
    w_agree_micro, w_disagree_micro)."""
    cols = list(agreement_cols)
    if not cols:
        raise ValueError("fs_linkage_weights: need agreement columns")
    if laplace <= 0:
        raise ValueError(
            f"fs_linkage_weights: laplace must be > 0, got {laplace}")
    mt = F.col(match_col).cast("int")
    melted = pairs.select(
        mt.alias("_m"),
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("field"),
                     F.col(c).cast("int").alias("agree"))
            for c in cols])).alias("_f")) \
        .select("_m", F.col("_f.field").alias("field"),
                F.col("_f.agree").alias("_a"))
    g = (melted.groupBy("field")
         .agg(F.sum("_m").alias("n_match"),
              F.sum(1 - F.col("_m")).alias("n_nonmatch"),
              F.sum(F.col("_a") * F.col("_m")).alias("agree_match"),
              F.sum(F.col("_a") * (1 - F.col("_m")))
              .alias("agree_nonmatch")))
    a = float(laplace)
    m_p = (F.col("agree_match") + F.lit(a)) \
        / (F.col("n_match") + F.lit(2 * a))
    u_p = (F.col("agree_nonmatch") + F.lit(a)) \
        / (F.col("n_nonmatch") + F.lit(2 * a))
    MICRO = 1_000_000
    wa = F.round((F.log(m_p) - F.log(u_p)) * MICRO).cast("long")
    wd = F.round((F.log(F.lit(1.0) - m_p) - F.log(F.lit(1.0) - u_p))
                 * MICRO).cast("long")
    return (g.withColumn("w_agree_micro", wa)
            .withColumn("w_disagree_micro", wd)
            .orderBy("field"))


def fs_score_pairs(pairs: DataFrame, id_cols, agreement_cols,
                   match_col: str = "match",
                   laplace: float = 0.5) -> DataFrame:
    """Score every pair with the Fellegi-Sunter log-likelihood sum:
    Σ_k (agree_k ? w_agree_k : w_disagree_k), an EXACT integer sum of
    the micro-nat weights from `fs_linkage_weights` (estimated on the
    same labeled relation — the classical supervised form; score new
    unlabeled pairs by passing the weights relation yourself).  The
    K-row weight table broadcasts back onto the melted pairs; one
    pair-id-keyed sum exchange.  Returns (id_cols..., match, score)
    with score = score_micro / 1e6, sorted by ids."""
    ids = list(id_cols)
    cols = list(agreement_cols)
    w = fs_linkage_weights(pairs, cols, match_col, laplace) \
        .select("field", "w_agree_micro", "w_disagree_micro")
    melted = pairs.select(
        *ids, F.col(match_col).cast("int").alias("match"),
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("field"),
                     F.col(c).cast("int").alias("agree"))
            for c in cols])).alias("_f")) \
        .select(*ids, "match", F.col("_f.field").alias("field"),
                F.col("_f.agree").alias("_a"))
    scored = (melted.join(F.broadcast(w), "field")
              .groupBy(*ids, "match")
              .agg(F.sum(F.when(F.col("_a") == 1,
                                F.col("w_agree_micro"))
                         .otherwise(F.col("w_disagree_micro")))
                   .alias("_s")))
    return (scored.select(*ids, "match",
                          (F.col("_s").cast("double")
                           / F.lit(1e6)).alias("score"))
            .orderBy(*ids))
