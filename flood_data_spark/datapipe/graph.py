"""Graph operators over edge tables (src, dst) — PageRank for corpus
curation.

100 TB rationale: production corpus pipelines rank HOSTS/domains by link
authority and use the rank as a quality prior (the CommonCrawl host-rank
filter); the graph is edge-list-shaped and orders of magnitude smaller
than the corpus, but still far beyond a driver.  Each power iteration here
is ONE join (ranks ⋈ edges on src — broadcast when ranks fit, shuffle
otherwise) + ONE groupBy(dst) sum with map-side partial aggregation, so an
iteration's shuffle volume is edge-sized, never corpus-sized.  Ranks and
degrees are node-sized.  Ranks are localCheckpoint-ed every round (a
node-sized materialization): separate Spark actions re-plan from the
logical plan, so un-materialized rounds would re-execute every prior
join+agg — the checkpoint pins one edge-sized shuffle per iteration and
truncates the analyzer-hostile nested-join lineage (same discipline as
datapipe/bpe.py and dedup.dedup_clusters).

Conventions: ranks sum to 1 (r0 = 1/N); dangling mass (nodes with no
out-edges) is redistributed uniformly, the standard correction — without
it rank leaks every iteration.  Deterministic given (edges, iterations):
every step is an exact aggregate, no sampling, no RNG.

The fixed-iteration form is fully SQL-expressible (unrolled), so the
driver gate value-hashes a 5-iteration run (q_pagerank) — iterative
algorithms usually get only contract gates; this one carries real value
evidence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def out_degrees(edges: DataFrame) -> DataFrame:
    """(node, out_deg) for every node with >= 1 outgoing edge."""
    return (edges.groupBy(F.col("src").alias("node"))
            .agg(F.count("*").alias("out_deg")))


def pagerank(edges: DataFrame, iterations: int = 5,
             damping: float = 0.85) -> DataFrame:
    """Power-iteration PageRank over a directed edge list; returns
    (node, rank) with Σ rank = 1.  For undirected semantics, union both
    edge directions before calling.

    Per iteration: contributions = ranks ⋈ edges (src) → groupBy(dst)
    sum; dangling mass (Σ rank over out-degree-0 nodes — one node-sized
    aggregate, collected as ONE scalar) redistributes uniformly; nodes
    with no in-edges keep the teleport + dangling share.  Edges and
    degrees are computed once and cached across iterations.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if not 0.0 <= damping <= 1.0:
        raise ValueError(f"damping must be in [0, 1], got {damping}")
    nodes = (edges.select(F.col("src").alias("node"))
             .unionByName(edges.select(F.col("dst").alias("node")))
             .distinct())
    deg = out_degrees(edges)
    # node-sized relation reused every round: (node, out_deg or null)
    base = nodes.join(deg, "node", "left").localCheckpoint()
    n = base.count()
    if n == 0:
        return base.select("node", F.lit(0.0).alias("rank"))
    e = edges.select("src", "dst").localCheckpoint()

    # one-time check: a graph with no out-degree-0 nodes (e.g. any
    # undirected construction) never has dangling mass — skip the
    # per-iteration scalar action entirely in that case
    has_dangling = base.filter(F.col("out_deg").isNull()).limit(1).count() > 0

    ranks = base.select("node", "out_deg",
                        (F.lit(1.0) / n).alias("rank"))
    for it in range(iterations):
        # dangling mass: a scalar aggregate over the CHECKPOINTED ranks
        # (node-sized, no recompute); identically zero when no node lacks
        # out-edges
        dangling = 0.0
        if has_dangling:
            dangling = (ranks.filter(F.col("out_deg").isNull())
                        .agg(F.coalesce(F.sum("rank"), F.lit(0.0))
                             .alias("m")).first().m)
        contrib = (ranks.filter(F.col("out_deg").isNotNull())
                   .join(e, ranks["node"] == e["src"])
                   .select(F.col("dst").alias("node"),
                           (F.col("rank") / F.col("out_deg"))
                           .alias("c"))
                   .groupBy("node")
                   .agg(F.sum("c").alias("c")))
        ranks = (base.join(contrib, "node", "left")
                 .select("node", "out_deg",
                         (F.lit((1.0 - damping) / n)
                          + F.lit(damping)
                          * (F.coalesce(F.col("c"), F.lit(0.0))
                             + F.lit(dangling / n))).alias("rank")))
        # checkpoint EVERY round (ranks are node-sized — cheap): separate
        # actions re-plan from the logical plan, so without this each
        # round's dangling aggregate and the next round's job would
        # re-execute every prior un-materialized join+agg (~2.5x the
        # edge-sized shuffles over a 4-round window, measured reasoning in
        # the round-7 review) — with it, exactly ONE edge-sized shuffle
        # executes per iteration
        if it + 1 < iterations:
            ranks = ranks.localCheckpoint()
    return ranks.select("node", "rank")


def hits(edges: DataFrame, iterations: int = 3) -> DataFrame:
    """Kleinberg HITS over a directed edge list: (node, hub, authority),
    L2-normalized, both scores rounded to 6 decimals after every
    normalization.

    The hub/authority split is the curation signal PageRank can't give:
    a link DIRECTORY (high hub) and a linked RESOURCE (high authority)
    both get PageRank mass, but corpus quality priors usually want
    authorities only.  Same plan economics as `pagerank`: one edge-sized
    join + one groupBy per half-step, node-sized score relations
    localCheckpoint-ed every round, the L2 norm as a broadcast scalar
    row.  Edge multiplicity counts (multigraph semantics) — `.distinct()`
    upstream for simple-graph behavior.

    The per-step round(…, 6) pins the fixed point across engines and
    partitionings (the power-iteration/classifier discipline), so a
    fixed-iteration run unrolls in ANSI SQL — q_hits carries a full
    value hash.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    e = edges.select("src", "dst").localCheckpoint(eager=False)
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint(eager=False))

    def _norm6(scores: DataFrame, col: str) -> DataFrame:
        nrm = scores.agg(
            F.sqrt(F.sum(F.col(col) * F.col(col))).alias("_n"))
        return (scores.crossJoin(F.broadcast(nrm))
                .select("node", F.round(F.col(col) / F.col("_n"), 6)
                        .alias(col)))

    # h0 = 1 for every node, so the first authority pass is a plain
    # in-degree sum — stated identically in the SQL unroll
    hubs = nodes.select("node", F.lit(1.0).alias("hub"))
    auth = None
    for it in range(iterations):
        auth = _norm6(
            e.join(hubs, e["src"] == hubs["node"])
             .groupBy(e["dst"].alias("node"))
             .agg(F.sum("hub").alias("authority")), "authority") \
            .localCheckpoint(eager=False)
        hubs = _norm6(
            e.join(auth, e["dst"] == auth["node"])
             .groupBy(e["src"].alias("node"))
             .agg(F.sum("authority").alias("hub")), "hub") \
            .localCheckpoint(eager=False)
    return (nodes
            .join(hubs, "node", "left")
            .join(auth, "node", "left")
            .select("node",
                    F.coalesce("hub", F.lit(0.0)).alias("hub"),
                    F.coalesce("authority", F.lit(0.0)).alias("authority")))


def label_propagation(edges: DataFrame, seeds: DataFrame,
                      iterations: int = 3) -> DataFrame:
    """Semi-supervised label propagation over an undirected similarity
    graph — the standard way to stretch a small set of human/classifier
    quality labels across a near-duplicate / similarity pair relation
    (edges from `dedup.minhash_lsh_pairs`, `similarity` candidates, or
    any (src, dst) relation; union both directions upstream for
    undirected semantics).

    `seeds` is (node, label, weight) with weight in [0, 1] (1.0 for
    hard labels).  Each iteration: every node's label-mass becomes the
    mean of its neighbors' masses, then seed nodes are CLAMPED back to
    their seed distribution (the Zhu-Ghahramani recipe).

    Masses are maintained as INTEGER micro-units (1e-6): the spread
    divides an exact integer sum by the integer degree with an explicit
    half-up rule, `(2*sum + deg) div (2*deg)` — pure integer
    arithmetic, so every step is EXACT and identical on any engine.
    (The float formulation was measurably unportable: summed 6-decimal
    masses over an integer degree land on exact decimal half-points,
    where Spark's and DuckDB's round() disagree on the binary
    neighbors — 2 of 478 rows in the first gate run.)  The
    fixed-iteration run therefore unrolls in SQL with full value
    equality (q_label_prop), not just round-tolerant equality.

    Per iteration: one edge-sized join + one groupBy(dst, label) sum
    divided by the receiver's FULL in-degree (a neighbor without the
    label contributes an implicit 0 — per-label avg would let one
    labeled neighbor dominate) + a node-sized clamp join; label
    relations are (node x label)-sized and localCheckpoint-ed per
    round.  Returns (node, label, mass) for every node reachable from
    a seed, mass > 0 (mass = micro-units / 1e6).
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    e = edges.select("src", "dst").localCheckpoint(eager=False)
    deg = (e.groupBy(F.col("dst").alias("node"))
           .agg(F.count(F.lit(1)).alias("_deg"))
           .localCheckpoint(eager=False))
    s = (seeds.select(F.col("node"), F.col("label"),
                      F.round(F.col("weight") * 1_000_000)
                      .cast("long").alias("_mu"))
         .localCheckpoint(eager=False))
    labels = s
    for _ in range(iterations):
        spread = (e.join(labels, e["src"] == labels["node"])
                  .groupBy(F.col("dst").alias("node"), F.col("label"))
                  .agg(F.sum("_mu").alias("_m"))
                  .join(deg, "node")
                  .select("node", "label",
                          F.expr("(2 * _m + _deg) div (2 * _deg)")
                          .alias("_mu")))
        # clamp: seed nodes keep their seed distribution verbatim
        labels = (spread.join(s.select(F.col("node").alias("_sn"))
                              .distinct(),
                              spread["node"] == F.col("_sn"), "left_anti")
                  .unionByName(s)
                  .localCheckpoint(eager=False))
    return (labels.filter(F.col("_mu") > 0)
            .select("node", "label",
                    (F.col("_mu") / F.lit(1_000_000.0)).alias("mass")))
