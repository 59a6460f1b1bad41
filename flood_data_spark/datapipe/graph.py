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


def _canonical_edges(edges: DataFrame) -> DataFrame:
    """Undirected simple-graph normalization: drop self-loops, fold both
    directions onto (u, v) with u < v, distinct.  One projection + one
    distinct (hash shuffle on the pair key) — edge-sized, done once."""
    return (edges
            .filter(F.col("src") != F.col("dst"))
            .select(F.least("src", "dst").alias("u"),
                    F.greatest("src", "dst").alias("v"))
            .distinct())


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation over an undirected simple graph:
    (node, degree, triangles, lcc) where lcc is the local clustering
    coefficient triangles / (degree choose 2), rounded to 6 decimals
    (0.0 for degree < 2).

    100 TB rationale — the degree-orientation trick (Cohen 2009; the
    plan every distributed triangle counter uses): orient each canonical
    edge from its LOWER-(degree, id) endpoint to its higher one.  The
    oriented out-degree is O(sqrt(m)) for ANY graph, so the wedge
    self-join (out-edges ⋈ out-edges on the pivot) generates at most
    Σ d_out² = O(m^1.5) candidate wedges instead of the Σ d² blow-up a
    naive neighbor join pays on hubs — a power-law host graph with a
    10^6-degree hub generates 10^12 naive wedges but only m^1.5 oriented
    ones.  Each triangle appears as EXACTLY ONE wedge (at its lowest-
    order corner) closed by exactly one oriented edge, so counting is a
    semi-join, and per-corner credit is one explode of the matched
    triangle rows.  All integer arithmetic — the gate carries a full
    value hash (q_triangles).

    Plan: canonical edges (1 shuffle) → degree agg (1 shuffle) → two
    broadcast-or-shuffle joins to attach endpoint orders → wedge
    self-join on the pivot key → closing-edge inner join on the (lo, hi)
    pair key → explode to 3 corner credits → groupBy(node).  Degrees are
    node-sized; the wedge relation is the m^1.5-bounded intermediate and
    never leaves the pair-keyed shuffle.
    """
    ce = _canonical_edges(edges).localCheckpoint(eager=False)
    deg = (ce.select(F.col("u").alias("node"))
           .unionByName(ce.select(F.col("v").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
           .localCheckpoint(eager=False))
    # total order for orientation: (degree, node) lexicographic
    du = deg.select(F.col("node").alias("u"),
                    F.col("degree").alias("du"))
    dv = deg.select(F.col("node").alias("v"),
                    F.col("degree").alias("dv"))
    oriented = (ce.join(du, "u").join(dv, "v")
                .select(
                    F.when((F.col("du") < F.col("dv"))
                           | ((F.col("du") == F.col("dv"))
                              & (F.col("u") < F.col("v"))),
                           F.col("u")).otherwise(F.col("v")).alias("lo"),
                    F.when((F.col("du") < F.col("dv"))
                           | ((F.col("du") == F.col("dv"))
                              & (F.col("u") < F.col("v"))),
                           F.col("v")).otherwise(F.col("u")).alias("hi"))
                .localCheckpoint(eager=False))
    a = oriented.select(F.col("lo").alias("pivot"), F.col("hi").alias("b"))
    b = oriented.select(F.col("lo").alias("pivot"), F.col("hi").alias("c"))
    # each unordered out-neighbor pair once: b < c in node order
    wedges = (a.join(b, "pivot").filter(F.col("b") < F.col("c")))
    # the closing edge is oriented too, but its direction depends on the
    # (deg, id) order of b and c — join on the CANONICAL pair instead,
    # which is direction-free and already distinct
    closing = ce.select(F.least("u", "v").alias("b"),
                        F.greatest("u", "v").alias("c"))
    tri = wedges.join(closing, ["b", "c"])
    credits = (tri.select(F.explode(F.array("pivot", "b", "c"))
                          .alias("node"))
               .groupBy("node")
               .agg(F.count(F.lit(1)).alias("triangles")))
    return (deg.join(credits, "node", "left")
            .select("node", "degree",
                    F.coalesce("triangles", F.lit(0)).alias("triangles"),
                    F.when(F.col("degree") < 2, F.lit(0.0))
                    .otherwise(F.round(
                        F.coalesce("triangles", F.lit(0))
                        * 2.0 / (F.col("degree")
                                 * (F.col("degree") - 1)), 6))
                    .alias("lcc")))


def adamic_adar(edges: DataFrame, max_degree: int | None = None,
                top_k: int | None = None) -> DataFrame:
    """Adamic-Adar link prediction over an undirected simple graph:
    score NON-adjacent node pairs at distance 2 by
    Σ_{z ∈ N(a) ∩ N(b)} 1 / ln(deg(z)), plus the plain common-neighbor
    count.  Returns (a, b, common, aa_mu) with a < b; `aa_mu` is the
    score in INTEGER micro-units.

    Exactness: 1/ln(deg) is irrational, and a float groupBy-sum over the
    common neighbors would accumulate in partition order — unportable
    across engines.  Instead each wedge center contributes
    round(1e6 / ln(deg_z)) as a BIGINT and the pair score is an INTEGER
    sum — order-free, so the gate (q_link_pred) carries a full value
    hash.  ln() itself differs across engines by at most 1 ulp, which
    cannot move a round-to-integer except exactly at a .5 micro-unit —
    structurally improbable for irrational logs (the haversine/radius
    precedent, operators/serving.py).

    Scale: the wedge relation is the quadratic hazard — a degree-10^6
    hub mints 10^12 candidate pairs.  `max_degree` is the doc-freq-cap
    analog (datapipe/dedup._cap_doc_freq): wedge CENTERS above the cap
    are dropped before the self-join, bounding fan-out at
    Σ min(d, cap)² and biasing scores downward only through hubs — the
    standard LP trade (a 10^6-degree hub contributes 1/ln(10^6) ≈ 0.07
    per pair anyway).  Existing edges are removed by a left_anti join on
    the canonical pair key.  `top_k` truncates by (aa_mu DESC, a, b) via
    one TakeOrdered — no global sort.
    """
    ce = _canonical_edges(edges).localCheckpoint(eager=False)
    deg = (ce.select(F.col("u").alias("node"))
           .unionByName(ce.select(F.col("v").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("degree")))
    centers = deg.filter(F.col("degree") >= 2)
    if max_degree is not None:
        if max_degree < 2:
            raise ValueError(
                f"max_degree must be >= 2, got {max_degree}")
        centers = centers.filter(F.col("degree") <= max_degree)
    centers = centers.select(
        F.col("node").alias("z"),
        F.round(F.lit(1_000_000.0) / F.log(F.col("degree")))
        .cast("long").alias("w_mu"))
    # adjacency of each center, both directions (centers are interior)
    adj = (ce.select(F.col("u").alias("z"), F.col("v").alias("n"))
           .unionByName(ce.select(F.col("v").alias("z"),
                                  F.col("u").alias("n")))
           .join(centers, "z"))
    lhs = adj.select("z", "w_mu", F.col("n").alias("a"))
    rhs = adj.select(F.col("z").alias("z2"), F.col("n").alias("b"))
    pairs = (lhs.join(rhs, lhs["z"] == rhs["z2"])
             .filter(F.col("a") < F.col("b"))
             .groupBy("a", "b")
             .agg(F.count(F.lit(1)).alias("common"),
                  F.sum("w_mu").alias("aa_mu")))
    existing = ce.select(F.col("u").alias("a"), F.col("v").alias("b"))
    scored = pairs.join(existing, ["a", "b"], "left_anti")
    if top_k is not None:
        scored = (scored.orderBy(F.col("aa_mu").desc(),
                                 F.col("a").asc(), F.col("b").asc())
                  .limit(top_k))
    return scored


def bfs_distances(edges: DataFrame, sources: DataFrame,
                  max_hops: int = 3) -> DataFrame:
    """Multi-source BFS over a directed edge list: (node, dist) for every
    node reachable from `sources` (a 1-column `node` relation) within
    `max_hops` edges; dist is the exact hop count (INTEGER — fully
    portable, the fixed-iteration run unrolls in SQL).

    Per hop: frontier ⋈ edges on src (edge-sized shuffle) → groupBy(dst)
    min → left_anti against the settled set (BFS never improves a
    settled node, so the anti-join replaces a min-merge) → union into
    the settled relation, localCheckpoint-ed per round (node-sized; the
    PageRank lineage discipline).  k hops cost k edge-sized shuffles —
    the Pregel plan, expressed relationally.  Frontier-only expansion
    means total join work is Σ |frontier_i| ⋈ edges, not k × |V|.
    """
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    e = edges.select("src", "dst").localCheckpoint(eager=False)
    settled = (sources.select("node").distinct()
               .withColumn("dist", F.lit(0))
               .localCheckpoint(eager=False))
    frontier = settled
    for hop in range(1, max_hops + 1):
        nxt = (frontier.join(e, frontier["node"] == e["src"])
               .select(F.col("dst").alias("node"))
               .distinct()
               .join(settled.select("node"), "node", "left_anti")
               .withColumn("dist", F.lit(hop)))
        settled = settled.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt
    return settled


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
