"""PageRank (datapipe/graph.py) — closed-form and invariant tests."""

import pytest

from pyspark.sql import functions as F

from flood_data_spark.datapipe.graph import out_degrees, pagerank, hits


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_ring_is_uniform_and_sums_to_one(spark):
    r = {x.node: x.rank
         for x in pagerank(_edges(spark, [(1, 2), (2, 3), (3, 1)]),
                           iterations=10).collect()}
    assert all(abs(v - 1 / 3) < 1e-9 for v in r.values())
    assert abs(sum(r.values()) - 1.0) < 1e-9


def test_dangling_mass_is_conserved(spark):
    # 1 -> 2, node 2 has no out-edges: without redistribution rank leaks
    # 0.85 * r(2) every round
    r = {x.node: x.rank
         for x in pagerank(_edges(spark, [(1, 2)]),
                           iterations=20).collect()}
    assert abs(sum(r.values()) - 1.0) < 1e-9
    assert r[2] > r[1]  # the sink accumulates


def test_star_hub_outranks_leaves(spark):
    pairs = []
    for i in (1, 2, 3):
        pairs += [(0, i), (i, 0)]
    r = {x.node: x.rank
         for x in pagerank(_edges(spark, pairs), iterations=15).collect()}
    assert r[0] > 2.5 * r[1]
    assert abs(r[1] - r[2]) < 1e-9 and abs(r[2] - r[3]) < 1e-9


def test_one_iteration_closed_form(spark):
    # 1->2 only, N=2, d=0.85, r0 = 1/2 each, node 2 dangling:
    #   contrib(2) = r(1)/1; dangling m = r(2)
    #   r'(v) = 0.15/2 + 0.85*(contrib + m/2)
    r = {x.node: x.rank
         for x in pagerank(_edges(spark, [(1, 2)]),
                           iterations=1).collect()}
    m = 0.5
    exp1 = 0.15 / 2 + 0.85 * (0.0 + m / 2)
    exp2 = 0.15 / 2 + 0.85 * (0.5 + m / 2)
    assert r[1] == pytest.approx(exp1, abs=1e-12)
    assert r[2] == pytest.approx(exp2, abs=1e-12)


def test_deterministic_across_partitionings(spark):
    pairs = [(i, (i * 7) % 23) for i in range(60)] + \
            [((i * 7) % 23, i) for i in range(60)]
    e = _edges(spark, pairs)
    r1 = {x.node: x.rank
          for x in pagerank(e.repartition(11), iterations=6).collect()}
    r2 = {x.node: x.rank
          for x in pagerank(e.coalesce(1), iterations=6).collect()}
    assert set(r1) == set(r2)
    assert all(abs(r1[k] - r2[k]) < 1e-12 for k in r1)


def test_out_degrees_and_guards(spark):
    e = _edges(spark, [(1, 2), (1, 3), (2, 3)])
    deg = {r.node: r.out_deg for r in out_degrees(e).collect()}
    assert deg == {1: 2, 2: 1}
    with pytest.raises(ValueError):
        pagerank(e, iterations=0)
    with pytest.raises(ValueError):
        pagerank(e, damping=1.5)
    empty = _edges(spark, [])
    assert pagerank(empty, iterations=2).count() == 0


def test_hits_star_separates_hubs_from_authorities(spark):
    # directory node 0 links to resources 1..3; resource 1 also links out
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 2)], "src long, dst long")
    got = {r.node: (r.hub, r.authority)
           for r in hits(edges, iterations=5).collect()}
    assert got[0][0] > got[1][0] > 0          # 0 is the dominant hub
    assert got[0][1] == 0.0                   # nothing links TO 0
    assert got[2][1] > got[3][1] > 0          # 2 has two in-links
    assert got[2][0] == got[3][0] == 0.0      # pure resources: no out-links


def test_hits_one_iteration_closed_form(spark):
    # chain a->b->c with h0=1: a1 ∝ in-degree = {b:1, c:1} -> normalized
    # {b: 1/sqrt(2), c: 1/sqrt(2)}; h1 ∝ {a: a(b), b: a(c)} -> same split
    import math
    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    got = {r.node: (r.hub, r.authority)
           for r in hits(edges, iterations=1).collect()}
    v = round(1 / math.sqrt(2), 6)
    assert got[1][1] == v and got[2][1] == v
    assert got[0][0] == pytest.approx(v, abs=2e-6)
    assert got[1][0] == pytest.approx(v, abs=2e-6)
    assert got[2][0] == 0.0 and got[0][1] == 0.0


def test_hits_deterministic_across_partitionings(spark):
    edges = spark.createDataFrame(
        [(i, (i * 7 + 3) % 11) for i in range(60)], "src long, dst long")
    a = {(r.node, r.hub, r.authority)
         for r in hits(edges.coalesce(1), iterations=3).collect()}
    b = {(r.node, r.hub, r.authority)
         for r in hits(edges.repartition(8), iterations=3).collect()}
    assert a == b


def test_hits_guards(spark):
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="iterations"):
        hits(edges, iterations=0)


def test_label_propagation_spreads_and_clamps(spark):
    from flood_data_spark.datapipe.graph import label_propagation

    # path graph 0-1-2-3 (undirected), seed 0 with "good", 3 with "bad"
    und = [(0, 1), (1, 0), (1, 2), (2, 1), (2, 3), (3, 2)]
    edges = spark.createDataFrame(und, "src long, dst long")
    seeds = spark.createDataFrame(
        [(0, "good", 1.0), (3, "bad", 1.0)],
        "node long, label string, weight double")
    got = {(r.node, r.label): r.mass
           for r in label_propagation(edges, seeds,
                                      iterations=4).collect()}
    # seeds stay clamped at full mass
    assert got[(0, "good")] == 1.0 and got[(3, "bad")] == 1.0
    # the node adjacent to "good" carries more good-mass than bad-mass
    assert got[(1, "good")] > got.get((1, "bad"), 0.0)
    assert got[(2, "bad")] > got.get((2, "good"), 0.0)


def test_label_propagation_deterministic_and_guarded(spark):
    from flood_data_spark.datapipe.graph import label_propagation

    und = [(i, (i + 1) % 6) for i in range(6)]
    und += [(b, a) for a, b in und]
    edges = spark.createDataFrame(und, "src long, dst long")
    seeds = spark.createDataFrame([(0, "x", 1.0)],
                                  "node long, label string, weight double")
    a = {(r.node, r.label): r.mass
         for r in label_propagation(edges.coalesce(1), seeds,
                                    iterations=3).collect()}
    b = {(r.node, r.label): r.mass
         for r in label_propagation(edges.repartition(5), seeds,
                                    iterations=3).collect()}
    assert a == b
    import pytest as _pt
    with _pt.raises(ValueError, match="iterations"):
        label_propagation(edges, seeds, iterations=0)

def test_triangle_counts_closed_forms(spark):
    from flood_data_spark.datapipe.graph import triangle_counts

    # K4 (complete on 4 nodes): every node in C(3,2)=3 triangles, lcc=1
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    got = {r.node: (r.degree, r.triangles, r.lcc)
           for r in triangle_counts(_edges(spark, k4)).collect()}
    assert got == {n: (3, 3, 1.0) for n in range(4)}

    # triangle + pendant: 0-1-2-0 plus 2-3
    g = [(0, 1), (1, 2), (2, 0), (2, 3)]
    got = {r.node: (r.degree, r.triangles, r.lcc)
           for r in triangle_counts(_edges(spark, g)).collect()}
    assert got[0] == (2, 1, 1.0) and got[1] == (2, 1, 1.0)
    assert got[2] == (3, 1, round(1 / 3, 6))
    assert got[3] == (1, 0, 0.0)


def test_triangle_counts_direction_and_dup_insensitive(spark):
    from flood_data_spark.datapipe.graph import triangle_counts

    # same triangle stated with reversed/duplicated/self-loop edges
    messy = [(0, 1), (1, 0), (1, 2), (2, 0), (0, 2), (1, 1)]
    got = {r.node: r.triangles
           for r in triangle_counts(_edges(spark, messy)).collect()}
    assert got == {0: 1, 1: 1, 2: 1}


def test_triangle_counts_deterministic_across_partitionings(spark):
    from flood_data_spark.datapipe.graph import triangle_counts

    pairs = [(i, (i * 7 + 3) % 19) for i in range(80)]
    e = _edges(spark, pairs)
    a = {(r.node, r.degree, r.triangles, r.lcc)
         for r in triangle_counts(e.coalesce(1)).collect()}
    b = {(r.node, r.degree, r.triangles, r.lcc)
         for r in triangle_counts(e.repartition(8)).collect()}
    assert a == b


def test_adamic_adar_path_and_cap(spark):
    import math
    from flood_data_spark.datapipe.graph import adamic_adar

    # path 0-1-2: the only distance-2 pair is (0,2) through center 1
    got = adamic_adar(_edges(spark, [(0, 1), (1, 2)])).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.a, r.b, r.common) == (0, 2, 1)
    assert r.aa_mu == round(1_000_000 / math.log(2))

    # star center 0 with leaves 1..4: C(4,2) leaf pairs, center deg 4;
    # max_degree=3 drops the center -> no candidates at all
    star = [(0, i) for i in range(1, 5)]
    full = adamic_adar(_edges(spark, star)).collect()
    assert len(full) == 6
    assert all(x.aa_mu == round(1_000_000 / math.log(4)) for x in full)
    assert adamic_adar(_edges(spark, star), max_degree=3).count() == 0
    with pytest.raises(ValueError, match="max_degree"):
        adamic_adar(_edges(spark, star), max_degree=1)


def test_adamic_adar_excludes_existing_edges_and_topk(spark):
    from flood_data_spark.datapipe.graph import adamic_adar

    # triangle 0-1-2 plus pendant 3 on node 0: (1,3) and (2,3) are
    # distance-2 candidates; (1,2) is an existing edge -> excluded
    g = [(0, 1), (1, 2), (2, 0), (0, 3)]
    got = {(r.a, r.b): r.common for r in adamic_adar(_edges(spark, g)).collect()}
    assert set(got) == {(1, 3), (2, 3)}
    top = adamic_adar(_edges(spark, g), top_k=1).collect()
    assert len(top) == 1 and (top[0].a, top[0].b) == (1, 3)


def test_bfs_distances_layers_and_guards(spark):
    from flood_data_spark.datapipe.graph import bfs_distances

    # directed chain 0->1->2->3 plus shortcut 0->2
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (0, 2)])
    src = spark.createDataFrame([(0,)], "node long")
    got = {r.node: r.dist for r in bfs_distances(e, src, max_hops=3).collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 2}
    # hop budget truncates
    got1 = {r.node: r.dist for r in bfs_distances(e, src, max_hops=1).collect()}
    assert got1 == {0: 0, 1: 1, 2: 1}
    # multi-source: min distance wins, sources at dist 0
    src2 = spark.createDataFrame([(0,), (3,)], "node long")
    got2 = {r.node: r.dist
            for r in bfs_distances(e, src2, max_hops=2).collect()}
    assert got2[3] == 0 and got2[2] == 1
    with pytest.raises(ValueError, match="max_hops"):
        bfs_distances(e, src, max_hops=-1)


def test_bfs_deterministic_across_partitionings(spark):
    from flood_data_spark.datapipe.graph import bfs_distances

    pairs = [(i, (i * 5 + 1) % 31) for i in range(120)]
    e = _edges(spark, pairs)
    src = spark.createDataFrame([(0,), (7,)], "node long")
    a = {(r.node, r.dist)
         for r in bfs_distances(e.coalesce(1), src, max_hops=4).collect()}
    b = {(r.node, r.dist)
         for r in bfs_distances(e.repartition(9), src, max_hops=4).collect()}
    assert a == b
