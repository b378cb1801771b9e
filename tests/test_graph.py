"""PageRank (operators/graph.py) semantics against hand-computed ground truth.

The registered ``pagerank_top_sources`` query drives the operator under the
DuckDB oracle; these tests pin the numeric semantics the oracle restates:
hand-computed ranks on a small graph, dangling-mass redistribution,
sum-to-1 invariant, parallel-edge dedup, and the empty-graph guard.
"""

from __future__ import annotations

import pytest

from fs2_kinesis_firehose_spark.operators.graph import pagerank


def _ranks(df) -> dict:
    return {r["node"]: r["rank"] for r in df.collect()}


def _reference_pagerank(edges, iterations, damping=0.85):
    """Plain-Python textbook PageRank (dangling mass redistributed uniformly)."""
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        dmass = sum(r for v, r in rank.items() if v not in out)
        inflow = {v: 0.0 for v in nodes}
        for s, d in edges:
            inflow[d] += rank[s] / out[s]
        rank = {
            v: (1.0 - damping) / n + damping * (inflow[v] + dmass / n)
            for v in nodes
        }
    return rank


@pytest.fixture(scope="module")
def edge_df(spark):
    def make(pairs):
        return spark.createDataFrame(pairs, "src bigint, dst bigint")

    return make


def test_hand_computed_four_node_graph(edge_df):
    # classic example: 1→2, 1→3, 2→3, 3→1, 4→3  (4 is a source, 3 a hub)
    pairs = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3)]
    got = _ranks(pagerank(edge_df(pairs), iterations=3))
    want = _reference_pagerank(pairs, iterations=3)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)


def test_dangling_node_mass_redistributed(edge_df):
    # 2 has no out-edges: its rank must be redistributed, not lost
    pairs = [(1, 2), (3, 2)]
    got = _ranks(pagerank(edge_df(pairs), iterations=4))
    want = _reference_pagerank(pairs, iterations=4)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_ranks_sum_to_one(edge_df):
    pairs = [(i, (i * 7 + 3) % 11) for i in range(11)] + [(2, 5), (9, 1)]
    got = _ranks(pagerank(edge_df(pairs), iterations=5))
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_parallel_edges_deduplicated(edge_df):
    # multigraph input: duplicated edges must not double contributions
    once = _ranks(pagerank(edge_df([(1, 2), (2, 1)]), iterations=3))
    dup = _ranks(pagerank(edge_df([(1, 2), (1, 2), (2, 1)]), iterations=3))
    assert once == dup


def test_empty_edges_returns_empty(edge_df):
    out = pagerank(edge_df([]), iterations=3)
    assert out.columns == ["node", "rank"]
    assert out.count() == 0


def test_iterations_validated(edge_df):
    with pytest.raises(ValueError):
        pagerank(edge_df([(1, 2)]), iterations=0)


# --- triangle_counts -------------------------------------------------------


def _tri(spark, rows):
    df = spark.createDataFrame(rows, "src long, dst long")
    from fs2_kinesis_firehose_spark.operators.graph import triangle_counts

    return {r["node"]: r["tri_cnt"] for r in triangle_counts(df).collect()}


def test_triangles_k4(spark):
    # complete graph on 4 nodes: 4 triangles, each node in exactly 3
    edges = [(a, b) for a in range(4) for b in range(4) if a < b]
    assert _tri(spark, edges) == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangles_star_has_none(spark):
    # hub-and-spoke: plenty of wedges, zero triangles
    assert _tri(spark, [(0, i) for i in range(1, 8)]) == {}


def test_triangles_direction_dup_selfloop_invariant(spark):
    base = [(1, 2), (2, 3), (1, 3)]
    noisy = base + [(2, 1), (3, 2), (1, 2), (1, 1), (3, 3)]
    assert _tri(spark, noisy) == _tri(spark, base) == {1: 1, 2: 1, 3: 1}


def test_triangles_two_sharing_an_edge(spark):
    # triangles {1,2,3} and {2,3,4} share edge (2,3)
    edges = [(1, 2), (2, 3), (1, 3), (2, 4), (3, 4)]
    assert _tri(spark, edges) == {1: 1, 2: 2, 3: 2, 4: 1}


def test_triangle_prune_star_to_nothing_clique_untouched(spark):
    """Degree-< 2 peeling (r9 verdict ask #6): a star collapses to ZERO
    edges before orientation (every spoke is degree-1; removing them
    leaves the hub isolated), while a clique survives intact."""
    from fs2_kinesis_firehose_spark.operators.graph import (
        _canonical_undirected,
        _prune_low_degree,
    )

    star = spark.createDataFrame([(0, i) for i in range(1, 8)], "src long, dst long")
    assert _prune_low_degree(_canonical_undirected(star, "src", "dst")).count() == 0
    k4 = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a < b], "src long, dst long"
    )
    got = {
        (r.u, r.v)
        for r in _prune_low_degree(_canonical_undirected(k4, "src", "dst")).collect()
    }
    assert got == {(a, b) for a in range(4) for b in range(4) if a < b}


def test_peel_fringes_wedge_ub_matches_final_degrees(spark):
    """_peel_fringes returns the wedge upper bound Σ_v C(deg,2) of the
    FINAL degree table it hands back (r14: the partition-floor gate rides
    the peel-gate fold instead of a second sequential driver job) — in
    both the no-peel case and the case where rounds actually peel."""
    from fs2_kinesis_firehose_spark.operators.graph import (
        _canonical_undirected,
        _degrees,
        _peel_fringes,
    )
    from pyspark.sql import functions as F

    def check(edges):
        und = _canonical_undirected(
            spark.createDataFrame(edges, "src long, dst long"), "src", "dst"
        ).localCheckpoint(eager=False)
        deg = _degrees(und).localCheckpoint(eager=False)
        und2, deg2, wedge_ub = _peel_fringes(und, deg)
        expect = int(
            deg2.agg(
                F.sum(F.col("deg") * (F.col("deg") - 1) / 2)
            ).first()[0]
            or 0
        )
        assert wedge_ub == expect

    # no-peel: K4 is fringe-free (one gate fold, bound from that fold)
    check([(a, b) for a in range(4) for b in range(4) if a < b])
    # peel: K4 + pendant path — two rounds trim the tail, so the bound
    # must be recomputed on the post-peel degrees, not the stale fold
    check(
        [(a, b) for a in range(4) for b in range(4) if a < b]
        + [(3, 4), (4, 5), (5, 6), (6, 7)]
    )
    # fully-peeling graph: a star empties; bound must be 0, not stale
    check([(0, i) for i in range(1, 8)])


def test_triangles_clique_with_pendant_tail(spark):
    """Cascading fringe: K4 plus a 3-edge pendant path — the path peels
    away round by round (4-5-6-7: 7 is deg 1, then 6, then 5) and the
    counts equal plain K4's.  Two peel rounds trim most of it; any
    remainder is handled by the (unchanged) wedge join, so counts stay
    exact regardless of fringe depth."""
    edges = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges += [(3, 4), (4, 5), (5, 6), (6, 7)]
    assert _tri(spark, edges) == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangles_match_bruteforce_random(spark):
    import itertools
    import numpy as np

    rng = np.random.default_rng(23)
    n = 30
    edges = [(int(a), int(b)) for a in range(n) for b in range(n)
             if a < b and rng.random() < 0.25]
    eset = set(edges)
    want: dict[int, int] = {}
    for a, b, c in itertools.combinations(range(n), 3):
        if (a, b) in eset and (b, c) in eset and (a, c) in eset:
            for x in (a, b, c):
                want[x] = want.get(x, 0) + 1
    assert _tri(spark, edges) == want


# --- triangle_count_estimate (DOULION) -------------------------------------


def test_doulion_exact_at_p1(spark):
    # p=1 keeps every edge: the estimate IS the exact count
    from fs2_kinesis_firehose_spark.operators.graph import triangle_count_estimate

    edges = [(a, b) for a in range(6) for b in range(6) if a < b]  # K6: C(6,3)=20
    df = spark.createDataFrame(edges, "src long, dst long")
    row = triangle_count_estimate(df, 1.0).collect()[0]
    assert row["n_edges"] == 15 and row["n_edges_sampled"] == 15
    assert row["tri_sampled"] == 20 and row["est_triangles"] == 20.0


def test_doulion_relative_error_bounded(spark):
    # dense-ish random graph: the p=0.5 estimate must land near the exact
    # count (DOULION is unbiased; on ~1.5k triangles ±30% is a loose bound)
    import itertools

    import numpy as np

    rng = np.random.default_rng(7)
    n = 40
    edges = [
        (int(a), int(b))
        for a in range(n)
        for b in range(n)
        if a < b and rng.random() < 0.3
    ]
    eset = set(edges)
    exact = sum(
        1
        for a, b, c in itertools.combinations(range(n), 3)
        if (a, b) in eset and (b, c) in eset and (a, c) in eset
    )
    from fs2_kinesis_firehose_spark.operators.graph import triangle_count_estimate

    df = spark.createDataFrame(edges, "src long, dst long")
    row = triangle_count_estimate(df, 0.5).collect()[0]
    assert exact > 100  # the bound below is meaningless on a tiny count
    assert abs(row["est_triangles"] - exact) / exact < 0.3
    # deterministic coin: identical rerun, partitioning-invariant
    row2 = triangle_count_estimate(df.repartition(13), 0.5).collect()[0]
    assert row == row2


def test_doulion_validation(spark):
    from fs2_kinesis_firehose_spark.operators.graph import triangle_count_estimate

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        triangle_count_estimate(df, 0.0)
    with pytest.raises(ValueError):
        triangle_count_estimate(df, 1.5)


# --- label_propagation -----------------------------------------------------


def _lpa_ref(edges, iterations):
    """Python mirror: synchronous, neighbors-only, argmax count with min-label
    tie-break."""
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {v: v for v in adj}
    for _ in range(iterations):
        new = {}
        for v, nbrs in adj.items():
            counts: dict[int, int] = {}
            for u in nbrs:
                counts[labels[u]] = counts.get(labels[u], 0) + 1
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        labels = new
    return labels


def _lpa(spark, edges, iterations=3):
    from fs2_kinesis_firehose_spark.operators.graph import label_propagation

    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["label"]
        for r in label_propagation(df, iterations=iterations).collect()
    }


def test_lpa_two_cliques_with_bridge(spark):
    # cliques {1,2,3} and {10,11,12} bridged by (3,10): labels settle inside
    # each clique; the engine must match the synchronous reference exactly.
    edges = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (3, 10)]
    for it in (1, 2, 3, 5):
        assert _lpa(spark, edges, it) == _lpa_ref(edges, it)


def test_lpa_matches_reference_random(spark):
    import numpy as np

    rng = np.random.default_rng(41)
    edges = [(int(a), int(b)) for a in range(40) for b in range(40)
             if a < b and rng.random() < 0.12]
    for it in (1, 3):
        assert _lpa(spark, edges, it) == _lpa_ref(edges, it)


def test_lpa_direction_and_dup_invariant(spark):
    base = [(1, 2), (2, 3), (1, 3), (3, 4)]
    noisy = base + [(2, 1), (3, 1), (4, 3), (1, 1)]
    assert _lpa(spark, noisy, 2) == _lpa(spark, base, 2)


def test_lpa_validation(spark):
    import pytest as _pytest

    from fs2_kinesis_firehose_spark.operators.graph import label_propagation

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with _pytest.raises(ValueError):
        label_propagation(df, iterations=0)


# --- k_core -----------------------------------------------------------------


def _kcore_ref(edges, k):
    """Python reference: iterative peeling to fixpoint."""
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for v in [v for v, nb in adj.items() if len(nb) < k]:
            for u in adj[v]:
                adj[u].discard(v)
            del adj[v]
            changed = True
    return {v: len(nb) for v, nb in adj.items()}


def _kcore(spark, edges, k, **kw):
    from fs2_kinesis_firehose_spark.operators.graph import k_core

    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["core_deg"] for r in k_core(df, k, **kw).collect()}


def test_kcore_clique_with_pendant_tail(spark):
    # K5 (degrees 4) + a pendant path hanging off node 0: 3-core = the K5
    k5 = [(a, b) for a in range(5) for b in range(5) if a < b]
    tail = [(0, 10), (10, 11), (11, 12)]
    got = _kcore(spark, k5 + tail, 3)
    assert got == {0: 4, 1: 4, 2: 4, 3: 4, 4: 4}


def test_kcore_cascading_peel(spark):
    # peeling must CASCADE: removing degree-1 ends re-exposes new ones
    path = [(i, i + 1) for i in range(8)]
    assert _kcore(spark, path, 2) == {}  # a path has no 2-core
    cycle = path + [(8, 0)]
    assert _kcore(spark, cycle, 2) == {i: 2 for i in range(9)}


def test_kcore_matches_reference_random(spark):
    import numpy as np

    rng = np.random.default_rng(31)
    n = 40
    edges = [
        (int(a), int(b))
        for a in range(n)
        for b in range(n)
        if a < b and rng.random() < 0.15
    ]
    for k in (2, 3, 4):
        assert _kcore(spark, edges, k) == _kcore_ref(edges, k)
    # direction/duplicate invariance
    doubled = edges + [(b, a) for a, b in edges]
    assert _kcore(spark, doubled, 3) == _kcore_ref(edges, 3)


def test_kcore_validation_and_nonconvergence(spark):
    from fs2_kinesis_firehose_spark.operators.graph import k_core

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        k_core(df, 0)
    # a long path peels two ends per round: max_rounds=1 cannot converge
    path = [(i, i + 1) for i in range(12)]
    pdf = spark.createDataFrame(path, "src long, dst long")
    with pytest.raises(RuntimeError, match="max_rounds"):
        k_core(pdf, 2, max_rounds=1)


# --- personalized pagerank --------------------------------------------------


def _reference_ppr(edges, seeds, iterations, damping=0.85):
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    S = [v for v in nodes if v in set(seeds)]
    ns = len(S)
    out: dict[int, int] = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    rank = {v: (1.0 / ns if v in set(S) else 0.0) for v in nodes}
    for _ in range(iterations):
        dmass = sum(r for v, r in rank.items() if v not in out)
        inflow = {v: 0.0 for v in nodes}
        for s, d in edges:
            inflow[d] += rank[s] / out[s]
        rank = {
            v: ((1.0 - damping) / ns if v in set(S) else 0.0)
            + damping * (inflow[v] + (dmass / ns if v in set(S) else 0.0))
            for v in nodes
        }
    return rank


def test_ppr_matches_reference_and_sums_to_one(spark):
    pairs = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (3, 5)]
    seeds = spark.createDataFrame([(1,), (4,)], "node long")
    got = _ranks(pagerank(
        spark.createDataFrame(pairs, "src long, dst long"),
        iterations=4, seeds=seeds,
    ))
    want = _reference_ppr(pairs, [1, 4], iterations=4)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # proximity property: the seed neighborhood outranks the far tail
    assert got[1] > got[5]


def test_ppr_seeds_outside_graph_ignored_and_all_outside_raises(spark):
    pairs = [(1, 2), (2, 1)]
    df = spark.createDataFrame(pairs, "src long, dst long")
    with_extra = spark.createDataFrame([(1,), (99,)], "node long")
    only_in = spark.createDataFrame([(1,)], "node long")
    a = _ranks(pagerank(df, iterations=3, seeds=with_extra))
    b = _ranks(pagerank(df, iterations=3, seeds=only_in))
    assert a == b  # off-graph seeds contribute nothing
    with pytest.raises(ValueError, match="no seed"):
        pagerank(df, iterations=3,
                 seeds=spark.createDataFrame([(99,)], "node long"))


def test_ppr_none_seeds_is_classic_pagerank(spark):
    pairs = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3)]
    df = spark.createDataFrame(pairs, "src long, dst long")
    classic = _ranks(pagerank(df, iterations=3))
    want = _reference_pagerank(pairs, iterations=3)
    for v in want:
        assert classic[v] == pytest.approx(want[v], abs=1e-12)


# --- HITS ----------------------------------------------------------------------


def test_hits_one_iteration_hand_computed(spark):
    """edges 1->3, 2->3, 2->4; after ONE iteration: a_raw(3)=2, a_raw(4)=1
    -> max-norm a = {3:1.0, 4:0.5, sources 0}; h_raw(1)=a(3)=1,
    h_raw(2)=a(3)+a(4)=1.5 -> h = {1: 2/3, 2: 1.0, sinks 0}."""
    from fs2_kinesis_firehose_spark.operators.graph import hits

    edges = spark.createDataFrame([(1, 3), (2, 3), (2, 4)], "src long, dst long")
    got = {r.node: (r.hub, r.authority) for r in hits(edges, iterations=1).collect()}
    assert got[3] == (0.0, 1.0)
    assert got[4] == (0.0, 0.5)
    assert got[2] == (1.0, 0.0)
    assert got[1] == (round(1 / 1.5, 9), 0.0)


def test_hits_bipartite_symmetry_and_bounds(spark):
    """Complete bipartite K_{2,3}: both hubs tie at 1.0, all three
    authorities tie at 1.0 (max-normalized); scores always in [0, 1];
    iteration count fixed -> deterministic under re-run."""
    from fs2_kinesis_firehose_spark.operators.graph import hits

    edges = spark.createDataFrame(
        [(h, a) for h in (1, 2) for a in (10, 20, 30)], "src long, dst long"
    )
    rows = hits(edges, iterations=3).collect()
    got = {r.node: (r.hub, r.authority) for r in rows}
    assert got[1] == got[2] == (1.0, 0.0)
    assert got[10] == got[20] == got[30] == (0.0, 1.0)
    assert all(0.0 <= r.hub <= 1.0 and 0.0 <= r.authority <= 1.0 for r in rows)
    again = {r.node: (r.hub, r.authority) for r in hits(edges, iterations=3).collect()}
    assert got == again


def test_hits_validates_iterations(spark):
    import pytest as _pt

    from fs2_kinesis_firehose_spark.operators.graph import hits

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with _pt.raises(ValueError):
        hits(edges, iterations=0)


# ---------------------------------------------------------------------------
def test_pagerank_superstep_reuses_edge_exchange(spark):
    """The r11 verdict's shared graph ask: the static edge list (and vertex
    table) is hash-partitioned ONCE (_pinned_by_key) so each iteration's
    join reuses the exchange.  Two regimes since the r15 pin sizing:

    - At-scale shape (pin width == session conf, forced here via the
      override): with broadcast disabled, a one-iteration pagerank plan
      contains exactly ONE hash exchange — the irreducible
      message-delivery aggregate on dst; the superstep join's edge side
      is a bare pinned scan (no Exchange, no Sort).
    - Sized default (tiny graph -> pin width 1 < conf): the rank-vector
      side re-aligns to the pin with ONE extra |V|-row exchange on node —
      the deliberate small-scale trade (measured net win, PLANS.md r15) —
      but the EDGE side still never reshuffles (no src exchange)."""
    import re

    from pyspark.sql import functions as F

    from fs2_kinesis_firehose_spark.operators.graph import pagerank

    def plan_exchanges(pin_override: str | None) -> list[str]:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        if pin_override is not None:
            spark.conf.set("spark.fs2kf.graph.pinPartitions", pin_override)
        try:
            e = spark.range(500).select(
                (F.col("id") % 53).alias("src"), ((F.col("id") * 7) % 61).alias("dst")
            )
            # checkpoint_every=2 keeps the single iteration's lineage visible
            pr = pagerank(e, iterations=1, checkpoint_every=2)
            plan = pr._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
            if pin_override is not None:
                spark.conf.unset("spark.fs2kf.graph.pinPartitions")
        return re.findall(r"Exchange hashpartitioning\(([a-zA-Z_]+)", plan)

    at_scale = plan_exchanges(spark.conf.get("spark.sql.shuffle.partitions"))
    assert at_scale == ["dst"], (
        "expected exactly the groupBy(dst) message-delivery exchange, got "
        f"{at_scale}"
    )
    sized = plan_exchanges(None)
    assert "src" not in sized, f"edge side reshuffled: {sized}"
    assert [x for x in sized if x != "node"] == ["dst"], sized


def test_pinned_by_key_preserves_partitioning_and_order(spark):
    """_pinned_by_key's contract: the lazy checkpoint must carry the hash
    partitioning AND the within-partition sort through to consumers (under
    AQE a plain repartition+localCheckpoint silently loses both)."""
    import re

    from pyspark.sql import functions as F

    from fs2_kinesis_firehose_spark.operators.graph import _pinned_by_key

    e = spark.range(300).select(
        (F.col("id") % 13).alias("src"), (F.col("id") % 7).alias("dst")
    )
    pinned = _pinned_by_key(e, "src")
    agg = pinned.groupBy("src").count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    # values unchanged by the pin
    want = sorted((r.src, r["count"]) for r in e.groupBy("src").count().collect())
    got = sorted((r.src, r["count"]) for r in agg.collect())
    assert got == want


def test_wedge_partition_floor_gating(spark, monkeypatch):
    """The wedge-exchange partition floor (r14): inactive on small graphs
    (no explicit repartition — the closing join shuffles at the session
    default), active when the computed wedge bytes exceed the session
    partition count × target (REPARTITION_BY_NUM on the closing-join keys
    at the computed N), and correctness-invariant either way."""
    import fs2_kinesis_firehose_spark.operators.graph as G

    edges = [(a, b) for a in range(6) for b in range(6) if a < b]  # K6
    df = spark.createDataFrame(edges, "src long, dst long")
    want = {n: 10 for n in range(6)}  # C(5,2) triangles per node in K6

    def plan_of():
        tri = G.triangle_counts(df)
        return (
            tri._jdf.queryExecution().executedPlan().toString(),
            {r["node"]: r["tri_cnt"] for r in tri.collect()},
        )

    plan, got = plan_of()
    assert "REPARTITION_BY_NUM" not in plan  # floor inactive on 15 edges
    assert got == want
    # force the floor: K6 has 20 wedges; 20*40B / 1B target -> 801 parts
    monkeypatch.setattr(G, "_WEDGE_TARGET_BYTES", 1)
    plan, got = plan_of()
    assert "REPARTITION_BY_NUM" in plan
    assert got == want  # partitioning never changes the counts


def test_hits_copurchase_long_encoding_matches_string_keys(spark, sf_smoke):
    """``hits_copurchase_scores`` runs the fixed-point on parity-encoded
    LONG node ids (customer k -> 2k, part k -> 2k+1) and decodes back to
    the ``c:<k>`` / ``p:<k>`` strings only on the final result.  The
    encoding is a bijection onto disjoint key spaces, so the output must
    be row-for-row identical to running hits() on the prefixed-string
    edges directly — same groups, same sums, same rounding."""
    from pyspark.sql import functions as F

    from fs2_kinesis_firehose_spark.operators.graph import hits
    from fs2_kinesis_firehose_spark.queries.graph_q import (
        _HITS_ITER,
        hits_copurchase_scores,
    )
    from fs2_kinesis_firehose_spark.tables import load_table

    got = sorted(map(tuple, hits_copurchase_scores(spark, sf_smoke).collect()))

    o = load_table(spark, sf_smoke, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_smoke, "lineitem").select("l_orderkey", "l_partkey")
    string_edges = o.join(l, F.col("o_orderkey") == F.col("l_orderkey")).select(
        F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("p:"), F.col("l_partkey").cast("string")).alias("dst"),
    )
    want = sorted(
        map(
            tuple,
            hits(string_edges, iterations=_HITS_ITER)
            .select(
                "node",
                F.round("hub", 6).alias("hub"),
                F.round("authority", 6).alias("authority"),
            )
            .collect(),
        )
    )
    assert got == want


def test_pin_partition_sizing_derivation_and_override(spark, monkeypatch):
    """_sized_pin_partitions: sqrt-of-rows derivation with the session
    shuffle-partition conf as the UPPER bound (at-scale behavior is the
    conf, exactly pre-r15), floor 1 on tiny frames, and the explicit
    production override conf wins over the derivation."""
    import fs2_kinesis_firehose_spark.operators.graph as G

    cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
    tiny = spark.range(10).selectExpr("id as src", "id + 1 as dst")
    assert G._sized_pin_partitions(tiny) == 1  # 10 rows << quantum

    # quantum of 1 row: derivation exceeds the conf -> clamped to it
    monkeypatch.setattr(G, "_PIN_SQRT_ROWS", 1)
    big = spark.range(cap * cap * 4).selectExpr("id as src")
    assert G._sized_pin_partitions(big) == cap

    spark.conf.set("spark.fs2kf.graph.pinPartitions", "3")
    try:
        assert G._sized_pin_partitions(tiny) == 3
    finally:
        spark.conf.unset("spark.fs2kf.graph.pinPartitions")


def test_pin_width_never_changes_graph_results(spark):
    """Superstep results are partitioning-invariant (the operators round /
    integer-quantize every cross-partition sum), so pinning at width 1 vs
    the session conf must give row-identical pagerank AND hits output."""
    from fs2_kinesis_firehose_spark.operators.graph import hits, pagerank

    edges = spark.createDataFrame(
        [(i % 23, (i * 7 + 1) % 23) for i in range(300)], "src long, dst long"
    )
    outs = {}
    for width in ("1", None):
        if width is None:
            spark.conf.unset("spark.fs2kf.graph.pinPartitions")
        else:
            spark.conf.set("spark.fs2kf.graph.pinPartitions", width)
        try:
            pr = sorted(map(tuple, pagerank(edges, iterations=3).collect()))
            ht = sorted(map(tuple, hits(edges, iterations=2).collect()))
            outs[width] = (pr, ht)
        finally:
            spark.conf.unset("spark.fs2kf.graph.pinPartitions")
    assert outs["1"] == outs[None]
