"""Connected-components correctness: the large-star/small-star iteration
must reproduce exact union-find semantics on adversarial topologies —
deep chains (diameter >> rounds), hubs, cliques, random graphs, messy
inputs (duplicates, reversed edges, self-loops)."""

from __future__ import annotations

import random

import pytest

from ocr_spark.operators.graph import connected_components, neardup_clusters


def _union_find(edges):
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


def _spark_cc(spark, edges):
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges] or [(0, 0)], "a bigint, b bigint"
    )
    if not edges:
        df = df.where("a <> a")
    return {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }


TOPOLOGIES = {
    # deep chain: diameter 60 — naive O(diameter) propagation would need
    # 60 rounds; star contraction must finish well inside max_iter=50
    "chain": [(i, i + 1) for i in range(60)],
    "star_hub_is_max": [(100, i) for i in range(100)],
    "two_cliques_bridge": (
        [(a, b) for a in range(5) for b in range(a + 1, 5)]
        + [(a, b) for a in range(10, 15) for b in range(a + 1, 15)]
        + [(4, 10)]
    ),
    "disjoint_pairs": [(i, i + 1000) for i in range(0, 40, 2)],
    "messy_input": [(3, 3), (1, 2), (2, 1), (2, 3), (3, 2), (7, 7)],
}


@pytest.mark.parametrize("name", sorted(TOPOLOGIES))
def test_cc_matches_union_find(spark, name):
    edges = TOPOLOGIES[name]
    expected = _union_find([(a, b) for a, b in edges if a != b])
    got = _spark_cc(spark, edges)
    assert got == expected, name


def test_cc_random_graphs_match_union_find(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = 120
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(40, 140))
        ]
        edges = [(a, b) for a, b in edges if a != b]
        assert _spark_cc(spark, edges) == _union_find(edges), trial


def test_neardup_clusters_shape(spark):
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "a bigint, b bigint"
    )
    rows = {r["doc_id"]: r for r in neardup_clusters(df).collect()}
    assert rows[1]["component"] == 1 and rows[1]["cluster_size"] == 3
    assert rows[3]["component"] == 1
    assert rows[11]["component"] == 10 and rows[11]["cluster_size"] == 2
    assert len(rows) == 5


def test_canonical_select_keeps_best_scored(spark):
    from ocr_spark.operators.graph import canonical_select

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "a bigint, b bigint"
    )
    # doc 2 best in cluster {1,2,3}; tie in {10,11} → min doc_id wins
    scores = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 9 - 2), (10, 4), (11, 4)],
        "doc_id bigint, score bigint",
    )
    got = {
        r["component"]: (r["keep_doc_id"], r["cluster_size"], r["best_score"])
        for r in canonical_select(neardup_clusters(pairs), scores).collect()
    }
    assert got == {1: (2, 3, 9), 10: (10, 2, 4)}


def _pagerank_model(edges, n_iter=10, damp=85, scale=10**9):
    """Driver-side integer PageRank model mirroring graph.py pagerank
    exactly (floor div everywhere, uniform dangling redistribution)."""
    edges = sorted({(s, d) for s, d in edges if s != d})
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    outd = {}
    for s, _ in edges:
        outd[s] = outd.get(s, 0) + 1
    rank = {v: scale // n for v in nodes}
    base = (scale * (100 - damp)) // (100 * n)
    for _ in range(n_iter):
        dang = sum(r for v, r in rank.items() if v not in outd)
        flat = base + (dang * damp) // (100 * n)
        inc = {v: 0 for v in nodes}
        for s, d in edges:
            inc[d] += (rank[s] * damp) // (100 * outd[s])
        rank = {v: flat + inc[v] for v in nodes}
    return rank


@pytest.mark.parametrize(
    "edges",
    [
        # cycle + dangling sink: A<->B, C->A, A->D (D dangles)
        [(1, 2), (2, 1), (3, 1), (1, 4)],
        # star hub: everyone links to 0, 0 links nowhere (dangling hub)
        [(1, 0), (2, 0), (3, 0), (4, 0)],
        # chain with a self-loop and a duplicate edge (both must cancel)
        [(1, 2), (2, 3), (3, 3), (1, 2), (3, 1)],
    ],
)
def test_pagerank_matches_integer_model(spark, edges):
    from ocr_spark.operators.graph import pagerank

    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r["node"]: r["rank"] for r in pagerank(df).collect()}
    assert got == _pagerank_model(edges)


def test_pagerank_hub_outranks_and_mass_bounded(spark):
    """Semantics sanity: the all-inlinks hub gets the top rank, and total
    mass stays within floor-loss of the scale (never grows)."""
    from ocr_spark.operators.graph import pagerank

    edges = [(k, 0) for k in range(1, 8)] + [(0, 1)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    rows = {r["node"]: r["rank"] for r in pagerank(df).collect()}
    # the 0<->1 cycle still oscillates at iteration 10, so assert the
    # phase-independent property: both cycle members dwarf every leaf
    leaves = [rows[k] for k in range(2, 8)]
    assert min(rows[0], rows[1]) > 3 * max(leaves)
    assert sum(rows.values()) <= 10**9
    # floor losses are <= 1 micro-unit per edge+node per iteration
    assert sum(rows.values()) >= 10**9 - 10 * (len(edges) + len(rows) + 2)


def test_pagerank_empty_edges(spark):
    from ocr_spark.operators.graph import pagerank

    df = spark.createDataFrame([], "src bigint, dst bigint")
    assert pagerank(df).count() == 0


def _trustrank_model(edges, seeds, n_iter=10, damp=85, scale=10**9):
    """Driver-side integer TrustRank model mirroring graph.py trustrank
    exactly: teleport + initial mass + dangling re-entry on SEEDS only."""
    edges = sorted({(s, d) for s, d in edges if s != d})
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    seeds = sorted(set(seeds) & set(nodes))
    s = len(seeds)
    if s == 0:
        return {v: 0 for v in nodes}
    outd = {}
    for a, _ in edges:
        outd[a] = outd.get(a, 0) + 1
    rank = {v: (scale // s if v in seeds else 0) for v in nodes}
    base = (scale * (100 - damp)) // (100 * s)
    for _ in range(n_iter):
        dang = sum(r for v, r in rank.items() if v not in outd)
        flat = base + (dang * damp) // (100 * s)
        inc = {v: 0 for v in nodes}
        for a, d in edges:
            inc[d] += (rank[a] * damp) // (100 * outd[a])
        rank = {v: (flat if v in seeds else 0) + inc[v] for v in nodes}
    return rank


@pytest.mark.parametrize(
    "edges,seeds",
    [
        # trusted hub feeds a chain; spam clique off to the side
        ([(1, 2), (2, 3), (3, 1), (8, 9), (9, 8)], [1]),
        # seed is dangling: its mass must re-enter through the seed set
        ([(1, 2), (2, 3)], [3]),
        # seed not in the graph must be ignored; 5 is, 99 is not
        ([(5, 6), (6, 5), (6, 7)], [5, 99]),
    ],
)
def test_trustrank_matches_integer_model(spark, edges, seeds):
    from ocr_spark.operators.graph import trustrank

    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    sd = spark.createDataFrame([(x,) for x in seeds], "node bigint")
    got = {r["node"]: r["rank"] for r in trustrank(e, sd).collect()}
    assert got == _trustrank_model(edges, seeds)


def test_trustrank_demotes_unreachable_spam_farm(spark):
    """The defining property vs pagerank: a densely self-linking clique
    with no in-links from the seed side scores exactly zero trust, while
    vanilla pagerank gives it substantial mass."""
    from ocr_spark.operators.graph import pagerank, trustrank

    trusted = [(1, 2), (2, 3), (3, 1)]
    farm = [(a, b) for a in (10, 11, 12) for b in (10, 11, 12) if a != b]
    e = spark.createDataFrame(trusted + farm, "src bigint, dst bigint")
    sd = spark.createDataFrame([(1,)], "node bigint")
    tr = {r["node"]: r["rank"] for r in trustrank(e, sd).collect()}
    pr = {r["node"]: r["rank"] for r in pagerank(e).collect()}
    assert tr[10] == tr[11] == tr[12] == 0
    assert pr[10] > 10**8  # pagerank rewards the farm regardless
    assert tr[1] > 0 and tr[2] > 0 and tr[3] > 0
    assert sum(tr.values()) <= 10**9


def _hits_model(edges, n_iter=8, scale=10**9):
    """Driver-side integer HITS model mirroring graph.py hits exactly:
    alternating in-/out-sum half-steps, each L1-normalized back to scale
    with a floor division (missing nodes coalesce to 0)."""
    edges = sorted({(s, d) for s, d in edges if s != d})
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    if not nodes:
        return {}, {}
    hub = {v: scale // len(nodes) for v in nodes}
    auth = {v: 0 for v in nodes}

    def norm(raw):
        total = sum(raw.values())
        if total == 0:
            return {v: 0 for v in nodes}
        return {v: (raw.get(v, 0) * scale) // total for v in nodes}

    for _ in range(n_iter):
        raw = {}
        for s, d in edges:
            raw[d] = raw.get(d, 0) + hub[s]
        auth = norm(raw)
        raw = {}
        for s, d in edges:
            raw[s] = raw.get(s, 0) + auth[d]
        hub = norm(raw)
    return hub, auth


@pytest.mark.parametrize(
    "edges",
    [
        # bipartite hubs->authorities core plus a stray cycle
        [(1, 10), (1, 11), (2, 10), (2, 11), (3, 11), (20, 21), (21, 20)],
        # chain with duplicate + self-loop noise (both must cancel)
        [(1, 2), (2, 3), (3, 3), (1, 2), (3, 4)],
        # star: one authority, many pure hubs
        [(k, 0) for k in range(1, 6)],
    ],
)
def test_hits_matches_integer_model(spark, edges):
    from ocr_spark.operators.graph import hits

    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    rows = hits(df).collect()
    got_h = {r["node"]: r["hub"] for r in rows}
    got_a = {r["node"]: r["auth"] for r in rows}
    exp_h, exp_a = _hits_model(edges)
    assert got_h == exp_h and got_a == exp_a


def test_hits_hub_authority_split(spark):
    """Semantics: pure hubs (out-edges only) hold zero authority, the
    pure authority (in-edges only) holds zero hub, and L1 mass is
    bounded by scale on both sides."""
    from ocr_spark.operators.graph import hits

    edges = [(k, 0) for k in range(1, 6)] + [(1, 7)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    rows = {r["node"]: r for r in hits(df).collect()}
    assert rows[0]["hub"] == 0 and rows[0]["auth"] > 8 * 10**8
    assert all(rows[k]["auth"] == 0 for k in range(2, 6))
    assert rows[1]["hub"] > rows[2]["hub"]  # 1 points at both sinks
    assert sum(r["hub"] for r in rows.values()) <= 10**9
    assert sum(r["auth"] for r in rows.values()) <= 10**9


def test_hits_empty_edges(spark):
    from ocr_spark.operators.graph import hits

    df = spark.createDataFrame([], "src bigint, dst bigint")
    assert hits(df).count() == 0


def test_trustrank_no_seeds_in_graph_is_all_zero(spark):
    from ocr_spark.operators.graph import trustrank

    e = spark.createDataFrame([(1, 2), (2, 1)], "src bigint, dst bigint")
    sd = spark.createDataFrame([(42,)], "node bigint")
    got = {r["node"]: r["rank"] for r in trustrank(e, sd).collect()}
    assert got == {1: 0, 2: 0}


def test_spam_mass_separates_farm_from_trusted(spark):
    """spam_mass = PR share − TR share (micro-units): the unreachable
    self-linking farm carries ALL of its pagerank as spam mass
    (rel_mass = 1.0, since its trust is exactly zero), the trusted
    triangle's mass is negative or near zero, and the micro shares are
    internally consistent."""
    from ocr_spark.operators.graph import pagerank, spam_mass, trustrank

    trusted = [(1, 2), (2, 3), (3, 1)]
    farm = [(a, b) for a in (10, 11, 12) for b in (10, 11, 12) if a != b]
    e = spark.createDataFrame(trusted + farm, "src bigint, dst bigint")
    sd = spark.createDataFrame([(1,)], "node bigint")
    rows = {
        r["node"]: r
        for r in spam_mass(pagerank(e), trustrank(e, sd)).collect()
    }
    assert set(rows) == {1, 2, 3, 10, 11, 12}
    for n in (10, 11, 12):
        assert rows[n]["tr_micro"] == 0
        assert rows[n]["mass_micro"] == rows[n]["pr_micro"] > 0
        assert rows[n]["rel_mass"] == 1.0
    for n in (1, 2, 3):
        # trusted nodes hold a larger share of trust than of raw rank
        assert rows[n]["mass_micro"] < 0 and rows[n]["rel_mass"] < 0
    for r in rows.values():
        assert r["mass_micro"] == r["pr_micro"] - r["tr_micro"]
    # shares are L1-normalized: each vector sums to ~1e6 (floor slack)
    assert 1_000_000 - 6 <= sum(r["pr_micro"] for r in rows.values()) <= 1_000_000
    assert 1_000_000 - 6 <= sum(r["tr_micro"] for r in rows.values()) <= 1_000_000


def _lpa_model(edges, n_iter=5):
    """Driver-side synchronous LPA mirroring graph.py label_propagation:
    per round every node takes the (count desc, label asc) argmax of its
    PREVIOUS-round neighbor labels; no neighbors → own id."""
    from collections import Counter

    und = {}
    for s, d in edges:
        if s != d:
            und.setdefault(s, []).append(d)
            und.setdefault(d, []).append(s)
    for n in und:
        und[n] = sorted(set(und[n]))
    nodes = sorted({x for e in edges for x in e})
    lab = {n: n for n in nodes}
    for _ in range(n_iter):
        new = {}
        for n in nodes:
            nb = [lab[v] for v in und.get(n, [])]
            if not nb:
                new[n] = n
            else:
                cnt = Counter(nb)
                new[n] = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        lab = new
    return lab


@pytest.mark.parametrize(
    "edges",
    [
        # two cliques + one bridge — communities must NOT merge
        [(a, b) for a in (1, 2, 3) for b in (1, 2, 3) if a < b]
        + [(a, b) for a in (10, 11, 12) for b in (10, 11, 12) if a < b]
        + [(3, 10)],
        # chain
        [(1, 2), (2, 3), (3, 4), (4, 5)],
        # star
        [(1, k) for k in range(2, 8)],
        # messy: duplicates, self-loops, both directions
        [(1, 1), (1, 2), (2, 1), (2, 3), (2, 3), (5, 5)],
    ],
)
def test_label_propagation_matches_sync_model(spark, edges):
    from ocr_spark.operators.graph import label_propagation

    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {
        r["node"]: r["community"]
        for r in label_propagation(e, n_iter=5).collect()
    }
    assert got == _lpa_model(edges, n_iter=5)


def test_label_propagation_splits_bridged_cliques(spark):
    from ocr_spark.operators.graph import label_propagation

    edges = (
        [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
        + [(a, b) for a in (10, 11, 12, 13) for b in (10, 11, 12, 13) if a < b]
        + [(4, 10)]
    )
    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    rows = {r["node"]: r for r in label_propagation(e).collect()}
    c_lo = {rows[n]["community"] for n in (1, 2, 3, 4)}
    c_hi = {rows[n]["community"] for n in (10, 11, 12, 13)}
    assert len(c_lo) == 1 and len(c_hi) == 1 and c_lo != c_hi
    assert rows[1]["community_size"] == 4 and rows[10]["community_size"] == 4


def test_link_features_exact_small_graph(spark):
    from ocr_spark.operators.graph import link_features

    edges = [
        (1, 2), (2, 1),          # reciprocal pair
        (1, 3),                  # one-way
        (3, 3),                  # self loop (excluded from degrees)
        (4, 1), (1, 2),          # duplicate edge collapses
    ]
    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r["node"]: r.asDict() for r in link_features(e).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert (got[1]["out_deg"], got[1]["in_deg"], got[1]["n_recip"]) == (2, 2, 1)
    assert got[1]["recip_micro"] == 500000
    assert (got[2]["out_deg"], got[2]["n_recip"], got[2]["recip_micro"]) == (1, 1, 1000000)
    assert got[3]["self_loop"] is True and got[3]["out_deg"] == 0
    assert got[3]["recip_micro"] == 0  # dangling after self-loop drop
    assert got[4]["in_deg"] == 0 and got[4]["out_deg"] == 1
    assert not got[1]["self_loop"] and not got[4]["self_loop"]


def test_link_features_farm_reciprocity(spark):
    """A full clique (the farm) hits recip_micro = 1e6 on every node;
    a star's center gets zero reciprocity."""
    from ocr_spark.operators.graph import link_features

    farm = [(a, b) for a in (10, 11, 12) for b in (10, 11, 12) if a != b]
    star = [(1, k) for k in (2, 3, 4)]
    e = spark.createDataFrame(farm + star, "src bigint, dst bigint")
    got = {r["node"]: r.asDict() for r in link_features(e).collect()}
    for n in (10, 11, 12):
        assert got[n]["recip_micro"] == 1000000
    assert got[1]["recip_micro"] == 0 and got[1]["out_deg"] == 3
