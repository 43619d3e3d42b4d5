"""Distributed connected components over an edge list — the canonical
iterative DataFrame algorithm, used to turn near-duplicate PAIRS (dedup.py)
into transitive duplicate CLUSTERS with one representative per cluster.

Algorithm: alternating large-star / small-star contraction (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — converges in
O(log²) rounds on any graph (vs O(diameter) for naive label propagation,
which a 100 TB near-dup chain can make arbitrarily deep).  Every round is
pure relational ops:

* **large-star**: every node attaches its strictly-larger neighbors to the
  minimum of its closed neighborhood — expressed as a groupBy(node).min +
  an equi-join back on the bidirectional adjacency.
* **small-star**: every node attaches its smaller-or-equal neighbors (and
  itself) to the minimum smaller neighbor — a groupBy on the edge's larger
  endpoint + join.

Scale shape: shuffles key on node id only; rows are fixed-width (u, v)
pairs — no adjacency-list rows, so a degenerate hub costs join fan-out
(AQE skew-split handles it), never a single giant row.  Lineage is
truncated every round with localCheckpoint, or the iterative plan's DAG
depth would grow unboundedly.  Convergence detection is one cheap
aggregation per round — an order-invariant edge-set signature
(count, sum and xor of xxhash64(u, v)) — instead of two set-subtract
shuffles over the full edge set; because equal sets always have equal
signatures, "signatures differ → keep iterating" is exact, and the one
round where signatures match is confirmed by the exact subtract check
(collision guard, so the fixpoint claim stays exact, paid once).

The reference has no graph surface at all; this exists for the
training-data pipeline (SURVEY.md "beyond the reference" scope): exact
union-find semantics verified against a driver-side union-find in pytest
and a DuckDB recursive-CTE oracle at the driver gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(edges: DataFrame) -> DataFrame:
    """Undirected edge list → canonical distinct (u < v) form."""
    return (
        edges.where(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """(v, m(u)) for every neighbor v > u, where m(u) = min(Γ(u) ∪ {u})."""
    bidir = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = (
        bidir.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least("u", "mn").alias("m"))
    )
    return _canon(
        bidir.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Group canonical edges by their LARGER endpoint v: m = min smaller
    neighbor; emit (u, m) for each smaller neighbor plus (v, m)."""
    mins = edges.groupBy("v").agg(F.min("u").alias("m"))
    attach = (
        edges.join(mins, "v")
        .select(F.col("u").alias("a"), F.col("m").alias("b"))
    )
    self_edge = mins.select(F.col("v").alias("a"), F.col("m").alias("b"))
    return _canon(
        attach.union(self_edge).select(
            F.col("a").alias("u"), F.col("b").alias("v")
        )
    )


def _edge_signature(edges: DataFrame) -> tuple:
    """Order-invariant exact-on-inequality signature of an edge set: row
    count plus sum and xor of the 64-bit row hash.  Equal sets ⇒ equal
    signatures, so a differing signature is PROOF the fixpoint is not
    reached — one map-side-combined aggregation per round instead of two
    subtract shuffles.  (Equal signatures are confirmed exactly by the
    caller before declaring convergence.)"""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal(38,0) accumulator: a bigint sum of 64-bit hashes
        # overflows (ANSI mode raises); 38 digits hold 2^63 × ~10^19 rows
        F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("hsum"),
        F.expr("bit_xor(xxhash64(u, v))").alias("hxor"),
    ).first()
    return (row["n"], row["hsum"], row["hxor"])


def connected_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 50,
    stats: dict | None = None,
) -> DataFrame:
    """Edge list → ``(node, component)`` with component = min node id of
    the connected component.  Every input node appears exactly once
    (roots map to themselves).  Pass ``stats={}`` to get back
    ``{"rounds": N}`` — the convergence-round observability used by the
    scale probes (the O(log²) bound is a measured claim, not a hope)."""
    edges = _canon(
        pairs.select(
            F.col(a_col).cast("bigint").alias("u"),
            F.col(b_col).cast("bigint").alias("v"),
        )
    ).localCheckpoint()
    sig = _edge_signature(edges)
    for rounds in range(1, max_iter + 1):
        new = _small_star(_large_star(edges)).localCheckpoint()
        new_sig = _edge_signature(new)
        converged = new_sig == sig and (
            new.subtract(edges).limit(1).count()
            + edges.subtract(new).limit(1).count()
            == 0
        )
        edges, sig = new, new_sig
        if converged:
            if stats is not None:
                stats["rounds"] = rounds
            break
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
    # converged edge set is a union of stars rooted at each component min
    members = edges.select(
        F.col("v").alias("node"), F.col("u").alias("component")
    )
    roots = edges.select(
        F.col("u").alias("node"), F.col("u").alias("component")
    ).distinct()
    return members.union(roots).distinct()


def canonical_select(
    clusters: DataFrame,
    scores: DataFrame,
    score_col: str = "score",
) -> DataFrame:
    """The dedup KEEP policy: within each near-dup cluster keep the
    highest-scoring document (quality-aware canonicalization — pipelines
    keep the best copy, not an arbitrary one), doc_id ascending as the
    deterministic tie-break.

    ``clusters`` is neardup_clusters output (``doc_id, component,
    cluster_size``); ``scores`` maps ``doc_id`` to a comparable
    ``score_col`` (any exact-ordered column — char count, quality rank).
    One shuffle on ``component`` (the same key the cluster table was just
    aggregated on) + a bounded per-cluster window.

    Output: ``component, keep_doc_id, cluster_size, best_score``.
    """
    from pyspark.sql.window import Window

    j = clusters.join(scores, "doc_id")
    w = Window.partitionBy("component").orderBy(
        F.col(score_col).desc(), F.col("doc_id").asc()
    )
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            "component",
            F.col("doc_id").alias("keep_doc_id"),
            "cluster_size",
            F.col(score_col).alias("best_score"),
        )
    )


def neardup_clusters(pairs: DataFrame) -> DataFrame:
    """Near-dup pairs (a, b, …) → per-doc cluster assignment with the
    cluster representative (= min doc_id, the same keep-rule as exact
    dedup) and cluster size.  Output: ``doc_id, component, cluster_size``."""
    comps = connected_components(pairs, "a", "b")
    sizes = comps.groupBy("component").agg(
        F.count("*").alias("cluster_size")
    )
    return (
        comps.join(sizes, "component")
        .select(
            F.col("node").alias("doc_id"),
            F.col("component"),
            F.col("cluster_size"),
        )
    )


def pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    damping_pct: int = 85,
    scale: int = 10**9,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list — the classic
    link-graph quality prior of web curation (domain- or host-level rank
    feeds the same per-domain prior table as ``web.domain_stats``).

    **Integer fixed-point, not floats.**  Ranks live in micro-units of
    ``scale`` (bigint); every step is integer multiply + integer ``div``,
    and integer sums are exact and order-independent — so the result is
    bit-identical across engines, partitionings, and row orders, and the
    DuckDB twin (``domain_pagerank``) hash-matches without any float
    tolerance.  A float formulation could not be oracle-gated: shuffle
    order changes double-sum rounding.  The per-step floor loses ≤1
    micro-unit per edge per iteration — deterministic, mirrored exactly.

    Semantics per iteration (damping d = damping_pct/100):
    ``rank'(v) = (1-d)·scale/n  +  d·dangling_mass/n  +
    Σ_{u→v} d·rank(u)/outdeg(u)`` — dangling mass (nodes with no
    out-edges) is redistributed uniformly, the standard correction.

    Scale shape: the rank table is slim ``(node, rank)`` rows; each
    iteration is one shuffle join on ``src`` + one aggregation on
    ``dst`` (both AQE/skew-split friendly — a hub domain fans out, it
    never builds an adjacency-list row), plus one scalar aggregate for
    the dangling mass.  Lineage is truncated per iteration with
    ``localCheckpoint`` (the ``connected_components`` discipline) or the
    DAG would deepen by two joins per round and the per-round scalar
    action would replay the whole history.
    """
    e = (
        edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return nodes.select(
            "node", F.lit(0).cast("bigint").alias("rank")
        )
    outd = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ranks = nodes.select(
        "node", F.lit(scale // n).cast("bigint").alias("rank")
    )
    base = (scale * (100 - damping_pct)) // (100 * n)
    for _ in range(n_iter):
        dang = int(
            ranks.join(outd, ranks["node"] == outd["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0)).alias("s"))
            .first()["s"]
        )
        flat = base + (dang * damping_pct) // (100 * n)
        inc = (
            e.join(ranks, e["src"] == ranks["node"])
            .join(outd, "src")
            .select(
                "dst",
                F.expr(
                    f"(rank * {damping_pct}) div (100 * outdeg)"
                ).alias("share"),
            )
            .groupBy("dst")
            .agg(F.sum("share").alias("inc"))
        )
        ranks = (
            nodes.join(inc, nodes["node"] == inc["dst"], "left")
            .select(
                "node",
                (F.lit(flat) + F.coalesce(F.col("inc"), F.lit(0)))
                .cast("bigint")
                .alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks


def trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    n_iter: int = 10,
    damping_pct: int = 85,
    scale: int = 10**9,
) -> DataFrame:
    """TrustRank (Gyöngyi et al., VLDB 2004) — PageRank with the teleport
    restricted to a hand-vetted SEED set of trusted nodes: trust flows out
    from the seeds along links and decays with distance, so link-farm
    neighborhoods that inflate vanilla PageRank (they cannot buy inlinks
    from trusted sites) score near zero.  The standard spam-demotion
    companion to ``pagerank`` in web curation: rank/trust ratio or the
    trust score directly feeds the same per-domain prior table.

    Differences from ``pagerank``, per the paper: the initial mass and the
    ``(1-d)`` teleport land ONLY on seed nodes (uniformly), and dangling
    mass likewise re-enters through the seeds — non-seed nodes receive
    mass exclusively via in-links.  Seeds outside the edge set are ignored
    (they have no links to propagate through); no seeds in the graph →
    all-zero trust.

    Same integer fixed-point contract as ``pagerank`` (micro-units of
    ``scale``, exact order-independent bigint sums, per-step floor
    mirrored by the DuckDB twin) and the same scale shape: slim
    ``(node, rank)`` rows, one join + one agg per iteration, seed
    membership a broadcast-sized dim, ``localCheckpoint`` lineage
    truncation per round.
    """
    e = (
        edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    seed_nodes = (
        nodes.join(
            seeds.select(F.col("node")).distinct(), "node", "left_semi"
        )
        .localCheckpoint()
    )
    s = seed_nodes.count()
    if s == 0:
        return nodes.select("node", F.lit(0).cast("bigint").alias("rank"))
    marked = nodes.join(
        seed_nodes.select("node", F.lit(1).alias("is_seed")), "node", "left"
    ).select("node", F.coalesce("is_seed", F.lit(0)).alias("is_seed"))
    outd = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ranks = marked.select(
        "node",
        F.when(F.col("is_seed") == 1, F.lit(scale // s))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("rank"),
    ).localCheckpoint()
    base = (scale * (100 - damping_pct)) // (100 * s)
    for _ in range(n_iter):
        dang = int(
            ranks.join(outd, ranks["node"] == outd["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0)).alias("s"))
            .first()["s"]
        )
        flat = base + (dang * damping_pct) // (100 * s)
        inc = (
            e.join(ranks, e["src"] == ranks["node"])
            .join(outd, "src")
            .select(
                "dst",
                F.expr(
                    f"(rank * {damping_pct}) div (100 * outdeg)"
                ).alias("share"),
            )
            .groupBy("dst")
            .agg(F.sum("share").alias("inc"))
        )
        ranks = (
            marked.join(inc, marked["node"] == inc["dst"], "left")
            .select(
                "node",
                (
                    F.when(F.col("is_seed") == 1, F.lit(flat)).otherwise(
                        F.lit(0)
                    )
                    + F.coalesce(F.col("inc"), F.lit(0))
                )
                .cast("bigint")
                .alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks


def hits(
    edges: DataFrame,
    n_iter: int = 8,
    scale: int = 10**9,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg, JACM 1999) — the query-time
    companion to the query-independent ``pagerank``/``trustrank`` priors:
    a page is a good AUTHORITY if good hubs point at it, a good HUB if it
    points at good authorities.  Web curation uses the authority score as
    a second link-quality prior (directories and link farms score high on
    hub but low on authority — the ratio is itself a spam feature).

    Same integer fixed-point contract as ``pagerank``: scores live in
    micro-units of ``scale`` (bigint); each half-step is an exact
    order-independent integer sum followed by L1 normalization back to
    ``scale`` — ``score·scale div total`` — where the single multiply is
    widened through decimal(38,0) so a hub-heavy graph cannot overflow
    int64 (raw sums reach nodes×scale before normalization).  Every
    division is a floor over non-negative integers, so Spark's ``div``
    and DuckDB's ``//`` agree and the unrolled-CTE twin hash-matches
    bit-for-bit.  Nodes with no in-edges hold authority 0; nodes with no
    out-edges hold hub 0 (Kleinberg's I/O operations, with the floor as
    the only deviation — ≤1 micro-unit per node per half-step, mirrored
    exactly by the twin).

    Scale shape: slim ``(node, score)`` rows; each half-step is ONE
    shuffle join on the edge key + one aggregation (hub fan-out is join
    fan-out, AQE/skew-split friendly — never an adjacency-list row), plus
    one scalar total per half-step off a ``localCheckpoint``'d raw table
    (so the normalization action does not replay the iteration history —
    the ``pagerank`` lineage discipline).

    Reference has no graph surface; this is training-data-pipeline scope
    (SURVEY.md "beyond the reference"), verified against a driver-side
    numpy power iteration in pytest and the unrolled DuckDB twin at the
    driver gate (``domain_hits``).
    """
    e = (
        edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    empty = nodes.select(
        "node",
        F.lit(0).cast("bigint").alias("hub"),
        F.lit(0).cast("bigint").alias("auth"),
    )
    if n == 0:
        return empty

    def _normalize(raw: DataFrame, col: str) -> DataFrame:
        """raw (node, raw) → (node, col) with Σ = scale (floor-exact)."""
        raw = raw.localCheckpoint()
        total = int(
            raw.agg(F.coalesce(F.sum("raw"), F.lit(0)).alias("s"))
            .first()["s"]
        )
        if total == 0:
            return nodes.select(
                "node", F.lit(0).cast("bigint").alias(col)
            ).localCheckpoint()
        return (
            nodes.join(raw, "node", "left")
            .select(
                "node",
                F.expr(
                    f"cast((cast(coalesce(raw, 0) as decimal(38,0))"
                    f" * {scale}) div {total} as bigint)"
                ).alias(col),
            )
            .localCheckpoint()
        )

    hub = nodes.select(
        "node", F.lit(scale // n).cast("bigint").alias("hub")
    ).localCheckpoint()
    auth = None
    for _ in range(n_iter):
        auth = _normalize(
            e.join(hub, e["src"] == hub["node"])
            .groupBy("dst")
            .agg(F.sum("hub").alias("raw"))
            .select(F.col("dst").alias("node"), "raw"),
            "auth",
        )
        hub = _normalize(
            e.join(auth, e["dst"] == auth["node"])
            .groupBy("src")
            .agg(F.sum("auth").alias("raw"))
            .select(F.col("src").alias("node"), "raw"),
            "hub",
        )
    return hub.join(auth, "node")


def spam_mass(pr: DataFrame, tr: DataFrame, micro: int = 1_000_000) -> DataFrame:
    """Spam mass (Gyöngyi, Berkhin, Garcia-Molina & Pedersen 2006, "Link
    Spam Detection Based on Mass Estimation") — the fraction of a node's
    PageRank NOT accounted for by trusted sources: nodes whose rank comes
    from link farms score high, trusted-neighborhood nodes near (or
    below) zero.  The standard composition of the two priors this module
    already computes: ``mass = PR − TR`` after putting both vectors on a
    common scale.

    Integer contract: both inputs are the exact-bigint ``(node, rank)``
    fixed points; each is L1-normalized to per-node SHARES in
    ``micro``-units (``rank * micro div sum(rank)``, exact bigint
    division — fits while ``sum(rank) * micro < 2^63``, i.e. graphs up to
    ~9×10^12 rank-units at the default scales; raise ``scale`` down or
    ``micro`` down for larger graphs).  ``mass_micro`` is then an exact
    bigint difference — negative for nodes trusted ABOVE their raw rank —
    and only the audit ratio ``rel_mass`` (mass/pr share, round 6) is
    float, computed identically in both engines.

    Output: ``node, pr_micro, tr_micro, mass_micro, rel_mass``, one row
    per PageRank node (missing trust ⇒ 0).  Scale shape: the two L1
    totals are DRIVER SCALARS from one partial-aggregated ``.agg()``
    action over the joined frame (the ``hits._normalize`` pattern above),
    injected back as literals — the node table is data-scaled (10^8+
    registered domains at crawl scale), so no global window / single
    partition may ever see it, and no scalar cross join either (which
    would compile to a nested-loop broadcast and trip the NLJ plan gate).
    """
    joined = (
        pr.select("node", F.col("rank").alias("_pr"))
        .join(tr.select("node", F.col("rank").alias("_tr")), "node", "left")
        .select(
            "node",
            "_pr",
            F.coalesce(F.col("_tr"), F.lit(0)).cast("bigint").alias("_tr"),
        )
        .localCheckpoint()
    )
    # the totals over the left-joined frame are the vector sums (both
    # fixed points emit every node); map-side partial agg → two scalars
    tot = joined.agg(
        F.coalesce(F.sum("_pr"), F.lit(0)).alias("tp"),
        F.coalesce(F.sum("_tr"), F.lit(0)).alias("tt"),
    ).first()
    tp, tt = max(int(tot["tp"]), 1), max(int(tot["tt"]), 1)
    j = joined.select(
        "node",
        F.expr(f"_pr * {int(micro)} div {tp}").alias("pr_micro"),
        F.expr(f"_tr * {int(micro)} div {tt}").alias("tr_micro"),
    )
    return j.select(
        "node",
        "pr_micro",
        "tr_micro",
        (F.col("pr_micro") - F.col("tr_micro")).alias("mass_micro"),
        F.when(F.col("pr_micro") == 0, F.lit(0.0))
        .otherwise(
            F.round(
                (F.col("pr_micro") - F.col("tr_micro")) / F.col("pr_micro"), 6
            )
        )
        .alias("rel_mass"),
    )


def label_propagation(
    edges: DataFrame, n_iter: int = 5
) -> DataFrame:
    """Synchronous label propagation communities (Raghavan et al. 2007)
    over an undirected view of the edge list — the standard cheap
    community detector for host/domain graphs (a connected component can
    contain several link communities; LPA splits them where
    ``connected_components`` cannot).

    Determinism contract (the stock algorithm is famously order-
    dependent; this one is exact): SYNCHRONOUS rounds — every node
    updates from the previous round's labels — and ties on the neighbor
    label histogram break by ``(count desc, label asc)``; isolated
    self-loop-only nodes keep their own label.  A fixed ``n_iter``
    rounds (default 5), so the result is a pure function of the edge
    set, bit-identical across partitionings and engines — the DuckDB
    twin unrolls the same rounds with a ``row_number`` argmax.

    Output: ``node, community, community_size`` — community = the
    converged label (a node id), one row per node.

    Scale shape: per round one (dst → label) hash join + one
    (node, label) count + one per-node argmax via ``max_by`` struct
    ordering — all shuffles keyed on node/domain strings, uniform;
    lineage truncated per round with ``localCheckpoint`` (the module
    discipline, see ``pagerank``).
    """
    e = (
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .where(F.col("u") != F.col("v"))
        .union(
            edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
            .where(F.col("u") != F.col("v"))
        )
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    lab = nodes.select("node", F.col("node").alias("label"))
    for _ in range(n_iter):
        hist = (
            e.join(lab, e["v"] == lab["node"])
            .groupBy(F.col("u"), F.col("label"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # argmax (count desc, label asc) via min of (-c, label) struct
        best = (
            hist.groupBy("u")
            .agg(
                F.min(F.struct((-F.col("c")).alias("nc"), "label")).alias(
                    "_b"
                )
            )
            .select(F.col("u").alias("node"), F.col("_b.label").alias("label"))
        )
        lab = (
            nodes.join(best, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("label"), F.col("node")).alias("label"),
            )
            .localCheckpoint()
        )
    sizes = lab.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("community_size")
    )
    return lab.join(sizes, "label").select(
        "node", F.col("label").alias("community"), "community_size"
    )


def link_features(edges: DataFrame) -> DataFrame:
    """Per-node link-structure features — the classic web-spam feature
    block (Becchetti et al. 2008, "Link Analysis for Web Spam
    Detection"): degrees, reciprocity, and self-linking.  Link farms
    show extreme reciprocity (everyone links back) and near-zero
    organic in-links; these features feed the same per-domain prior
    table as ``pagerank``/``spam_mass``.

    Output per node (every src or dst in the edge list): ``node,
    out_deg, in_deg, n_recip (distinct out-neighbors that link back),
    recip_micro (n_recip·10^6 div out_deg, 0 for dangling), self_loop
    boolean``.  All-integer except nothing — hash-exact by construction.

    Scale shape: one distinct + three (node)-keyed aggregates and a
    self-join on the deduped edge set for reciprocity — every shuffle is
    keyed on the node/domain, uniform, O(edges).
    """
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    out_deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("out_deg")
    )
    in_deg = e.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("in_deg")
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = (
        e.join(rev, ["src", "dst"])
        .groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_recip"))
    )
    selfs = (
        edges.where(F.col("src") == F.col("dst"))
        .select(F.col("src").alias("node"))
        .distinct()
        .withColumn("_self", F.lit(True))
    )
    return (
        nodes.join(out_deg, "node", "left")
        .join(in_deg, "node", "left")
        .join(recip, "node", "left")
        .join(selfs, "node", "left")
        .select(
            "node",
            F.coalesce("out_deg", F.lit(0)).cast("bigint").alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).cast("bigint").alias("in_deg"),
            F.coalesce("n_recip", F.lit(0)).cast("bigint").alias("n_recip"),
            F.when(F.coalesce("out_deg", F.lit(0)) == 0, F.lit(0))
            .otherwise(
                F.expr("coalesce(n_recip, 0) * 1000000 div out_deg")
            )
            .cast("bigint")
            .alias("recip_micro"),
            F.coalesce("_self", F.lit(False)).alias("self_loop"),
        )
    )
