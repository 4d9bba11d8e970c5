"""Distributed PageRank over an edge DataFrame — the third iterative
algorithm the engine owns end-to-end (with ``dedup.connected_components``
and ``clustering.kmeans_train``), expressed as pure DataFrame ops.

The reference has no graph surface (its executor is 4 relational
operators, /root/reference/src/executor/mod.rs:250-466); a training-data
platform needs link analysis for source/domain ranking (e.g. quality
weighting crawl domains by their co-citation graph).

Per iteration: one shuffle join of the edge list with the rank table on
``src`` and one groupBy on ``dst`` — the textbook distributed PageRank
data flow (edges never move to the driver; the rank table is
node-sized, never edge-sized). The iteration count is a small fixed
constant so the whole train is one lazy DAG; ``localCheckpoint`` per
round cuts the replayed lineage exactly like the k-means loop.

Cross-engine determinism (mirrored by the DuckDB oracle in
plans/analytics.py): per-edge contributions ``round(r/outdeg, 9)``
accumulate as DECIMAL(28,12), and each iteration's ranks round to 9
decimals, so both engines iterate from bit-identical vectors regardless
of partitioning or summation order.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_DEC = "decimal(28,12)"


def _r9(col: F.Column) -> F.Column:
    """Round to 9 decimals as ``floor(x*1e9 + 0.5)/1e9`` — pure IEEE
    ops, bit-identical in every engine. Spark's round() goes through
    BigDecimal HALF_UP while DuckDB rounds the scaled double directly;
    on boundary values (seen at sf0.1: 8.2635e-05 vs 8.2636e-05) the
    two disagree by one ulp of the 9th digit, so the mirrored oracle
    uses this exact floor form instead. Valid for the non-negative
    ranks/contributions used here (floor(x+0.5) is half-up only for
    x >= 0); Spark's floor yields BIGINT, exact for values < 2^53."""
    return F.floor(col * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9)


def pagerank(
    edges: DataFrame,
    iterations: int = 2,
    damping: float = 0.85,
    teleport: float = 0.15,
) -> DataFrame:
    """Ranks for every node of the directed edge list ``edges`` (columns
    ``src``, ``dst``). Assumes every node has outdegree >= 1 (true for
    symmetric/co-occurrence graphs, which is what the registered query
    builds) so there is no dangling-mass term. Returns (node, pagerank).

    ``teleport`` is passed explicitly rather than computed as
    ``1 - damping``: the oracle writes the literal 0.15, and IEEE
    ``1.0 - 0.85`` is 0.15000000000000002 — the same decimal literal on
    both sides guarantees bit-identical arithmetic.
    """
    edges = edges.select("src", "dst").localCheckpoint(eager=False)
    nodes = edges.select(F.col("src").alias("node")).distinct()
    # Scalar N rides along as a broadcast 1-row cross join — no action
    # on the driver, the plan stays lazy.
    n_tbl = F.broadcast(nodes.agg(F.count(F.lit(1)).cast("double").alias("n")))
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))

    ranks = nodes.crossJoin(n_tbl).select(
        "node", _r9(F.lit(1.0) / F.col("n")).alias("r")
    )
    # r13: NO per-round lineage cut. Each round consumes the previous
    # rank table exactly ONCE (the contrib join), so the un-checkpointed
    # plan grows LINEARLY with the small fixed iteration count — there is
    # no subtree duplication for a cut to prevent — and the repeated
    # outdeg/n_tbl subtrees canonicalize identically, so ReuseExchange
    # computes them once at execution. Dropping the per-round
    # localCheckpoint removes `iterations` semi-eager AQE materializations
    # (one blocking driver sync + stage jobs per round at build time,
    # profiled ~130-400 ms each on an idle local[32]) and lets the whole
    # train execute as one pipelined DAG.
    for _ in range(iterations):
        contrib = (
            edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                _r9(F.col("r") / F.col("outdeg")).cast(_DEC).alias("term"),
            )
        )
        ranks = (
            contrib.groupBy("node")
            .agg(F.sum("term").cast("double").alias("s"))
            .crossJoin(n_tbl)
            .select(
                "node",
                _r9(
                    F.lit(teleport) / F.col("n") + F.lit(damping) * F.col("s")
                ).alias("r"),
            )
        )
    return ranks.select("node", F.col("r").alias("pagerank"))


def bfs_distances(edges: DataFrame, seed: DataFrame, max_hops: int) -> DataFrame:
    """Breadth-first minimum hop distance from ``seed`` (a 1-row
    DataFrame with column ``node``) over the directed edge list,
    bounded at ``max_hops``. Returns (node, dist) for every reached
    node — dist is exact min-distance because each round's frontier is
    anti-joined against everything already visited before it is
    admitted (a node is labeled the first time BFS reaches it).

    Scale: the textbook distributed frontier BFS — per hop, one
    edge⋈frontier shuffle join plus a distinct; the frontier and
    visited tables are node-sized, never edge-sized, and lazy
    ``localCheckpoint`` per round cuts replayed lineage exactly like
    the PageRank loop above. Hop count is a small constant, so the
    whole walk is one DAG."""
    edges = edges.select("src", "dst").localCheckpoint(eager=False)
    frontier = seed.select(
        F.col("node").cast("bigint").alias("node"), F.lit(0).alias("dist")
    ).localCheckpoint(eager=False)
    # r13: only the FRONTIER is lineage-cut per hop (it is consumed twice
    # — the visited union and the next hop's join — so an uncut plan
    # would double per round). The visited set is kept as the lazy UNION
    # of the already-checkpointed frontiers: the frontiers are disjoint
    # by construction, so the union carries exactly the same bytes the
    # old per-round visited checkpoint did, while dropping one semi-eager
    # AQE materialization (a blocking driver sync, ~130-400 ms profiled)
    # per hop.
    visited = frontier
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(F.col("dst").alias("node"), F.lit(h).alias("dist"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .localCheckpoint(eager=False)
        )
        visited = visited.unionAll(nxt)
        frontier = nxt
    return visited


def kcore_peel(edges: DataFrame, k: int, rounds: int) -> DataFrame:
    """k-core peel profile over a symmetric directed edge list (columns
    ``src``, ``dst``; both directions present): per round, every node
    whose CURRENT degree is < ``k`` is removed together with its
    incident edges, and the survivor counts are recorded. Returns one
    row per round r in [0, rounds]: (peel_round, nodes_remaining,
    edges_remaining), where round 0 is the input graph. After enough
    rounds the survivors are exactly the k-core (the maximal subgraph
    with all degrees >= k, Seidman 1983); the per-round profile is the
    "onion" view used for graph robustness / core-structure analysis.

    Semantics are EXACT for any round budget — row r is the survivor
    count after r synchronous peel sweeps (the same bounded-round
    invariant as ``sssp_distances``), which the registered query's
    unrolled-CTE oracle replays; fixpoint within the budget shows up as
    trailing equal rows.

    Scale: per round, one combinable degree groupBy (map-side partial
    counts) and two node-keyed left-semi joins — state is edge-sized
    and MONOTONICALLY SHRINKING, nothing ever reaches the driver, and
    lazy ``localCheckpoint`` per round cuts replayed lineage exactly
    like the PageRank/BFS/Bellman-Ford loops above. Round count is a
    small fixed constant; the peel converges in few rounds on real
    graphs because each sweep removes every currently-underweight node
    at once (not one node at a time)."""
    edges = edges.select("src", "dst").localCheckpoint(eager=False)

    def _profile(r: int, e: DataFrame) -> DataFrame:
        return e.agg(
            F.countDistinct("src").cast("bigint").alias("nodes_remaining"),
            F.count(F.lit(1)).cast("bigint").alias("edges_remaining"),
        ).select(
            F.lit(r).cast("bigint").alias("peel_round"),
            "nodes_remaining",
            "edges_remaining",
        )

    out = _profile(0, edges)
    # r13: the per-round `keep` set is NOT checkpointed any more. It is
    # consumed twice (src and dst semi-joins) inside ONE compiled plan —
    # the round's edge checkpoint — where the two subtrees canonicalize
    # identically, so ReuseExchange computes the degree aggregation once
    # at execution. Cutting it separately bought nothing and cost one
    # semi-eager AQE materialization (a blocking driver sync, profiled
    # ~130-400 ms) per round. The EDGES stay checkpointed per round:
    # they are consumed three times (profile row, next round's degree
    # aggregate, next round's semi-joins), which an uncut plan would
    # re-derive exponentially.
    for r in range(1, rounds + 1):
        keep = (
            edges.groupBy("src")
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") >= k)
            .select("src")
        )
        edges = (
            edges.join(keep, "src", "left_semi")
            .join(keep.withColumnRenamed("src", "dst"), "dst", "left_semi")
            .localCheckpoint(eager=False)
        )
        out = out.unionAll(_profile(r, edges))
    return out


def label_propagation(edges: DataFrame, iterations: int) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al., 2007) over a symmetric directed edge list (``src``, ``dst``,
    both directions present), made DETERMINISTIC: labels start as the
    node id, and each round every node adopts the most frequent label
    among its neighbors, ties broken by SMALLEST label (the classic
    async/random variant is run-dependent; the synchronous min-tie
    rule gives one exact answer any engine can replay). Returns
    (node, lbl) after ``iterations`` rounds.

    Scale: per round, one edge⋈label shuffle join, one combinable
    (node, label) count, and one node-partitioned argmax window whose
    partitions are bounded by a node's DEGREE (never corpus-sized);
    label state is node-sized and lineage is cut per round like every
    iterative-graph loop in this module. Density caveat: on a
    near-clique graph synchronous LPA oscillates — use the REPEAT
    co-purchase graph (weight >= 2), where it settles into stable
    communities within a few rounds."""
    from pyspark.sql import Window

    edges = edges.select("src", "dst").localCheckpoint(eager=False)
    # r13: NO per-round lineage cut (same reasoning as pagerank): each
    # round's label table is consumed exactly ONCE (the next round's
    # edge⋈label join), so the uncut plan grows linearly with the small
    # fixed round count — one join + one agg + one window per round —
    # and the whole propagation executes as one pipelined DAG instead of
    # paying a semi-eager AQE materialization (blocking driver sync,
    # ~130-400 ms profiled) per round.
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lbl"))
    )
    w = Window.partitionBy("src").orderBy(F.desc("c"), "lbl")
    for _ in range(iterations):
        cnt = (
            edges.join(labels.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src", "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            cnt.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("src").alias("node"), "lbl")
        )
    return labels


def sssp_distances(
    edges: DataFrame, seed: DataFrame, rounds: int
) -> DataFrame:
    """Single-source shortest path over a WEIGHTED edge list (columns
    ``src``, ``dst``, integer ``w`` >= 0) — frontier-driven Bellman-Ford,
    the weighted sibling of ``bfs_distances``. After ``rounds`` rounds
    the returned (node, dist) is exactly min path cost over all paths
    of <= ``rounds`` edges from the seed (the classic Bellman-Ford
    invariant), which the registered query's unrolled-CTE oracle
    replays with integer arithmetic — no rounding anywhere.

    Scale: per round, one frontier⋈edges shuffle join, one groupBy(dst)
    min, and one node-keyed improvement join — all state node-sized.
    Only nodes whose distance IMPROVED last round relax their out-edges
    (the frontier), so settled regions of a 100 TB graph stop paying
    per-round cost; lazy ``localCheckpoint`` per round cuts replayed
    lineage exactly like the PageRank/BFS loops above."""
    edges = edges.select("src", "dst", "w").localCheckpoint(eager=False)
    seed0 = seed.select(
        F.col("node").cast("bigint").alias("node"),
        F.lit(0).cast("bigint").alias("dist"),
    ).localCheckpoint(eager=False)

    # r13: the per-round dist table is no longer materialized by an
    # anti-join + union + lineage cut. Every improvement is strictly
    # SMALLER than the node's previous distance, so the distance-so-far
    # after round r is exactly min() over the seed and every checkpointed
    # improvement table — a lazy union-aggregate over already-cut block
    # scans, rebuilt per consumer and deduplicated by ReuseExchange when
    # it appears twice in one compiled plan. Bytes are the same
    # node-sized state the old anti-join shuffled once per round; what
    # disappears is one semi-eager AQE materialization (blocking driver
    # sync, ~130-400 ms profiled) per round. Only the FRONTIER
    # (`improved`) keeps its per-round cut — it feeds three consumers
    # (the min-union, the next round's relax join, and the filter's
    # left_outer probe), which an uncut plan would re-derive
    # exponentially.
    improvements = [seed0]

    def dist_so_far():
        u = improvements[0]
        for d in improvements[1:]:
            u = u.unionByName(d)
        return u.groupBy("node").agg(F.min("dist").alias("dist"))

    frontier = seed0
    for _ in range(rounds):
        best = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(
                F.col("dst").alias("node"),
                (F.col("dist") + F.col("w")).cast("bigint").alias("cand"),
            )
            .groupBy("node")
            .agg(F.min("cand").alias("cand"))
        )
        improved = (
            best.join(dist_so_far(), "node", "left_outer")
            .filter(F.col("dist").isNull() | (F.col("cand") < F.col("dist")))
            .select("node", F.col("cand").alias("dist"))
            .localCheckpoint(eager=False)
        )
        improvements.append(improved)
        frontier = improved
    return dist_so_far()


def hits_bipartite(
    edges: DataFrame, iterations: int = 2
) -> tuple[DataFrame, DataFrame]:
    """HITS hubs & authorities (Kleinberg 1999, JACM 46(5)) over a
    BIPARTITE directed edge list (``src`` → ``dst``; the two node
    spaces never mix, so hub scores live on src nodes and authority
    scores on dst nodes with no id-collision bookkeeping). Returns
    (hubs, authorities) as (node, score) DataFrames after
    ``iterations`` full hub→authority→hub sweeps.

    Determinism (mirrored by the unrolled-CTE DuckDB oracle): scores
    are normalized by the MAX (the max-norm HITS variant — max over
    exact decimals, one shared IEEE division) instead of the L2 norm,
    and every accumulation is a DECIMAL(28,12) sum of 9-dp-rounded
    terms, so both engines iterate from bit-identical vectors.

    Scale: per half-iteration, one edge⋈score shuffle join plus one
    combinable groupBy — the same node-sized-state flow as ``pagerank``
    above; the normalizing max rides along as a broadcast 1-row cross
    join (no driver action), and lazy ``localCheckpoint`` per round
    cuts replayed lineage."""
    edges = edges.select("src", "dst").localCheckpoint(eager=False)
    hubs = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.lit(1.0).alias("score"))
    )
    # r13: the per-half-step lineage cut moved from the NORMALIZED score
    # table to the RAW aggregate. The raw table is the half-step's only
    # duplicated subtree (it feeds both the max-norm broadcast and the
    # normalized projection), so cutting it is what actually prevents
    # re-derivation; the normalization itself is a projection over the
    # cut blocks plus a 1-row broadcast and stays lazy. Same number of
    # cuts per half-step, but each cut's compile is one join + one
    # combinable agg over block scans — and the initial all-ones hub
    # table no longer pays its own materialization (it is consumed once,
    # by the first half-step).
    auths = None
    for _ in range(iterations):
        a_raw = (
            edges.join(hubs.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(_r9(F.col("score")).cast(_DEC)).alias("raw"))
            .localCheckpoint(eager=False)
        )
        a_max = F.broadcast(a_raw.agg(F.max("raw").alias("mx")))
        auths = a_raw.crossJoin(a_max).select(
            "node",
            _r9(
                F.col("raw").cast("double") / F.col("mx").cast("double")
            ).alias("score"),
        )
        h_raw = (
            edges.join(auths.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum(_r9(F.col("score")).cast(_DEC)).alias("raw"))
            .localCheckpoint(eager=False)
        )
        h_max = F.broadcast(h_raw.agg(F.max("raw").alias("mx")))
        hubs = h_raw.crossJoin(h_max).select(
            "node",
            _r9(
                F.col("raw").cast("double") / F.col("mx").cast("double")
            ).alias("score"),
        )
    return hubs, auths
