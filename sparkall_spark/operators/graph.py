"""Iterative graph operators: connected components over a pair/edge
DataFrame (extension — the canonical 'non-SQL-expressible' iterative
algorithm; the driver's oracle uses a recursive CTE instead).

Use case here: transitive near-duplicate clusters — minhash pairs say
A~B and B~C; component labels make {A,B,C} one cluster with a single
canonical representative (the minimum id), which greedy pairwise
dropping can't guarantee.

Algorithm: min-label propagation.  Every node starts as its own
component; each round joins current labels across edges (both
directions) and takes the minimum seen.  Converges in O(graph diameter)
rounds — near-dup graphs are clique-ish, so typically 2-3 rounds.

Scale design: each round is ONE shuffle (groupBy node) over |E| rows;
every round ends in an EAGER `localCheckpoint` (lineage truncation —
the label-prop plan references the previous labels three times, so
without per-round truncation the logical plan doubles per round and
Catalyst analysis goes exponential), and the previous round's
checkpoint blocks are explicitly released once the new round is
materialized (persisted-RDD registry; ContextCleaner GC is the
backstop), so at most two label-table copies are ever pinned.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, functions as F

from sparkall_spark.operators._cache import register as _register_cache
from sparkall_spark.operators.iterate import (
    CkptReleasable as _CkptReleasable,
    ckpt_release as _ckpt_release,
    iterate_with_truncation,
)

__all__ = [
    "connected_components",
    "dedup_clusters",
    "pagerank",
    "reachable_from",
    "triangle_count",
    "clustering_coefficient",
    "k_core",
]


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    checkpoint_every: int | None = None,
) -> DataFrame:
    """Component label (min node id in component) per node.

    **Consume-before-release contract**: the result is a
    checkpoint-backed frame registered with the operator cache
    registry — consume it BEFORE ``release_caches()`` runs (session
    teardown / the entry harness).  After release it is unrecoverable
    (truncated lineage; nothing to recompute from), unlike a plain
    persisted frame which would transparently recompute.

    Returns (node, comp).  Nodes appear iff they occur in an edge;
    callers union isolated nodes as self-components if needed.

    Iteration discipline: min-label propagation references the
    previous round's labels more than once (the union and the
    neighbor join) — per-round truncation under
    :func:`~sparkall_spark.operators.iterate.iterate_with_truncation`,
    with the previous round's blocks explicitly released each round
    (peak storage: two label tables, never ``max_iter``).
    Convergence rides a ``converge_stat`` (r12): labels only ever
    DECREASE under min-propagation, so the exact decimal SUM of all
    labels is strictly monotone and repeats iff a round changed
    nothing — one aggregation job per round that doubles as the
    checkpoint materialization, replacing the former
    checkpoint-count-plus-probe-join pair (two jobs and, at a billion
    nodes, a per-round shuffle join of two label tables).
    Without per-round truncation the logical plan doubles each
    iteration and Catalyst analysis blows up exponentially (measured:
    6 s -> 53 s per round by iteration 4 on a 200-node graph — the
    cost was the optimizer, not the data).  Each round is one flat
    join+groupBy over materialized inputs, which is also the scale
    shape: at a billion edges the checkpoint is the label table
    spilled to executor storage once per round, the price every
    iterative-Spark system (GraphX supersteps, GraphFrames AAI) pays.

    ``checkpoint_every`` is accepted for call-site compatibility and
    ignored (r11: every round truncates — periodic truncation left the
    in-between rounds' plans growing exponentially); passing a
    non-default value warns instead of silently discarding the knob.
    """
    if checkpoint_every is not None:
        warnings.warn(
            "connected_components ignores checkpoint_every: every "
            "round truncates lineage (the label-prop plan references "
            "prior labels 3x, so periodic truncation still goes "
            "exponential between checkpoints)",
            DeprecationWarning,
            stacklevel=2,
        )
    both = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).unionByName(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    ).persist()

    init = (
        both.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
    )

    def step(labels: DataFrame, _i: int) -> DataFrame:
        # each node absorbs the minimum label among itself + neighbors
        neighbor_labels = (
            both.join(labels.withColumnRenamed("node", "v"), "v")
            .select(F.col("u").alias("node"), "comp")
        )
        return (
            labels.unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
        )

    labels = iterate_with_truncation(
        init, step, refs_per_round=2, max_iter=max_iter,
        # exact (decimal, not double) so equality is bitwise; 38 digits
        # hold any realistic sum of 64-bit ids over 10^10 nodes
        converge_stat=F.sum(F.col("comp").cast("decimal(38,0)")),
        register=True,
    )
    both.unpersist()
    return labels


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Assign every row of ``df`` its near-dup cluster representative.

    Rows absent from the pair graph are their own singleton cluster.
    Output: all df columns + ``cluster_rep``.
    """
    comps = connected_components(pairs, src, dst).withColumnRenamed(
        "node", id_col
    )
    return df.join(comps, id_col, "left").withColumn(
        "cluster_rep", F.coalesce(F.col("comp"), F.col(id_col))
    ).drop("comp")


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iters: int = 10,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Fixed-iteration PageRank over an edge DataFrame (extension).

    Pretraining use case: domain-level authority over a web link graph
    drives per-domain sampling weights and quality priors (the classic
    "rank the crawl" step).  Semantics: standard power iteration with
    uniform teleport over the node set; dangling nodes (no out-edges)
    keep their teleport mass only — the simple variant every SQL
    oracle can mirror with a k-step CTE chain.

        pr_0       = 1/N
        pr_{t+1}   = (1-d)/N + d * sum_{(u,v) in E} pr_t(u)/outdeg(u)

    Scale design: each iteration is ONE shuffle (groupBy dst) over |E|
    rows joined map-side against the persisted rank table.  Unlike
    label propagation (:func:`connected_components`), each round
    references the previous ranks exactly ONCE — ``refs_per_round=1``
    under :func:`~sparkall_spark.operators.iterate.
    iterate_with_truncation`, i.e. the plan grows linearly between
    checkpoints and a LAZY ``localCheckpoint`` every
    ``checkpoint_every`` rounds suffices.  The few lazy checkpoints'
    blocks (rank-table-sized, <= iters/checkpoint_every of them) are
    reclaimed by the ContextCleaner once the loop's references are
    collected; the label-prop loop's explicit per-round release is not
    needed at this state size.  Returns (node, rank).
    """
    # the edge projection is read EVERY round — persist it like the
    # other iterative loops (GraphX's cached edge RDD is the same
    # trade: MEMORY_AND_DISK spills when |E| outgrows executor memory
    # rather than re-scanning the source per iteration)
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).persist()
    _register_cache(e)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    _register_cache(nodes)
    n_nodes = nodes.count()  # one metadata-scale job, reused every round
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg")).persist()
    _register_cache(outdeg)

    teleport = (1.0 - damping) / n_nodes

    def step(ranks: DataFrame, _i: int) -> DataFrame:
        contrib = (
            e.join(ranks, e["src"] == ranks["node"])
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("outdeg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
        )
        return (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.lit(damping) * F.coalesce(F.col("in_mass"), F.lit(0.0))
                ).alias("rank"),
            )
        )

    return iterate_with_truncation(
        nodes.withColumn("rank", F.lit(1.0 / n_nodes)), step,
        refs_per_round=1, max_iter=iters,
        checkpoint_every=checkpoint_every,
    )


def reachable_from(
    edges: DataFrame,
    sources: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int | None = None,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Directed reachability: every node reachable from ``sources``
    (one column: the seed node ids) with its minimum hop distance —
    the UNBOUNDED complement of the query engine's depth-capped
    property-path closure (`p+` desugars to <= 4 chained joins in the
    declarative fragment; true transitive reachability belongs here,
    in the iterative layer, like the SCALE notes say).

    Frontier BFS: each round joins only the NEWLY-reached frontier
    against the edge table (one shuffle over frontier-adjacent edges,
    not |E|), anti-joins already-visited nodes, and stops at fixpoint
    (or after ``max_hops``).  Work is proportional to the reachable
    subgraph, never the full closure's quadratic pair set — which is
    why the output is (node, min_hops) from a seed SET, not all-pairs.
    Returns (node, hops) including the sources at hops=0.

    Every round's frontier is EAGERLY localCheckpoint-ed
    (``refs_per_round=2`` under :func:`~sparkall_spark.operators.
    iterate.iterate_with_truncation` — the round's plan references
    both the previous frontier and the visited set): without
    truncation the logical tree DOUBLES per hop and analysis time goes
    exponential around hop ~7 (measured: 27 s/round, then driver OOM
    on a 97-node graph) — persist() caches data but not plans.  With
    per-round truncation the visited set is a flat union of
    checkpointed leaves, compacted every ``checkpoint_every`` hops.
    Unlike label propagation, earlier rounds' checkpoint blocks stay
    LIVE inside the visited union (``release_prev=False``); the
    ContextCleaner reclaims them after the result is consumed.
    """
    e = edges.select(
        F.col(src_col).alias("u"), F.col(dst_col).alias("v")
    ).persist()
    _register_cache(e)

    visited = (
        sources.select(F.col(sources.columns[0]).alias("node"))
        .distinct()
        .withColumn("hops", F.lit(0))
        .localCheckpoint()
    )
    # mutated by step/converged below — converged is the one hook
    # point where the new frontier is materialized and safely
    # consumable while the old state is still alive
    state = {"visited": visited, "hop": 0}

    def step(frontier: DataFrame, i: int) -> DataFrame:
        state["hop"] = i + 1
        return (
            e.join(frontier.withColumnRenamed("node", "u"), "u")
            .select(F.col("v").alias("node"))
            .distinct()
            .join(state["visited"].select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(i + 1))
        )

    def converged(_prev: DataFrame, nxt: DataFrame) -> bool:
        if nxt.count() == 0:
            return True
        state["visited"] = state["visited"].unionByName(nxt)
        if state["hop"] % checkpoint_every == 0:
            # compact the union chain
            state["visited"] = state["visited"].localCheckpoint()
        return False

    iterate_with_truncation(
        visited, step, refs_per_round=2, max_iter=max_hops,
        converged=converged, release_prev=False,
    )
    return state["visited"]


def triangle_count(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    per_node: bool = False,
) -> DataFrame:
    """Exact triangle count over an undirected edge set (duplicate and
    self edges tolerated — canonicalized first).

    The scale move is DEGREE ORIENTATION (the standard trick from
    Suri & Vassilvitskii, WWW'11 "Counting triangles and the curse of
    the last reducer"): orient every edge from its lower-degree
    endpoint to the higher (ties by id), count each triangle exactly
    once at its lowest-degree vertex.  A vertex then has out-degree
    O(sqrt(|E|)) regardless of how hot it is, so the wedge join —
    the quadratic step — is bounded per node: a celebrity node with
    10^6 neighbors contributes wedges only through its few
    HIGHER-degree peers, not 10^12 neighbor pairs.  Plan: two
    self-equi-joins on the oriented edge list, all shuffle-partitioned
    by node; no windows, no driver data.

    ``per_node=False`` (default): one row, ``n_triangles`` (bigint).
    ``per_node=True``: (node, n_triangles) for every vertex of at
    least one triangle — corner counts, each triangle contributing to
    all three vertices.

    r12 (guide §5/§2.4): the canonical edge set ``e`` and the oriented
    list ``fwd`` are each consumed by SEVERAL downstream subtrees
    (``fwd`` three times: both wedge legs + the closing edge), and
    Spark recomputes an unpersisted subtree once per reference — the
    unoptimized plan re-ran the whole distinct/degree/orient chain up
    to nine times (measured: 7.3 s steady on a 150-node graph, pure
    stage scheduling + a plan so large its codegen dominated the gate
    session).  Both are now persisted (released via
    ``release_caches``): the oriented edge list is exactly the working
    set Suri–Vassilvitskii materializes anyway, spills gracefully at
    scale, and collapses the plan to one computation of each step.
    Degrees come from ONE ``explode`` pass over ``e`` instead of a
    two-branch unionAll (same counts, one read).
    """
    from sparkall_spark.operators._cache import persist_tracked

    e = persist_tracked(
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        e.select(F.explode(F.array("u", "v")).alias("n"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ranked = (
        e.join(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv"), "v")
    )
    # orient low -> high by (degree, id)
    fwd = persist_tracked(
        ranked.select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("a"), F.col("v").alias("b")),
            )
            .otherwise(F.struct(F.col("v").alias("a"), F.col("u").alias("b")))
            .alias("e")
        ).select(F.col("e.a").alias("a"), F.col("e.b").alias("b"))
    )
    # wedges at the lowest-ranked vertex, closed by the oriented edge
    w1 = fwd.select(F.col("a").alias("x"), F.col("b").alias("y"))
    w2 = fwd.select(F.col("a").alias("x"), F.col("b").alias("z"))
    wedges = w1.join(w2, "x").filter(F.col("y") < F.col("z"))
    closing = fwd.select(
        F.least("a", "b").alias("y"), F.greatest("a", "b").alias("z")
    )
    tris = wedges.join(closing, ["y", "z"]).select(
        F.col("x"), F.col("y"), F.col("z")
    )
    if not per_node:
        return tris.agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    # one explode pass instead of a three-branch unionAll — the union
    # referenced `tris` three times, so the wedge+closing joins ran
    # three times per query (same corner multiset either way)
    corners = tris.select(
        F.explode(F.array("x", "y", "z")).alias("node")
    )
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )


def clustering_coefficient(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    triangles: DataFrame | None = None,
) -> DataFrame:
    """Local clustering coefficient per node: 2*triangles /
    (degree*(degree-1)) — how close each node's neighborhood is to a
    clique (community-structure / spam-farm signal).  Composes
    :func:`triangle_count`'s per-node corners with one degree
    aggregation over the canonical edge set; nodes with degree < 2
    score 0.  Output: (node, degree, n_triangles, coeff 6dp).

    ``triangles``: a precomputed ``triangle_count(..., per_node=True)``
    frame over the SAME edge set — pass it when the caller already
    materialized one (r12: the wedge join is the expensive step; a
    caller emitting both a triangle report and coefficients would
    otherwise run it twice)."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    # one explode pass instead of a two-branch unionAll re-read of `e`
    # (same endpoint counts; `e` then has a single consumer chain here)
    deg = (
        e.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    tris = (
        triangles
        if triangles is not None
        else triangle_count(edges, src, dst, per_node=True)
    )
    joined = deg.join(tris, "node", "left").withColumn(
        "n_triangles", F.coalesce(F.col("n_triangles"), F.lit(0))
    )
    denom = F.col("degree") * (F.col("degree") - 1)
    return joined.select(
        "node",
        "degree",
        "n_triangles",
        F.round(
            F.when(denom > 0, 2.0 * F.col("n_triangles") / denom).otherwise(
                0.0
            ),
            6,
        ).alias("coeff"),
    )


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int | None = None,
) -> DataFrame:
    """Maximal k-core: the largest subgraph where every node keeps
    degree >= k — iterative peeling (remove all nodes of degree < k,
    recompute, repeat to fixpoint).  Pretraining use: core membership
    separates densely-linked domains from peripheral/orphan pages in a
    crawl graph (a robustness signal pagerank alone does not give —
    rank can be inflated by one hub; coreness cannot).

    Returns ``(node, core_degree)`` for k-core members only, where
    ``core_degree`` is the degree WITHIN the core (>= k by
    construction).  Edges are canonicalized (undirected, self-loops and
    duplicates dropped).  ``k < 1`` raises; ``max_iter=None`` runs to
    fixpoint (peel depth is graph-dependent: O(diameter-ish) on
    expander-like graphs, O(|V|) worst case on paths — cap it when the
    shape is unknown).

    Iteration discipline (r12): rides
    :func:`~sparkall_spark.operators.iterate.iterate_with_truncation`
    with a ``converge_stat`` — each round's plan references the alive
    set twice (both endpoints of the surviving-edge semi-joins), and
    the row COUNT is strictly monotone under peeling (rows only ever
    leave; an unchanged node set implies unchanged degrees, since only
    nodes with an alive edge carry edges), so the round's single
    aggregation job doubles as the checkpoint materialization and the
    repeat detects the fixpoint.
    Scale shape: each round is one equi-join pair + one groupBy over
    the POSITIVE side only (edges with both endpoints alive) — work
    shrinks with the alive set; no windows, no driver-side graph.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    both = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .select(
            F.explode(
                F.array(
                    F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
                    F.struct(F.col("b").alias("u"), F.col("a").alias("v")),
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .persist()
    )

    init = both.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("core_degree")
    )

    def step(state: DataFrame, _i: int) -> DataFrame:
        alive = state.filter(F.col("core_degree") >= k).select("node")
        return (
            both.join(alive.withColumnRenamed("node", "u"), "u")
            .join(alive.withColumnRenamed("node", "v"), "v")
            .groupBy(F.col("u").alias("node"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("core_degree"))
        )

    out = iterate_with_truncation(
        init, step, refs_per_round=2, max_iter=max_iter,
        # count, not an id sum: rows only ever LEAVE the state, so the
        # count strictly decreases until fixpoint regardless of id
        # signs (a +5/-5 removal pair would fool a sum)
        converge_stat=F.count(F.lit(1)),
        register=True,
    )
    both.unpersist()
    # the fixpoint state still lists sub-k nodes whose last recompute
    # dropped them below k (they are not core members; the NEXT round
    # would have removed them and changed nothing else)
    return out.filter(F.col("core_degree") >= k)
