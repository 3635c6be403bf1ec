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

from pyspark.sql import DataFrame, functions as F

from sparkall_spark.operators._cache import register as _register_cache


def _ckpt_release(df: DataFrame, blocking: bool = True) -> None:
    """Free the storage blocks behind an eagerly ``localCheckpoint``-ed
    frame.  ``DataFrame.unpersist`` only clears CacheManager entries
    and does NOT touch checkpoint storage (probed), so this goes
    through the persistent-RDD registry keyed by the LogicalRDD's id —
    race-free (no global storage-list diffing) and scoped to exactly
    this frame.  Best-effort: on any internals drift the ContextCleaner
    GC backstop still reclaims the blocks eventually.  After release
    the frame is DEAD (lineage was truncated — there is nothing to
    recompute from), so callers release strictly after the successor
    round / final consumer has materialized."""
    try:
        sc = df.sparkSession.sparkContext
        rid = df._jdf.queryExecution().analyzed().rdd().id()
        ref = sc._jsc.getPersistentRDDs().get(rid)
        if ref is not None:
            ref.unpersist(blocking)
    except Exception:
        pass


class _CkptReleasable:
    """Duck-typed shim so a checkpoint-backed frame can ride the
    operator cache registry: ``release_caches()`` calls ``unpersist``
    on every registered entry, and for a checkpointed frame the real
    release is :func:`_ckpt_release`, not ``DataFrame.unpersist``."""

    def __init__(self, df: DataFrame):
        self._df = df

    def unpersist(self, blocking: bool = False) -> None:
        _ckpt_release(self._df, blocking)


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    checkpoint_every: int | None = None,
) -> DataFrame:
    """Component label (min node id in component) per node.

    Returns (node, comp).  Nodes appear iff they occur in an edge;
    callers union isolated nodes as self-components if needed.

    Iteration discipline: every round ends in an EAGER
    ``localCheckpoint`` — the label-propagation plan references the
    previous round's labels THREE times (the union, the neighbor join,
    the convergence probe), so without per-round truncation the
    logical plan doubles each iteration and Catalyst analysis blows up
    exponentially (measured: 6 s -> 53 s per round by iteration 4 on a
    200-node graph — the cost was the optimizer, not the data).  With
    truncation each round is one flat join+groupBy over materialized
    inputs, which is also the scale shape: at a billion edges the
    checkpoint is the label table spilled to executor storage once per
    round, the price every iterative-Spark system (GraphX supersteps,
    GraphFrames AAI) pays — and the PREVIOUS round's blocks are
    explicitly released as soon as the convergence probe has read
    them, so peak storage is two label tables, never ``max_iter``.
    ``localCheckpoint`` trades fault-tolerance for speed (executor
    loss mid-loop restarts the loop, it cannot replay lineage) —
    acceptable for a maintenance pass that re-runs idempotently; swap
    for ``checkpoint()`` + a checkpoint dir when an hours-long run on
    preemptible nodes must survive executor churn.

    ``checkpoint_every`` is accepted for call-site compatibility and
    ignored (r11: every round truncates — periodic truncation left the
    in-between rounds' plans growing exponentially).
    """
    del checkpoint_every
    both = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).unionByName(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    ).persist()

    labels = (
        both.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for _i in range(max_iter):
        # each node absorbs the minimum label among itself + neighbors
        neighbor_labels = (
            both.join(labels.withColumnRenamed("node", "v"), "v")
            .select(F.col("u").alias("node"), "comp")
        )
        new_labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)  # truncate lineage EVERY round
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        # new_labels is materialized and lineage-free: the previous
        # round's checkpoint blocks are dead weight from here on
        _ckpt_release(labels)
        labels = new_labels
        if changed == 0:
            break
    both.unpersist()
    # the final frame is checkpoint-materialized (no CacheManager
    # entry), so register the checkpoint-aware releasable: the session
    # teardown (release_caches) then frees its blocks like any other
    # operator intermediate.  NOTE the frame cannot be recomputed after
    # release (truncated lineage) — same consume-before-release
    # contract as every registered cache.
    _register_cache(_CkptReleasable(labels))
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
    rows joined map-side against the persisted rank table;
    localCheckpoint every ``checkpoint_every`` rounds truncates lineage
    (the iterative-Spark failure mode).  Unlike label propagation
    (:func:`connected_components`), each round references the previous
    ranks exactly ONCE, so the plan grows linearly between checkpoints
    — periodic truncation suffices.  The few lazy checkpoints' blocks
    (rank-table-sized, <= iters/checkpoint_every of them) are reclaimed
    by the ContextCleaner once the loop's references are collected;
    the label-prop loop's explicit per-round release is not needed at
    this state size.  Returns (node, rank).
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
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

    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    teleport = (1.0 - damping) / n_nodes
    for i in range(iters):
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
        new_ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.lit(damping) * F.coalesce(F.col("in_mass"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            new_ranks = new_ranks.localCheckpoint(eager=False)
        ranks = new_ranks
    return ranks


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

    Every round's frontier is EAGERLY localCheckpoint-ed: each round's
    plan references both the previous frontier and the visited set, so
    without truncation the logical tree DOUBLES per hop and analysis
    time goes exponential around hop ~7 (measured: 27 s/round, then
    driver OOM on a 97-node graph) — persist() caches data but not
    plans.  With per-round truncation the visited set is a flat union
    of checkpointed leaves, compacted every ``checkpoint_every`` hops.
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
    frontier = visited

    hop = 0
    while True:
        hop += 1
        if max_hops is not None and hop > max_hops:
            break
        nxt = (
            e.join(frontier.withColumnRenamed("node", "u"), "u")
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(hop))
            .localCheckpoint()  # eager: truncates this round's lineage
        )
        if nxt.count() == 0:
            break
        visited = visited.unionByName(nxt)
        if hop % checkpoint_every == 0:
            visited = visited.localCheckpoint()  # compact the union chain
        frontier = nxt
    return visited


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
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ranked = (
        e.join(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv"), "v")
    )
    # orient low -> high by (degree, id)
    fwd = ranked.select(
        F.when(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
            F.struct(F.col("u").alias("a"), F.col("v").alias("b")),
        )
        .otherwise(F.struct(F.col("v").alias("a"), F.col("u").alias("b")))
        .alias("e")
    ).select(F.col("e.a").alias("a"), F.col("e.b").alias("b"))
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
    corners = (
        tris.select(F.col("x").alias("node"))
        .unionAll(tris.select(F.col("y").alias("node")))
        .unionAll(tris.select(F.col("z").alias("node")))
    )
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )


def clustering_coefficient(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """Local clustering coefficient per node: 2*triangles /
    (degree*(degree-1)) — how close each node's neighborhood is to a
    clique (community-structure / spam-farm signal).  Composes
    :func:`triangle_count`'s per-node corners with one degree
    aggregation over the canonical edge set; nodes with degree < 2
    score 0.  Output: (node, degree, n_triangles, coeff 6dp)."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    tris = triangle_count(edges, src, dst, per_node=True)
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
