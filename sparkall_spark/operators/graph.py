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
labels persist between rounds and the previous round unpersists;
`localCheckpoint` every few rounds truncates the lineage so plans don't
grow unboundedly (the classic iterative-Spark failure mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from sparkall_spark.operators._cache import register as _register_cache


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Component label (min node id in component) per node.

    Returns (node, comp).  Nodes appear iff they occur in an edge;
    callers union isolated nodes as self-components if needed.
    """
    both = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).unionByName(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    ).persist()

    labels = (
        both.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .persist()
    )
    labels.count()

    for i in range(max_iter):
        # each node absorbs the minimum label among itself + neighbors
        neighbor_labels = (
            both.join(labels.withColumnRenamed("node", "v"), "v")
            .select(F.col("u").alias("node"), "comp")
        )
        new_labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
        )
        if (i + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=False)
        new_labels = new_labels.persist()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    both.unpersist()
    # the final label frame stays persisted for the caller's consumption;
    # register it so release_caches() can reclaim it afterwards
    return _register_cache(labels)


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
    (the iterative-Spark failure mode).  Returns (node, rank).
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
