import duckdb
import pytest

from sparkall_spark.operators.dedup import minhash_dedup_pairs
from sparkall_spark.operators.graph import connected_components, dedup_clusters


def test_connected_components_synthetic(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (7, 7)], ["id_a", "id_b"]
    )
    comps = {r["node"]: r["comp"] for r in connected_components(edges).collect()}
    assert comps[1] == comps[2] == comps[3] == 1
    assert comps[5] == comps[6] == 5
    assert comps[7] == 7


def test_chain_requires_iterations(spark):
    # path graph 10 -> ... -> 1: min label must travel the diameter
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 10)], ["id_a", "id_b"]
    )
    comps = {r["node"]: r["comp"] for r in connected_components(edges).collect()}
    assert set(comps.values()) == {1}


def test_dedup_clusters_vs_recursive_cte(spark, sf_dir):
    """Transitive near-dup clusters must equal DuckDB's recursive-CTE
    closure over the same exact-jaccard pair set."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = minhash_dedup_pairs(docs, threshold=0.9)
    out = dedup_clusters(docs, pairs)
    got = {(r["doc_id"], r["cluster_rep"]) for r in out.collect()}

    con = duckdb.connect()
    exp = {
        tuple(r)
        for r in con.execute(
            f"""
        WITH RECURSIVE
        t AS (SELECT doc_id, list_distinct(list_filter(
                regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) toks
              FROM '{sf_dir}/documents.parquet'),
        pairs AS (
          SELECT a.doc_id ia, b.doc_id ib FROM t a, t b
          WHERE a.doc_id < b.doc_id
            AND round(len(list_intersect(a.toks, b.toks))::DOUBLE
                / len(list_distinct(list_concat(a.toks, b.toks))), 6) >= 0.9),
        edges AS (SELECT ia u, ib v FROM pairs
                  UNION ALL SELECT ib, ia FROM pairs),
        reach(node, r) AS (
          SELECT doc_id, doc_id FROM t
          UNION
          SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.node)
        SELECT node AS doc_id, min(r) AS cluster_rep FROM reach GROUP BY node
        """
        ).fetchall()
    }
    assert got == exp


def test_pagerank_matches_iterative_oracle(spark):
    """Fixed-iteration PageRank vs a DuckDB k-step CTE chain oracle on
    a small digraph (r4)."""
    import duckdb

    from sparkall_spark.operators.graph import pagerank

    EDGES = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3)]
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {
        r["node"]: r["rank"]
        for r in pagerank(edges, iters=3, checkpoint_every=100).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE e(src INT, dst INT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", EDGES)
    oracle = con.execute(
        """
        WITH nodes AS (SELECT DISTINCT src AS node FROM e
                       UNION SELECT DISTINCT dst FROM e),
        deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
        r0 AS (SELECT node, 1.0 / (SELECT count(*) FROM nodes) AS rank
               FROM nodes),
        r1 AS (SELECT n.node, 0.15 / (SELECT count(*) FROM nodes)
                      + 0.85 * coalesce(sum(r0.rank / deg.d), 0) AS rank
               FROM nodes n
               LEFT JOIN e ON e.dst = n.node
               LEFT JOIN r0 ON r0.node = e.src
               LEFT JOIN deg ON deg.src = e.src
               GROUP BY n.node),
        r2 AS (SELECT n.node, 0.15 / (SELECT count(*) FROM nodes)
                      + 0.85 * coalesce(sum(r1.rank / deg.d), 0) AS rank
               FROM nodes n
               LEFT JOIN e ON e.dst = n.node
               LEFT JOIN r1 ON r1.node = e.src
               LEFT JOIN deg ON deg.src = e.src
               GROUP BY n.node),
        r3 AS (SELECT n.node, 0.15 / (SELECT count(*) FROM nodes)
                      + 0.85 * coalesce(sum(r2.rank / deg.d), 0) AS rank
               FROM nodes n
               LEFT JOIN e ON e.dst = n.node
               LEFT JOIN r2 ON r2.node = e.src
               LEFT JOIN deg ON deg.src = e.src
               GROUP BY n.node)
        SELECT node, rank FROM r3
        """
    ).fetchall()
    con.close()
    want = dict(oracle)
    assert set(got) == set(want)
    for node, rank in want.items():
        assert abs(got[node] - rank) < 1e-12, node
    # node 3 has the most in-links -> highest rank; dangling node 4
    # keeps teleport mass only -> lowest
    order = sorted(got, key=got.get, reverse=True)
    assert order[0] == 3 and order[-1] == 4


# --- directed reachability (r5) -------------------------------------------

def test_reachable_from_matches_recursive_cte(spark, duck):
    from sparkall_spark.operators.graph import reachable_from
    from tests.conftest import assert_matches_oracle

    edges = spark.range(97).selectExpr(
        "id AS src", "CAST((id * 2) % 97 AS BIGINT) AS dst"
    ).unionByName(
        spark.range(97).selectExpr(
            "id AS src", "CAST((id * 3 + 1) % 97 AS BIGINT) AS dst"
        )
    )
    seeds = spark.createDataFrame([(0,), (5,)], "node long")
    out = reachable_from(edges, seeds).selectExpr(
        "node", "CAST(hops AS BIGINT) AS hops"
    )
    sql = """
WITH RECURSIVE e AS (
  SELECT i AS src, (i * 2) % 97 AS dst FROM range(0, 97) t(i)
  UNION ALL
  SELECT i, (i * 3 + 1) % 97 FROM range(0, 97) t(i)),
r(node, hops) AS (
  SELECT * FROM (VALUES (0, 0), (5, 0)) s(node, hops)
  UNION ALL
  SELECT e.dst, r.hops + 1 FROM r JOIN e ON e.src = r.node
  WHERE r.hops < 20)
SELECT CAST(node AS BIGINT) AS node, CAST(min(hops) AS BIGINT) AS hops
FROM r GROUP BY node
"""
    assert_matches_oracle(out, duck, sql)


def test_reachable_from_max_hops_and_unreachable(spark):
    from sparkall_spark.operators.graph import reachable_from

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    full = {r["node"]: r["hops"] for r in reachable_from(edges, seeds).collect()}
    assert full == {1: 0, 2: 1, 3: 2, 4: 3}  # 10/11 unreachable
    capped = {
        r["node"]: r["hops"]
        for r in reachable_from(edges, seeds, max_hops=2).collect()
    }
    assert capped == {1: 0, 2: 1, 3: 2}


def test_triangle_count_exact_vs_duckdb(spark, duck, sf_dir):
    """Degree-oriented triangle counting equals the brute-force SQL
    triple join on a derived graph over real data: connect events whose
    user ids differ by 1 or 2 (guaranteed triangles)."""
    from pyspark.sql import functions as F

    from sparkall_spark.operators.graph import triangle_count

    users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(F.col("user_id").cast("bigint").alias("u"))
        .distinct()
    )
    edges = (
        users.alias("a")
        .join(
            users.alias("b"),
            (F.col("b.u") - F.col("a.u")).isin(1, 2),
        )
        .select(F.col("a.u").alias("id_a"), F.col("b.u").alias("id_b"))
    )
    got = triangle_count(edges).first()["n_triangles"]
    want = duck.execute(
        """
        WITH u AS (SELECT DISTINCT user_id AS n FROM events),
        e AS (SELECT a.n AS x, b.n AS y FROM u a JOIN u b
              ON b.n - a.n IN (1, 2))
        SELECT count(*) FROM e e1
        JOIN e e2 ON e2.x = e1.x AND e2.y > e1.y
        JOIN e e3 ON e3.x = e1.y AND e3.y = e2.y
        """
    ).fetchone()[0]
    assert got == want > 0
    # per-node corners sum to 3 * total
    per = triangle_count(edges, per_node=True)
    assert per.agg(F.sum("n_triangles")).first()[0] == 3 * got


def test_triangle_count_canonicalization_and_plan(spark):
    from pyspark.sql import functions as F

    from sparkall_spark.operators.graph import triangle_count

    # duplicates, reversed edges, and self loops must not change counts
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3), (3, 4)],
        ["id_a", "id_b"],
    )
    out = triangle_count(edges)
    assert out.first()["n_triangles"] == 1
    per = {
        r["node"]: r["n_triangles"]
        for r in triangle_count(edges, per_node=True).collect()
    }
    assert per == {1: 1, 2: 1, 3: 1}
    # no cartesian product, no window: equi-joins only
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "Window" not in plan


def test_clustering_coefficient(spark):
    from sparkall_spark.operators.graph import clustering_coefficient

    # triangle 1-2-3 plus a pendant 3-4: coeff(1)=coeff(2)=1,
    # coeff(3)=2*1/(3*2)=1/3, coeff(4)=0 (degree 1)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], ["id_a", "id_b"]
    )
    got = {
        r["node"]: (r["degree"], r["n_triangles"], r["coeff"])
        for r in clustering_coefficient(edges).collect()
    }
    assert got == {
        1: (2, 1, 1.0),
        2: (2, 1, 1.0),
        3: (3, 1, round(1 / 3, 6)),
        4: (1, 0, 0.0),
    }


def test_connected_components_releases_checkpoint_storage(spark):
    """r11: every round eagerly localCheckpoints; the previous round's
    blocks must be explicitly released (DataFrame.unpersist cannot free
    checkpoint storage), and release_caches() must free the FINAL
    frame's blocks via the registered checkpoint-aware releasable —
    peak pinned label tables is 2, end state is 0 (+ nothing leaked
    across entries in a long session)."""
    from pyspark.sql import functions as F

    from sparkall_spark.operators._cache import release_caches
    from sparkall_spark.operators.graph import connected_components

    sc = spark.sparkContext
    release_caches()

    def n_persisted():
        return len(sc._jsc.sc().getRDDStorageInfo())

    base = n_persisted()
    # a 12-node path graph: diameter 11 (within max_iter) still forces
    # many propagation rounds, each with its own checkpoint
    edges = spark.range(11).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    comps = connected_components(edges)
    rows = comps.collect()
    assert {r["comp"] for r in rows} == {0} and len(rows) == 12
    # after the loop: the final labels checkpoint + the edges persist
    # have been released/unpersisted except the final frame (registered
    # for teardown) — never an accumulation of per-round copies
    assert n_persisted() <= base + 2
    release_caches()
    assert n_persisted() <= base


# --- k-core decomposition (r12) -------------------------------------------

def _py_kcore(edges, k):
    """Reference peeling in plain Python (the textbook loop)."""
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    changed = True
    while changed:
        changed = False
        for n in [n for n, nb in adj.items() if len(nb) < k]:
            for m in adj.pop(n):
                adj[m].discard(n)
            changed = True
    return {n: len(nb) for n, nb in adj.items()}


def test_k_core_vs_python_peeling(spark):
    from sparkall_spark.operators.graph import k_core

    # triangle {1,2,3} + pendant chain 3-4-5 + isolated pair 6-7:
    # 2-core = the triangle only
    EDGES = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (6, 7), (2, 1)]
    edges = spark.createDataFrame(EDGES, ["id_a", "id_b"])
    got = {
        r["node"]: r["core_degree"] for r in k_core(edges, k=2).collect()
    }
    assert got == _py_kcore(EDGES, 2) == {1: 2, 2: 2, 3: 2}
    # k=1 keeps every non-isolated node; k=3 empties this graph
    assert {
        r["node"] for r in k_core(edges, k=1).collect()
    } == {1, 2, 3, 4, 5, 6, 7}
    assert k_core(edges, k=3).count() == 0

    import pytest

    with pytest.raises(ValueError, match="k must be"):
        k_core(edges, k=0)


def test_k_core_deep_peel_and_duckdb_mirror(spark, duck):
    """A peel that takes several rounds (pendant chain collapsing into
    the core) must match the DuckDB recursive-CTE mirror — the same
    two-reference working-table form the e22 'kcore' oracle leg uses."""
    from pyspark.sql import functions as F

    from sparkall_spark.operators.graph import k_core

    # expander-ish functional graph over 60 nodes: n -> 2n+1, 3n+5 (mod 60)
    edges = spark.range(60).select(
        F.col("id").alias("id_a"),
        F.explode(
            F.array((2 * F.col("id") + 1) % 60, (3 * F.col("id") + 5) % 60)
        ).alias("id_b"),
    )
    got = {
        (r["node"], r["core_degree"])
        for r in k_core(edges, k=3).collect()
    }
    want = {
        tuple(r)
        for r in duck.execute(
            """
WITH RECURSIVE
eraw AS (
  SELECT i AS a, (2*i+1) % 60 AS b FROM range(0, 60) t(i)
  UNION ALL SELECT i, (3*i+5) % 60 FROM range(0, 60) t(i)),
e AS (SELECT DISTINCT least(a,b) AS u, greatest(a,b) AS v
      FROM eraw WHERE a <> b),
adj AS (SELECT node, list(nbr) AS nbrs FROM (
    SELECT u AS node, v AS nbr FROM e UNION ALL SELECT v, u FROM e)
    GROUP BY node),
alive(round, node, nbrs) AS (
  SELECT 0, node, nbrs FROM adj
  UNION ALL
  SELECT a.round + 1, a.node,
         list_filter(a.nbrs,
                     x -> NOT coalesce(list_contains(r.removed, x), FALSE))
  FROM alive a CROSS JOIN
       (SELECT list(b.node) AS removed FROM alive b
        WHERE len(b.nbrs) < 3) r
  WHERE a.round < 40 AND len(a.nbrs) >= 3)
SELECT node, len(nbrs) FROM alive WHERE round = 40
            """
        ).fetchall()
    }
    assert got == want and len(got) > 0

    # sanity: every core member keeps >= k in-core neighbors
    assert all(d >= 3 for _, d in got)


def test_clustering_coefficient_accepts_precomputed_triangles(spark):
    """r12: passing triangles= must give the identical result to the
    internal recompute (the e30 entry shares one wedge join between
    the 'tri' and 'cc' legs)."""
    from sparkall_spark.operators.graph import (
        clustering_coefficient,
        triangle_count,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3)], ["id_a", "id_b"]
    )
    tri_pn = triangle_count(edges, per_node=True)
    a = sorted(map(tuple, clustering_coefficient(edges).collect()))
    b = sorted(
        map(
            tuple,
            clustering_coefficient(edges, triangles=tri_pn).collect(),
        )
    )
    assert a == b


def test_triangle_count_plan_stays_collapsed(spark):
    """r12 regression tripwire: the triangle plan recomputed its
    canonical/oriented edge lists once per reference (up to ~9
    executions of the distinct/degree/orient chain per query; e30 read
    7.3 s on a 150-node graph).  Pin the fix: both intermediates are
    persisted (InMemoryTableScan present) and the per-node plan stays
    collapsed — a bounded Exchange count instead of the pre-fix
    explosion (30+ exchanges in the executed per-node plan)."""
    from sparkall_spark.operators._cache import release_caches
    from sparkall_spark.operators.graph import triangle_count

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3), (4, 1)],
        ["id_a", "id_b"],
    )
    release_caches()  # start from a clean cache registry
    try:
        out = triangle_count(edges, per_node=True)
        out.count()  # materialize the persisted intermediates
        plan = out._jdf.queryExecution().executedPlan().toString()
        # e and fwd are cached (every reference is a cache read, not a
        # recompute of the distinct/degree/orient chain)...
        assert "InMemoryTableScan" in plan
        infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
        assert len(infos) >= 2, f"expected e+fwd cached, got {len(infos)}"
        # ...and the self-unionAll fan-outs are gone (degrees and
        # corners are single explode passes — a Union node here means
        # a branch re-reads its input per leg again)
        assert "Union" not in plan
    finally:
        # ADVICE r12: always release — a failed assert above must not
        # leak the persisted e/fwd frames into later tests
        release_caches()
