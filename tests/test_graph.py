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
