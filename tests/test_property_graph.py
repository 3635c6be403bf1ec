"""Property-based graph-operator fuzzing (r12): random small edge
lists vs plain-Python references.  The distributed implementations are
shape-specialized (degree orientation, min-label propagation, peeling
with converge_stat), so random graphs — self loops, duplicates,
reversed duplicates, disconnected pieces — probe exactly the
canonicalization and fixpoint corners fixtures tend to miss.

Example counts are small: every example spins several Spark jobs, and
the point is corner coverage, not volume (the per-op deterministic
tests in test_graph.py pin the big shapes)."""

from collections import defaultdict

from hypothesis import HealthCheck, given, settings, strategies as st


edge_st = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)),
    min_size=1,
    max_size=16,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _py_components(edges):
    """Union-find, labels = min node id per component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _py_triangles(edges):
    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    nodes = sorted(adj)
    count = 0
    for i, a in enumerate(nodes):
        for b in (n for n in nodes[i + 1:] if n in adj[a]):
            count += sum(
                1 for c in nodes if c > b and c in adj[a] and c in adj[b]
            )
    return count


@settings(**_SETTINGS)
@given(edges=edge_st)
def test_connected_components_matches_union_find(spark, edges):
    from sparkall_spark.operators._cache import release_caches
    from sparkall_spark.operators.graph import connected_components

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["node"]: r["comp"] for r in connected_components(df).collect()
    }
    release_caches()
    assert got == _py_components(edges)


@settings(**_SETTINGS)
@given(edges=edge_st)
def test_triangle_count_matches_bruteforce(spark, edges):
    from sparkall_spark.operators.graph import triangle_count

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    assert triangle_count(df).first()["n_triangles"] == _py_triangles(edges)


@settings(**_SETTINGS)
@given(edges=edge_st, k=st.integers(1, 4))
def test_k_core_matches_python_peeling(spark, edges, k):
    from sparkall_spark.operators._cache import release_caches
    from sparkall_spark.operators.graph import k_core
    from tests.test_graph import _py_kcore

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["node"]: r["core_degree"] for r in k_core(df, k=k).collect()
    }
    release_caches()
    assert got == _py_kcore(edges, k)
