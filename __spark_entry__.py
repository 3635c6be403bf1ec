"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` covers SURVEY.md §2's operator inventory via the SPARQL
engine (q-entries, incl. the ported BSBM evaluation shapes and two
entries routed through the single-SQL backend) plus the
LLM-data-pipeline extension operators (e-entries: dedup, similarity
search, text analysis, RDF ingestion, temporal joins, OLAP rollups).
EVERY entry has a DuckDB oracle in ``oracle_sql()`` — including the
approximate families (simhash/ngram/LSH/IVF), whose blocking logic is
mirrored literally in SQL.  The registry is kept at exactly 50 entries
(the driver's correctness-file cap) so every operator family retains a
driver-checked row.

Column-name discipline: the driver sorts columns by name before value
hashing, so every computed column is aliased identically in the Spark
query and its oracle; float aggregates are rounded on BOTH sides;
computed integers are cast to bigint on the Spark side to match
DuckDB's 64-bit count/len results.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from sparkall_spark.engine import Engine
from sparkall_spark.fixtures import NS, PREFIX_BLOCK, load_table, tpch_mappings
from sparkall_spark.functions import text as X
from sparkall_spark.mappings import EntityMapping, MappingIndex
from sparkall_spark.operators import dedup as D, similarity as S
from sparkall_spark.streaming import windows as W


def _tmpdir(prefix: str) -> str:
    """mkdtemp + atexit rmtree.  Entries that write-then-lazily-read a
    scratch dataset (z-order copy, postings index, N-Triples, WARC)
    cannot rmtree in-entry — the returned DataFrame still reads the
    dir — so cleanup is deferred to interpreter exit, strictly after
    every consumer (r11 ADVICE: repeated SELFCHECK/bench rounds were
    accumulating one parquet copy per run in /tmp)."""
    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


def _engine(spark: SparkSession, sf_dir: str) -> Engine:
    return Engine(spark, tpch_mappings(sf_dir))


def _sparql(text: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _engine(spark, sf_dir).sparql(PREFIX_BLOCK + text)

    return run


# ---------------------------------------------------------------------------
# §2 parity queries (SPARQL fragment -> engine -> DataFrame)
# ---------------------------------------------------------------------------

SPARQL_QUERIES: dict[str, tuple[str, str | None]] = {
    # scan + projection + filter + DISTINCT + multi-key ORDER BY + LIMIT
    "q01_filter_order_limit": (
        """
        SELECT DISTINCT ?p ?name ?size WHERE {
            ?p a sa:Part ; sa:name ?name ; sa:size ?size .
            FILTER (?size > 30)
        }
        ORDER BY ?name DESC(?size) ?p
        LIMIT 50
        """,
        """
        SELECT DISTINCT p_partkey AS p, p_name AS name, p_size AS size
        FROM part WHERE p_size > 30
        ORDER BY p_name, p_size DESC, p LIMIT 50
        """,
    ),
    # 3-star join + numeric and string filters (mixed ops).
    # Runs through backend="sql" (the reference's Presto single-SQL
    # path analog) — see SQL_BACKEND_KEYS below.  The plain 2-star
    # join shape it subsumes stays covered by tests/test_sqlgen.py.
    "q03_join_filters": (
        """
        SELECT ?cname ?qty ?totalprice WHERE {
            ?l a sa:Lineitem ; sa:order ?o ; sa:quantity ?qty .
            ?o a sa:Orders ; sa:customer ?c ; sa:totalprice ?totalprice .
            ?c a sa:Customer ; sa:name ?cname ; sa:mktsegment ?seg .
            FILTER (?qty > 45)
            FILTER (?totalprice > 100000)
            FILTER (?seg = "BUILDING")
        }
        """,
        """
        SELECT c_name AS cname, l_quantity AS qty, o_totalprice AS totalprice
        FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
        WHERE l_quantity > 45 AND o_totalprice > 100000
          AND c_mktsegment = 'BUILDING'
        """,
    ),
    # 5-star chain join (lineitem-orders-customer-nation-region)
    "q04_join_five_stars": (
        """
        SELECT ?cname ?nname ?rname ?totalprice ?qty WHERE {
            ?l a sa:Lineitem ; sa:order ?o ; sa:quantity ?qty .
            ?o a sa:Orders ; sa:customer ?c ; sa:totalprice ?totalprice .
            ?c a sa:Customer ; sa:name ?cname ; sa:nation ?n .
            ?n a sa:Nation ; sa:name ?nname ; sa:region ?r .
            ?r a sa:Region ; sa:name ?rname .
            FILTER (?qty > 45)
            FILTER (?totalprice > 100000)
        }
        """,
        """
        SELECT c_name AS cname, n_name AS nname, r_name AS rname,
               o_totalprice AS totalprice, l_quantity AS qty
        FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
        WHERE l_quantity > 45 AND o_totalprice > 100000
        """,
    ),
    # GROUP BY + SUM/AVG/MIN/MAX/COUNT with deterministic aliases
    "q05_groupby_aggregates": (
        """
        SELECT ?flag ?status (SUM(?qty) AS ?sum_qty) (AVG(?price) AS ?avg_price)
               (MIN(?disc) AS ?min_disc) (MAX(?disc) AS ?max_disc)
               (COUNT(*) AS ?n) (COUNT(DISTINCT ?disc) AS ?n_disc)
        WHERE {
            ?l a sa:Lineitem ; sa:returnflag ?flag ; sa:linestatus ?status ;
               sa:quantity ?qty ; sa:extendedprice ?price ; sa:discount ?disc .
        }
        GROUP BY ?flag ?status
        """,
        None,  # aggregate rounding handled by wrapper below
    ),
    # FILTER regex with LIKE semantics (reference: SparkExecutor.scala:
    # 180-182) + rlike true-regex extension, both on a pattern that
    # matches rows (the fixture's part names are '<adj> <noun>' pairs)
    # BIND computed column (extension; plans/exprs.py) + the regex
    # LIKE / rlike filter family (LIKE also exercised by q30_bsbm_q6)
    "q06_bind_rlike": (
        """
        SELECT ?name ?disc_price WHERE {
            ?l a sa:Lineitem ; sa:extendedprice ?ep ; sa:discount ?d ;
               sa:part ?p .
            ?p a sa:Part ; sa:name ?name .
            FILTER regex(?name, "%ol%")
            FILTER rlike(?name, "^[a-z]+ [a-z]+$")
            BIND(ROUND(?ep * (1 - ?d), 6) AS ?disc_price)
            FILTER (?disc_price > 50000)
        }
        """,
        # 6dp, not 2dp: extendedprice/discount carry <=2 decimal digits
        # each, so the product has <=4 -- rounding at 6 is tie-free and
        # bit-identical across Spark (HALF_UP decimal) and DuckDB
        # (float-multiply) rounding; 2dp landed on .xx5 ties (r3 verdict).
        """
        SELECT p_name AS name,
               round(l_extendedprice * (1 - l_discount), 6) AS disc_price
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE '%ol%'
          AND regexp_matches(p_name, '^[a-z]+ [a-z]+$')
          AND round(l_extendedprice * (1 - l_discount), 6) > 50000
        """,
    ),
    # global aggregate without GROUP BY
    "q16_global_aggregate": (
        """
        SELECT (MIN(?bal) AS ?min_bal) (MAX(?bal) AS ?max_bal)
               (COUNT(*) AS ?n)
        WHERE { ?c a sa:Customer ; sa:acctbal ?bal . }
        """,
        """
        SELECT min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal,
               count(*) AS n
        FROM customer
        """,
    ),
    # timestamp-typed filters
    "q17_timestamp_filter": (
        """
        SELECT ?o ?d WHERE {
            ?o a sa:Orders ; sa:orderdate ?d .
            FILTER (?d >= "1996-06-01")
            FILTER (?d < "1996-07-01")
        }
        """,
        """
        SELECT o_orderkey AS o, o_orderdate AS d FROM orders
        WHERE o_orderdate >= '1996-06-01' AND o_orderdate < '1996-07-01'
        """,
    ),
    # SPARQL UNION across two entities (extension; the reference
    # excluded UNION queries from its evaluation, evaluation/README.md:9)
    # + property-path alternation (a|b), which desugars into further
    # UNION branches at parse time (plans/parser.py, r4)
    "q19_sparql_union": (
        """
        SELECT ?name WHERE {
            { ?c a sa:Customer ; sa:name ?name ; sa:acctbal ?bal .
              FILTER (?bal > 9000) }
            UNION
            { ?s a sa:Supplier ; sa:name ?name . }
            UNION
            { ?p a sa:Part ; (sa:name|sa:brand) ?name . }
        }
        """,
        """
        SELECT c_name AS name FROM customer WHERE c_acctbal > 9000
        UNION ALL SELECT s_name AS name FROM supplier
        UNION ALL SELECT p_name AS name FROM part
        UNION ALL SELECT p_brand AS name FROM part
        """,
    ),
    # GROUP BY + HAVING (extension; absent from the reference grammar)
    "q20_having": (
        """
        SELECT ?flag (SUM(?qty) AS ?sum_qty) WHERE {
            ?l a sa:Lineitem ; sa:returnflag ?flag ; sa:quantity ?qty .
        }
        GROUP BY ?flag
        HAVING (SUM(?qty) > 30000)
        """,
        None,  # rounded by wrapper below
    ),
    # SPARQL MINUS -> anti-join on shared variables (extension)
    # MINUS (anti-join) + FILTER EXISTS (semi-join) in ONE pattern
    # (extensions; merged r4 from the former q21/q22 twins to free a
    # registry slot for e23 — both negation forms still driver-gated):
    # customers WITH at least one order but NONE above the threshold
    "q21_minus_exists": (
        """
        SELECT ?name WHERE {
            ?c a sa:Customer ; sa:name ?name .
            FILTER EXISTS { ?o a sa:Orders ; sa:customer ?c . }
            MINUS { ?o2 a sa:Orders ; sa:customer ?c ; sa:totalprice ?tp .
                    FILTER (?tp > 400000) }
        }
        """,
        """
        SELECT c_name AS name FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders)
          AND c_custkey NOT IN
            (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        """,
    ),
    # VALUES inline data + OFFSET paging (extensions)
    "q23_values_offset": (
        """
        SELECT ?name ?seg WHERE {
            ?c a sa:Customer ; sa:name ?name ; sa:mktsegment ?seg .
            VALUES ?seg { "BUILDING" "MACHINERY" }
        }
        ORDER BY ?name
        LIMIT 20 OFFSET 10
        """,
        """
        SELECT c_name AS name, c_mktsegment AS seg FROM customer
        WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        ORDER BY name LIMIT 20 OFFSET 10
        """,
    ),
    # subject-variable projection (star ID column) + a { SELECT ... }
    # subquery (SPARQL 1.1 §12, r4): per-customer order count computed
    # independently and joined back on the shared ?c
    "q13_subject_projection": (
        """
        SELECT ?o ?totalprice ?n WHERE {
            ?o a sa:Orders ; sa:totalprice ?totalprice ; sa:customer ?c .
            { SELECT ?c (COUNT(*) AS ?n) WHERE {
                ?o2 a sa:Orders ; sa:customer ?c . } GROUP BY ?c }
            FILTER (?totalprice > 400000)
        }
        """,
        """
        SELECT o_orderkey AS o, o_totalprice AS totalprice, n
        FROM orders JOIN
          (SELECT o_custkey AS k, count(*) AS n FROM orders GROUP BY 1) s
          ON o_custkey = k
        WHERE o_totalprice > 400000
        """,
    ),
    # OPTIONAL -> left outer join, with a FILTER *inside* the OPTIONAL
    # block: constrains only the optional star pre-join (SPARQL
    # left-join semantics == SQL LEFT JOIN ... ON key AND cond); a
    # filter binding a mandatory-star var in there is a parse error
    # (tests/test_parser.py::test_optional_filter_on_mandatory_var_rejected)
    # OPTIONAL incl. NESTED OPTIONAL (r4): left-deep LEFT JOIN chain;
    # the inner star's join key is NULL wherever the outer optional
    # failed, so lineitems can only attach to matched orders.  Block
    # FILTERs hoist pre-join (they cannot drop customers / matched
    # orders).  Flat OPTIONAL stays driver-covered by q31/q32 (BSBM
    # Q7/Q8).  parser.py:_collect_optional_blocks
    "q10_nested_optional": (
        """
        SELECT ?name ?totalprice ?qty WHERE {
            ?c a sa:Customer ; sa:name ?name .
            OPTIONAL { ?o a sa:Orders ; sa:customer ?c ; sa:totalprice ?totalprice .
                       FILTER (?totalprice > 200000)
                       OPTIONAL { ?l a sa:Lineitem ; sa:order ?o ; sa:quantity ?qty .
                                  FILTER (?qty > 45) } }
        }
        """,
        """
        SELECT c_name AS name, o.o_totalprice AS totalprice,
               l.l_quantity AS qty
        FROM customer
        LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 200000) AS o
          ON o.o_custkey = c_custkey
        LEFT JOIN (SELECT * FROM lineitem WHERE l_quantity > 45) AS l
          ON l.l_orderkey = o.o_orderkey
        """,
    ),
    # TRANSFORM DSL on join columns: chained fns on the left side
    # (toInt -> scl -> skp, the full §2.8 chain semantics: skp drops
    # rows where the TRANSFORMED value equals the literal) + scl on the
    # right side — merges r3's q11 (scl) and q12 (skp) entries
    "q11_transform_chain": (
        """
        SELECT ?cname ?nname WHERE {
            ?c a sa:Customer ; sa:name ?cname ; sa:nation ?n .
            ?n a sa:Nation ; sa:name ?nname .
        }
        TRANSFORM(?c?n.l.toInt.scl(+1).skp(4) && ?c?n.r.toInt.scl(+1))
        """,
        """
        SELECT c_name AS cname, n_name AS nname
        FROM customer JOIN nation
          ON (CAST(c_nationkey AS INT) + 1) = (CAST(n_nationkey AS INT) + 1)
        WHERE (CAST(c_nationkey AS INT) + 1) <> 4
        """,
    ),
    # ASK query form (SPARQL 1.1 §16.3): one boolean row, limit(1)
    # existence probe — driver-gates the r3 pytest-only surface
    "q12_ask_exists": (
        """
        ASK { ?c a sa:Customer ; sa:acctbal ?b ; sa:mktsegment "BUILDING" .
              FILTER (?b > 9000) }
        """,
        """
        SELECT EXISTS(SELECT 1 FROM customer
                      WHERE c_acctbal > 9000
                        AND c_mktsegment = 'BUILDING') AS ask
        """,
    ),
    # ---------------------------------------------------------------
    # BSBM evaluation-query shapes (the reference's de-facto contract,
    # evaluation/input_files/queries/Q1..Q10.sparql) ported onto the
    # TPC-H fixtures: Product->Part, Producer->Supplier(+Nation for
    # country), Review->Lineitem (reviewFor == the part FK),
    # Offer->Orders, Reviewer->Customer.
    # ---------------------------------------------------------------
    # Q1: 3-star join, numeric filter, DISTINCT + ORDER + LIMIT
    "q25_bsbm_q1": (
        """
        SELECT DISTINCT ?label ?value WHERE {
            ?p a sa:Part ; sa:name ?label ; sa:size ?value .
            ?l a sa:Lineitem ; sa:part ?p ; sa:supplier ?s .
            ?s a sa:Supplier ; sa:name ?sname .
            FILTER (?value > 1)
        }
        ORDER BY ?label ?value
        LIMIT 10
        """,
        """
        SELECT DISTINCT p_name AS label, p_size AS value
        FROM part JOIN lineitem ON l_partkey = p_partkey
                  JOIN supplier ON l_suppkey = s_suppkey
        WHERE p_size > 1
        ORDER BY label, value LIMIT 10
        """,
    ),
    # Q2: wide many-attribute projection, 2 stars, no filters
    "q26_bsbm_q2": (
        """
        SELECT ?label ?brand ?type ?size ?price ?qty ?eprice WHERE {
            ?p a sa:Part ; sa:name ?label ; sa:brand ?brand ; sa:type ?type ;
               sa:size ?size ; sa:retailprice ?price .
            ?l a sa:Lineitem ; sa:part ?p ; sa:quantity ?qty ;
               sa:extendedprice ?eprice .
        }
        """,
        """
        SELECT p_name AS label, p_brand AS brand, p_type AS type,
               p_size AS size, p_retailprice AS price,
               l_quantity AS qty, l_extendedprice AS eprice
        FROM part JOIN lineitem ON l_partkey = p_partkey
        """,
    ),
    # Q3: two numeric filters (> and <), subject projection, ORDER+LIMIT
    "q27_bsbm_q3": (
        """
        SELECT ?p ?label ?size ?price WHERE {
            ?p a sa:Part ; sa:name ?label ; sa:size ?size ; sa:retailprice ?price .
            ?l a sa:Lineitem ; sa:part ?p .
            FILTER (?size > 20)
            FILTER (?price < 1500)
        }
        ORDER BY ?label ?p ?size ?price
        LIMIT 10
        """,
        """
        SELECT p_partkey AS p, p_name AS label, p_size AS size,
               p_retailprice AS price
        FROM part JOIN lineitem ON l_partkey = p_partkey
        WHERE p_size > 20 AND p_retailprice < 1500
        ORDER BY label, p, size, price LIMIT 10
        """,
    ),
    # Q4: 4+ stars incl. the country hop (supplier -> nation)
    "q28_bsbm_q4": (
        """
        SELECT DISTINCT ?label ?c ?brand ?size WHERE {
            ?p a sa:Part ; sa:name ?label ; sa:brand ?brand ; sa:size ?size .
            ?l a sa:Lineitem ; sa:part ?p ; sa:supplier ?s ; sa:order ?o .
            ?s a sa:Supplier ; sa:nation ?n .
            ?n a sa:Nation ; sa:name ?c .
            ?o a sa:Orders .
            FILTER (?size > 25)
        }
        ORDER BY ?label ?c ?brand ?size
        LIMIT 10
        """,
        """
        SELECT DISTINCT p_name AS label, n_name AS c, p_brand AS brand,
               p_size AS size
        FROM part JOIN lineitem ON l_partkey = p_partkey
                  JOIN supplier ON l_suppkey = s_suppkey
                  JOIN nation ON s_nationkey = n_nationkey
                  JOIN orders ON l_orderkey = o_orderkey
        WHERE p_size > 25
        ORDER BY label, c, brand, size LIMIT 10
        """,
    ),
    # Q5: inequality (!=) + two range filters, DISTINCT + ORDER + LIMIT
    "q29_bsbm_q5": (
        """
        SELECT DISTINCT ?label ?size ?price WHERE {
            ?p a sa:Part ; sa:name ?label ; sa:size ?size ; sa:retailprice ?price .
            ?l a sa:Lineitem ; sa:part ?p ; sa:order ?o .
            ?o a sa:Orders .
            FILTER (?size < 40)
            FILTER (?label != "blue rod")
            FILTER (?price < 1600)
        }
        ORDER BY ?label ?size ?price
        LIMIT 5
        """,
        """
        SELECT DISTINCT p_name AS label, p_size AS size, p_retailprice AS price
        FROM part JOIN lineitem ON l_partkey = p_partkey
                  JOIN orders ON l_orderkey = o_orderkey
        WHERE p_size < 40 AND p_name <> 'blue rod' AND p_retailprice < 1600
        ORDER BY label, size, price LIMIT 5
        """,
    ),
    # Q6: regex filter (reference semantics: SQL LIKE wildcards)
    "q30_bsbm_q6": (
        """
        SELECT ?label WHERE {
            ?p a sa:Part ; sa:name ?label .
            ?l a sa:Lineitem ; sa:part ?p ; sa:order ?o .
            ?o a sa:Orders .
            FILTER regex(?label, "%bolt%")
        }
        """,
        """
        SELECT p_name AS label
        FROM part JOIN lineitem ON l_partkey = p_partkey
                  JOIN orders ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%bolt%'
        """,
    ),
    # Q7: 4-star join + subject-equality filter + numeric filter
    "q31_bsbm_q7": (
        """
        SELECT ?label ?totalprice ?cname ?qty ?disc ?p WHERE {
            ?p a sa:Part ; sa:name ?label .
            ?l a sa:Lineitem ; sa:part ?p ; sa:order ?o ; sa:quantity ?qty ;
               sa:discount ?disc .
            ?o a sa:Orders ; sa:customer ?c ; sa:totalprice ?totalprice .
            ?c a sa:Customer ; sa:name ?cname .
            FILTER (?totalprice > 5000)
            FILTER (?p = 9)
        }
        """,
        """
        SELECT p_name AS label, o_totalprice AS totalprice, c_name AS cname,
               l_quantity AS qty, l_discount AS disc, p_partkey AS p
        FROM part JOIN lineitem ON l_partkey = p_partkey
                  JOIN orders ON l_orderkey = o_orderkey
                  JOIN customer ON o_custkey = c_custkey
        WHERE o_totalprice > 5000 AND p_partkey = 9
        """,
    ),
    # Q8: equality filter + DESC ORDER + LIMIT, attribute-less star
    "q32_bsbm_q8": (
        """
        SELECT DISTINCT ?flag ?status ?qty ?price ?ship ?p WHERE {
            ?p a sa:Part .
            ?l a sa:Lineitem ; sa:part ?p ; sa:returnflag ?flag ;
               sa:linestatus ?status ; sa:quantity ?qty ;
               sa:extendedprice ?price ; sa:shipdate ?ship .
            FILTER (?p = 9)
        }
        ORDER BY DESC(?ship) ?qty ?price ?flag ?status
        LIMIT 9
        """,
        """
        SELECT DISTINCT l_returnflag AS flag, l_linestatus AS status,
               l_quantity AS qty, l_extendedprice AS price,
               l_shipdate AS ship, p_partkey AS p
        FROM part JOIN lineitem ON l_partkey = p_partkey
        WHERE p_partkey = 9
        ORDER BY ship DESC, qty, price, flag, status LIMIT 9
        """,
    ),
    # Q10: <= filter + string equality + ORDER + LIMIT
    "q33_bsbm_q10": (
        """
        SELECT DISTINCT ?totalprice ?qty ?date ?c WHERE {
            ?o a sa:Orders ; sa:customer ?cust ; sa:totalprice ?totalprice ;
               sa:orderdate ?date ; sa:orderpriority ?prio .
            ?l a sa:Lineitem ; sa:order ?o ; sa:quantity ?qty .
            ?cust a sa:Customer ; sa:mktsegment ?c ; sa:name ?cname .
            FILTER (?qty <= 7)
            FILTER (?c = "BUILDING")
        }
        ORDER BY ?totalprice ?qty ?date ?c
        LIMIT 10
        """,
        """
        SELECT DISTINCT o_totalprice AS totalprice, l_quantity AS qty,
               o_orderdate AS date, c_mktsegment AS c
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
        WHERE l_quantity <= 7 AND c_mktsegment = 'BUILDING'
        ORDER BY totalprice, qty, date, c LIMIT 10
        """,
    ),
    # sequence property path (desugared to a fresh-variable chain,
    # plans/parser.py) + GROUP_CONCAT/SAMPLE aggregate extensions —
    # driver-gate coverage for both round-3 features
    "q34_path_groupconcat": (
        """
        SELECT ?rk (COUNT(*) AS ?n_customers)
               (GROUP_CONCAT(DISTINCT ?seg; SEPARATOR="|") AS ?segments)
               (SAMPLE(?seg) AS ?any_segment)
        WHERE {
            ?c a sa:Customer ; sa:mktsegment ?seg ; sa:nation/sa:region ?rk .
        }
        GROUP BY ?rk ORDER BY ?rk
        """,
        """
        SELECT n_regionkey AS rk, count(*) AS n_customers,
               string_agg(DISTINCT c_mktsegment, '|' ORDER BY c_mktsegment)
                 AS segments,
               min(c_mktsegment) AS any_segment
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_regionkey ORDER BY rk
        """,
    ),
}


def _q24_rml_fno(spark: SparkSession, sf_dir: str) -> DataFrame:
    # mapping-file transform route (reference: Mapper.scala:183-221,
    # mappings_trans.ttl FunctionMap blocks): the RML file binds
    # sa:acctbal through grel:scale(+10) and the nation FK through
    # grel:skip(3); same result as declaring the transforms inline
    from sparkall_spark.fixtures import fno_mappings_ttl
    from sparkall_spark.mappings import load_rml

    with tempfile.NamedTemporaryFile(
        "w", suffix=".ttl", delete=False
    ) as f:
        f.write(fno_mappings_ttl(sf_dir))
        path = f.name
    engine = Engine(spark, load_rml(path))
    return engine.sparql(
        PREFIX_BLOCK
        + """
        SELECT ?cname ?bal ?nname WHERE {
            ?c a sa:Customer ; sa:name ?cname ; sa:acctbal ?bal ; sa:nation ?n .
            ?n a sa:Nation ; sa:name ?nname .
        }
        """
    )


_Q24_ORACLE = """
SELECT c_name AS cname, c_acctbal + 10 AS bal, n_name AS nname
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_nationkey <> 3
"""


def _q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _sparql(SPARQL_QUERIES["q05_groupby_aggregates"][0])(spark, sf_dir)
    return df.select(
        "flag",
        "status",
        F.round("sum_qty", 4).alias("sum_qty"),
        F.round("avg_price", 4).alias("avg_price"),
        "min_disc",
        "max_disc",
        "n",
        "n_disc",
    )


_Q05_ORACLE = """
SELECT l_returnflag AS flag, l_linestatus AS status,
       round(sum(l_quantity), 4) AS sum_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       min(l_discount) AS min_disc, max(l_discount) AS max_disc,
       count(*) AS n, count(DISTINCT l_discount) AS n_disc
FROM lineitem GROUP BY 1, 2
"""


def _q20_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _sparql(SPARQL_QUERIES["q20_having"][0])(spark, sf_dir)
    return df.select("flag", F.round("sum_qty", 4).alias("sum_qty"))


_Q20_ORACLE = """
SELECT l_returnflag AS flag, round(sum(l_quantity), 4) AS sum_qty
FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 30000
"""


def _q08_topk_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + ORDER BY aggregate alias + LIMIT (top-k groups)."""
    df = _engine(spark, sf_dir).sparql(
        PREFIX_BLOCK
        + """
        SELECT ?priority (SUM(?totalprice) AS ?revenue) (COUNT(*) AS ?n)
        WHERE { ?o a sa:Orders ; sa:orderpriority ?priority ;
                   sa:totalprice ?totalprice . }
        GROUP BY ?priority
        ORDER BY DESC(?revenue) ?priority
        LIMIT 3
        """
    )
    return df.select(
        "priority", F.round("revenue", 4).alias("revenue"), "n"
    )


_Q08_ORACLE = """
SELECT o_orderpriority AS priority,
       round(sum(o_totalprice), 4) AS revenue, count(*) AS n
FROM orders GROUP BY 1
ORDER BY sum(o_totalprice) DESC, priority LIMIT 3
"""


def _q09_multisource_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One star, two relevant sources -> unionByName
    (reference: SparkExecutor.scala:113-117)."""
    mappings = [
        EntityMapping(
            name=n,
            source=f"{sf_dir}/supplier.parquet",
            source_type="parquet",
            id_attr="s_suppkey",
            predicates={NS + "name": "s_name", NS + "acctbal": "s_acctbal"},
            class_iri=NS + "Supplier",
        )
        for n in ("SupplierA", "SupplierB")
    ]
    return Engine(spark, MappingIndex(mappings)).sparql(
        PREFIX_BLOCK
        + """
        SELECT ?name ?bal WHERE {
            ?s a sa:Supplier ; sa:name ?name ; sa:acctbal ?bal .
            FILTER (?bal > 0)
        }
        """
    )


_Q09_ORACLE = """
SELECT s_name AS name, s_acctbal AS bal FROM supplier WHERE s_acctbal > 0
UNION ALL
SELECT s_name AS name, s_acctbal AS bal FROM supplier WHERE s_acctbal > 0
"""


def _q14_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation over the events table (batch
    plan identical to the Structured Streaming path)."""
    ev = load_table(spark, sf_dir, "events")
    out = W.tumbling_agg(
        ev,
        "ts",
        "1 hour",
        [
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        ],
        keys=["event_type"],
    )
    return out.select("window_start", "event_type", "n", "sum_value")


_Q14_ORACLE = """
SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start, event_type,
       count(*) AS n, round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""


def _q15_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (session_window) — count sessions per
    user with 30-minute inactivity gap."""
    ev = load_table(spark, sf_dir, "events")
    sessions = W.session_agg(
        ev, "ts", "30 minutes", [F.count("*").alias("n_events")], keys=["user_id"]
    )
    return (
        sessions.groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_sessions"),
            F.sum("n_events").cast("bigint").alias("n_events"),
        )
    )


_Q15_ORACLE = """
WITH ordered AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events)
SELECT user_id, sum(new_session)::BIGINT AS n_sessions,
       count(*) AS n_events
FROM ordered GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# Extension operators (dedup / similarity / text / RDF)
# ---------------------------------------------------------------------------


def _e01_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both EXACT dedup granularities, tagged and unioned (r5): document
    level (hash-groupBy survivors) and substring level — Lee et al.'s
    ExactSubstr re-expressed relationally (operators/substrings.py):
    duplicated 25-token windows ranked once on their content hash, every
    non-first occurrence's span cut, documents rebuilt map-side with one
    O(n) fold.  The span leg emits only documents that actually lost
    tokens (the fixture has real cross-doc verbatim repeats), with n =
    tokens removed; the oracle mirrors the whole construction on literal
    gram CONTENT (no hashes), so engine hash collisions would surface as
    a mismatch.  r6 adds the SENTENCE granularity (operators/dedup.py
    sentence_dedup): global first-occurrence-wins over planted shared
    boilerplate sentences, emitting per-doc removed-sentence counts."""
    from sparkall_spark.operators.dedup import sentence_dedup
    from sparkall_spark.operators.substrings import exact_substring_dedup

    docs = load_table(spark, sf_dir, "documents")
    doc_level = (
        docs.groupBy("text")
        .agg(
            F.min("doc_id").cast("bigint").alias("doc_id"),
            F.count("*").cast("bigint").alias("n"),
        )
        .select(F.lit("doc").alias("level"), "doc_id", "n")
    )
    # min_parallelism=32: the fixture arrives as ONE parquet split, which
    # would serialize the O(n*k) window-hash expansion on one task; a
    # real corpus has thousands of splits and needs no repartition
    span_level = (
        exact_substring_dedup(
            docs.select("doc_id", "text"), k=25, min_parallelism=32
        )
        .filter(F.col("n_removed_tokens") > 0)
        .select(
            F.lit("span").alias("level"),
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.col("n_removed_tokens").cast("bigint").alias("n"),
        )
    )
    # r6: sentence-level leg.  Fixture docs carry no punctuation (each
    # doc is one terminator-less sentence, all distinct), so plant a
    # terminator plus two SHARED boilerplate sentences on deterministic
    # id slices — the dedup then removes every occurrence after the
    # min-(id, pos) first one, and the leg emits per-doc removed counts.
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit("."),
            F.when(
                F.col("doc_id") % 3 == 0, F.lit(" All rights reserved.")
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.lit(" Subscribe to our newsletter."),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    sent_level = (
        sentence_dedup(planted)
        .filter(F.col("n_sentences") > F.col("n_kept"))
        .select(
            F.lit("sent").alias("level"),
            F.col("doc_id").cast("bigint").alias("doc_id"),
            (F.col("n_sentences") - F.col("n_kept")).alias("n"),
        )
    )
    # 'diff:*' legs (r10): snapshot diff between two corpus versions
    # (pipeline.corpus_diff — the nightly ingest audit): new = old
    # minus doc_id%7 rows ('removed'), with %11 texts rewritten
    # ('changed') and %13 rows re-added under new ids ('added');
    # n carries the surviving fingerprint so the portable rolling
    # hash itself is value-gated
    from sparkall_spark.operators.pipeline import corpus_diff

    base = docs.select("doc_id", "text")
    new_snap = (
        base.filter(F.col("doc_id") % 7 != 0)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 11 == 0,
                F.concat(F.col("text"), F.lit(" v2")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            base.filter(F.col("doc_id") % 13 == 0).select(
                (F.col("doc_id") + 500000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" new")).alias("text"),
            )
        )
    )
    diff_level = corpus_diff(base, new_snap).select(
        F.concat(F.lit("diff:"), F.col("status")).alias("level"),
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.coalesce(F.col("new_fp"), F.col("old_fp"))
        .cast("bigint")
        .alias("n"),
    )
    return (
        doc_level.unionByName(span_level)
        .unionByName(sent_level)
        .unionByName(diff_level)
    )


_E01_ORACLE = """
WITH tk AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS tk
  FROM documents),
pos AS (
  SELECT doc_id, unnest(range(1, greatest(len(tk) - 25 + 2, 1))) AS i, tk
  FROM tk),
wins AS (
  SELECT doc_id, i, array_to_string(tk[i:i+25-1], ' ') AS gram FROM pos),
ranked AS (
  SELECT doc_id, i,
         row_number() OVER (PARTITION BY gram ORDER BY doc_id, i) AS rn
  FROM wins),
dup AS (SELECT doc_id, i FROM ranked WHERE rn > 1),
cov AS (
  SELECT DISTINCT doc_id, i + u AS j
  FROM (SELECT doc_id, i, unnest(range(0, 25)) AS u FROM dup) q),
removed AS (
  SELECT doc_id, count(*) AS n_removed FROM cov GROUP BY doc_id),
sp AS (
  SELECT doc_id,
         text || '.'
           || CASE WHEN doc_id % 3 = 0 THEN ' All rights reserved.'
                   ELSE '' END
           || CASE WHEN doc_id % 5 = 0 THEN ' Subscribe to our newsletter.'
                   ELSE '' END AS pt
  FROM documents),
sarr AS (
  SELECT doc_id,
         list_filter(list_transform(
           regexp_extract_all(pt, '[^.!?]+(?:[.!?]+|$)'), x -> trim(x)),
           x -> x <> '') AS sa
  FROM sp),
ss AS (
  SELECT doc_id, i, sa[i] AS s
  FROM (SELECT doc_id, unnest(range(1, len(sa) + 1)) AS i, sa FROM sarr) q),
sk AS (
  SELECT doc_id, count(*) AS kept
  FROM (SELECT doc_id,
               row_number() OVER (PARTITION BY s ORDER BY doc_id, i) AS rn
        FROM ss) r
  WHERE rn = 1 GROUP BY doc_id),
sent AS (
  SELECT sarr.doc_id, len(sa) - coalesce(kept, 0) AS n_rm
  FROM sarr LEFT JOIN sk ON sarr.doc_id = sk.doc_id)
SELECT 'doc' AS level, min(doc_id) AS doc_id, count(*) AS n
FROM documents GROUP BY text
UNION ALL
SELECT 'span' AS level, doc_id, CAST(n_removed AS BIGINT) AS n
FROM removed WHERE n_removed > 0
UNION ALL
SELECT 'sent' AS level, doc_id, CAST(n_rm AS BIGINT) AS n
FROM sent WHERE n_rm > 0
"""


def _e01_diff_oracle_sql() -> str:
    """'diff:*' legs mirror: the same synthetic snapshots, the same
    portable fingerprint (_FP_SQL), a full outer join on the id, and
    the same added/removed/changed classification."""
    return f"""
UNION ALL
SELECT 'diff:' || status AS level, doc_id, COALESCE(new_fp, old_fp) AS n
FROM (
  WITH dbase AS (SELECT doc_id, text FROM documents),
  dnewt AS (
    SELECT doc_id,
           CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END AS text
    FROM dbase WHERE doc_id % 7 <> 0
    UNION ALL
    SELECT doc_id + 500000, text || ' new' FROM dbase
    WHERE doc_id % 13 = 0),
  dold AS (SELECT doc_id, {{fp}} AS old_fp
           FROM (SELECT doc_id, coalesce(text, '') AS text FROM dbase)),
  dnew AS (SELECT doc_id, {{fp}} AS new_fp
           FROM (SELECT doc_id, coalesce(text, '') AS text FROM dnewt))
  SELECT COALESCE(o.doc_id, nn.doc_id) AS doc_id, old_fp, new_fp,
         CASE WHEN old_fp IS NULL THEN 'added'
              WHEN new_fp IS NULL THEN 'removed'
              WHEN old_fp <> new_fp THEN 'changed' END AS status
  FROM dold o FULL OUTER JOIN dnew nn ON o.doc_id = nn.doc_id
) WHERE status IS NOT NULL
""".replace("{fp}", _FP_SQL)


# portable rolling-hash document fingerprint, mirrored in DuckDB —
# shared by the e10 select and the e20 pipeline dedup stage
_FP_SQL = """list_reduce(
         list_prepend(0::BIGINT,
           [ascii(c) FOR c IN
              list_filter(string_split(
                regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ''),
                x -> x <> '')]),
         (acc, c) -> (acc * 31 + c) % 1000000007)"""


def _e03_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two near-dup families through the same MinHash+LSH machinery,
    tagged and unioned (r5: absorbs the former e05 slot to free a
    registry entry): word-token minhash pairs and word-BIGRAM n-gram
    Jaccard pairs (16 bands x 4 rows: per-pair miss ~5e-8 at j=0.9),
    both verified exactly and oracle-checked against all-pairs SQL."""
    docs = load_table(spark, sf_dir, "documents")
    # word leg: shuffle CANDIDATE generation + broadcast rep attachment.
    # The fixture is a dense near-clique (3,935 reps, 12.5% of ALL rep
    # pairs at j>=0.9; one band bucket holds 1,701 reps).  Two r8
    # hardenings close the r7 storm regression (driver median 13.8s,
    # judge fresh-run passes of 41-44s):
    # 1. the banded self-join is SKEW-SALTED (two-sided adaptive salt,
    #    dedup._skew_salted_sides): the hot 1,701-rep bucket previously
    #    serialized ~2.9M probes onto one task with AQE pinned off and
    #    nothing to re-split it; salting bounds per-task probe work at
    #    ~256^2 per key (measured: the (127+1)/128 straggler tails are
    #    gone and the healthy steady state dropped 5.9s -> ~3.5s).
    # 2. est_prefilter=True: of the 1.89M band candidates only 28.9K
    #    survive exact verification, and array_intersect over the full
    #    hashed shingle arrays for the 98.5% failures allocated tens of
    #    GB per pass — under host CPU contention each young GC
    #    stretched from ~20ms to ~1.7s and a pass blew up to 59-86s
    #    (measured 50-69s of GC).  The 6-sigma signature estimate
    #    (miss probability ~1e-9/pair, same 964,854 output rows) kills
    #    those candidates on 64-int arrays instead: the SAME sick
    #    window ran 5.3s with 0.02s GC.  Costs ~+0.4s in healthy
    #    windows — robustness is worth it on a shared-CPU box, and at
    #    cluster scale the garbage reduction is strictly better.
    # broadcast_reps=True pins the verify/expansion joins
    # to broadcast (reps are thousands of rows) so AQE cannot re-decide
    # them per run on the unknown-cardinality candidate stream.
    # r7: the two legs are CONSTRUCTED on two threads — each
    # construction runs an eager rep-table materialization job
    # (coalescing toggle is lock-serialized in dedup.py, the jobs
    # themselves overlap), and the word leg's ~1s sig pass previously
    # sat on the critical path in front of the bigram leg's ~3s
    # shingle+sig pass.  Spark job submission is thread-safe; the
    # union's own stages already overlap inside one job.
    import concurrent.futures as _fut

    def _word():
        return D.minhash_dedup_pairs(
            docs, threshold=0.9, broadcast_reps=True,
            candidate_strategy="shuffle", est_prefilter=True,
        ).select(F.lit("word").alias("family"), "id_a", "id_b", "jaccard")

    def _bigram():
        # r6: bigram leg restored to the FULL corpus (r5 ran a
        # deterministic 1/3 slice because failing clique candidates made
        # verification ~6s).  Bigram sets collide rarely (3.7K collision
        # rows, 356 candidate pairs at sf0.1), so the broadcast strategy
        # — no shuffle at all past the banded self-join — is the right
        # physical plan.
        return D.ngram_jaccard_pairs(
            docs, ngram=2, threshold=0.9, broadcast_reps=True,
        ).select(F.lit("bigram").alias("family"), "id_a", "id_b", "jaccard")

    with _fut.ThreadPoolExecutor(max_workers=2) as pool:
        f_mh, f_ng = pool.submit(_word), pool.submit(_bigram)
        mh, ng = f_mh.result(), f_ng.result()
    return mh.unionByName(ng)


_E03_ORACLE = """
WITH t AS MATERIALIZED (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     x -> x <> '') toks
  FROM documents),
td AS MATERIALIZED (
  SELECT doc_id, toks, len(toks) AS nt
  FROM (SELECT doc_id, list_distinct(toks) AS toks FROM t)),
g AS MATERIALIZED (
  SELECT doc_id, grams, len(grams) AS ng FROM (
    SELECT doc_id,
           list_distinct([array_to_string(toks[i:i+1], ' ')
                          FOR i IN generate_series(1, len(toks) - 1)]) grams
    FROM t
    WHERE len(toks) >= 2))
-- length-ratio prefilter (r12 optimization, the e22 oracle pattern):
-- round(J, 6) >= 0.9 forces min(|A|,|B|)/max(|A|,|B|) >= 0.8999995
-- (|A∩B| <= min, |A∪B| >= max), so the cheap least/greatest test is a
-- NECESSARY condition and kills most of the quadratic pair set before
-- the expensive list_intersect; 0.899999 covers the 6dp rounding
-- slack.  Values identical (A/B-verified at sf0.01/sf0.001).
SELECT 'word' AS family, a.doc_id AS id_a, b.doc_id AS id_b,
       round(len(list_intersect(a.toks, b.toks))::DOUBLE
             / len(list_distinct(list_concat(a.toks, b.toks))), 6) AS jaccard
FROM td a, td b
WHERE a.doc_id < b.doc_id
  AND least(a.nt, b.nt) >= 0.899999 * greatest(a.nt, b.nt)
  AND round(len(list_intersect(a.toks, b.toks))::DOUBLE
            / len(list_distinct(list_concat(a.toks, b.toks))), 6) >= 0.9
UNION ALL
SELECT 'bigram' AS family, a.doc_id AS id_a, b.doc_id AS id_b,
       round(len(list_intersect(a.grams, b.grams))::DOUBLE
             / len(list_distinct(list_concat(a.grams, b.grams))), 6) AS jaccard
FROM g a, g b
WHERE a.doc_id < b.doc_id
  AND least(a.ng, b.ng) >= 0.899999 * greatest(a.ng, b.ng)
  AND round(len(list_intersect(a.grams, b.grams))::DOUBLE
            / len(list_distinct(list_concat(a.grams, b.grams))), 6) >= 0.9
"""


def _e04_images() -> list[tuple[int, bytes]]:
    """Deterministic binary-PGM (P5) fixture images for e04's image
    near-dup legs — 12 distinct 24x16 bases (seeded RNG, pixel range
    0..199 so brightness shifts never clip) plus planted near-dups:
    +4 uniform brightness (dHash compares neighboring block means, so
    a uniform shift preserves every comparison -> Hamming 0 exactly)
    and one locally-bumped copy (a few flipped gradient bits).
    sf-independent by design: the oracle embeds the driver-side
    fingerprints of these same payloads as literals."""
    import numpy as np

    rng = np.random.default_rng(2024)
    planes = [
        (i, rng.integers(0, 200, size=(16, 24), dtype=np.uint8))
        for i in range(12)
    ]
    for copy_id, src in ((100, 0), (101, 3), (102, 7)):
        planes.append((copy_id, (planes[src][1] + 4).astype(np.uint8)))
    bumped = planes[5][1].copy()
    bumped[6:9, 10:13] = 255  # one bright patch: flips a few grid bits
    planes.append((103, bumped))
    return [
        (i, b"P5\n24 16\n255\n" + a.tobytes()) for i, a in planes
    ]


# COMMITTED dHash constants of the _e04_images() fixtures — computed
# ONCE with multimodal.decode_pixels + dhash64 and pinned here (r10
# advice): the oracle embeds THESE literals, not a fresh driver-side
# recompute, so a regression in the decode/hash code itself now trips
# the driver gate (previously both sides ran the same Python and a
# shared bug passed identically; only the mapInPandas plumbing was
# verified).  tests/test_entry_contract.py re-derives them and fails
# with regeneration instructions if the fixture or hash ever changes
# deliberately.
_E04_PINNED_FPS: list[tuple[int, int]] = [
    (0, -7803846083323943502),
    (1, 1381454117384042964),
    (2, -1555049513770371629),
    (3, 7722919287836060068),
    (4, 6077104818413049530),
    (5, 6687657749555878316),
    (6, 7830553269740999978),
    (7, -1248238432389982774),
    (8, 3286153924560247851),
    (9, 7884653521422554540),
    (10, 6640753680068242346),
    (11, 7443213672316179738),
    (100, -7803846083323943502),
    (101, 7722919287836060068),
    (102, -1248238432389982774),
    (103, 6687657783781398956),
]


def _e04_fingerprints() -> list[tuple[int, int]]:
    """Driver-side dHash of the fixture images via the SAME pure-Python
    decode the executors run (multimodal.decode_pixels + dhash64) —
    kept as the REGENERATION helper for :data:`_E04_PINNED_FPS` and the
    parity test; the oracle itself reads the pinned constants."""
    from sparkall_spark.operators.multimodal import decode_pixels, dhash64

    return [(i, dhash64(decode_pixels(p))) for i, p in _e04_images()]


def _e04_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fingerprint near-dup family, tagged and unioned (the e09/e22
    pattern):

    - 'simhash': portable-polynomial token hashes -> the full SimHash
      computation mirrors in ANSI SQL (pair banding over xxhash64
      fingerprints stays covered by tests/test_dedup.py);
    - 'dhash' (r10): the image path end-to-end — deterministic PGM
      payloads decoded to luma and dHashed in executors
      (multimodal.decode_images, Arrow-batched mapInPandas) vs the
      same fingerprints computed driver-side and embedded as oracle
      literals;
    - 'hpairs' (r10): fingerprint_hamming_pairs over those dHashes
      (pigeonhole 16-bit chunk equi-join, never all-pairs) vs the
      oracle's literal all-pairs xor/bit_count at max_hamming=3 —
      recall is structural (hamming < chunks), so the mirror is exact.
    """
    from sparkall_spark.operators import multimodal as M

    docs = load_table(spark, sf_dir, "documents")
    sim = D.simhash_fingerprints(docs, bits=30, portable=True).select(
        F.lit("simhash").alias("family"),
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("simhash").cast("bigint").alias("val"),
    )
    media = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in _e04_images()],
        "media_id long, payload binary",
    )
    feats = M.decode_images(media).select("media_id", "phash")
    dh = feats.select(
        F.lit("dhash").alias("family"),
        F.col("media_id").cast("bigint").alias("doc_id"),
        F.col("phash").cast("bigint").alias("val"),
    )
    pairs = D.fingerprint_hamming_pairs(
        feats, "media_id", "phash", max_hamming=3, chunks=4
    )
    hp = pairs.select(
        F.lit("hpairs").alias("family"),
        (F.col("id_a") * 100000 + F.col("id_b"))
        .cast("bigint")
        .alias("doc_id"),
        F.col("hamming").cast("bigint").alias("val"),
    )
    return sim.unionByName(dh).unionByName(hp)


# bit i of each per-token polynomial hash votes +1/-1; bit set iff the
# vote sum is positive — the same unrolled 30-term sum the Spark side
# computes (operators/dedup.py:simhash)
def _e04_oracle_sql() -> str:
    fps = ", ".join(f"({i}, {fp})" for i, fp in _E04_PINNED_FPS)
    simhash_bits = "\n + ".join(
        f"CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h >> {i}) & 1 = 1"
        f" THEN 1 ELSE -1 END)) > 0 THEN {1 << i} ELSE 0 END"
        for i in range(30)
    )
    return f"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     x -> x <> '') toks
  FROM documents),
h AS (
  SELECT doc_id,
         list_transform(toks, t ->
           list_reduce(
             list_prepend(0::BIGINT,
               [ascii(c)::BIGINT FOR c IN
                  list_filter(string_split(t, ''), x -> x <> '')]),
             (acc, c) -> (acc * 31 + c) % 1000000007)) hs
  FROM t),
fps(img_id, fp) AS (VALUES {fps})
SELECT 'simhash' AS family, doc_id, ({simhash_bits})::BIGINT AS val FROM h
UNION ALL
SELECT 'dhash' AS family, img_id::BIGINT AS doc_id, fp::BIGINT AS val
FROM fps
UNION ALL
SELECT 'hpairs' AS family, (a.img_id * 100000 + b.img_id)::BIGINT AS doc_id,
       bit_count(xor(a.fp, b.fp))::BIGINT AS val
FROM fps a JOIN fps b ON a.img_id < b.img_id
WHERE bit_count(xor(a.fp, b.fp)) <= 3
"""


def _e06_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    # LSH-bucketed default (no BroadcastNestedLoopJoin in the plan —
    # asserted in tests/test_plan_shapes.py).  The fixture embeddings
    # have NO natural near-dup pairs (max pairwise cosine ~0.51), so a
    # threshold entry over the raw table is a vacuous 0-row check;
    # instead plant near-duplicates in-query — an elementwise affine
    # copy (x*1.01 + 0.002, cosine ~0.99998 to its source) of every
    # 50th vector, mirrored exactly in the oracle — and require the
    # LSH path to find precisely those pairs.  At that cosine the
    # per-pair miss probability at bits=4/tables=16 is ~1e-38.
    emb = load_table(spark, sf_dir, "embeddings")
    planted = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: x * F.lit(1.01) + F.lit(0.002),
        ).alias("embedding"),
    ).filter(F.col("vec_id") % 50 == 0)
    aug = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).unionByName(planted)
    return D.embedding_neardup_pairs(
        aug,
        threshold=0.95,
        left_filter=F.col("__id") % 50 == 0,
        bits=4,
        tables=16,
    )


_E06_ORACLE = """
WITH aug AS (
  SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000,
         list_transform(embedding::DOUBLE[], x -> x * 1.01 + 0.002)
  FROM embeddings WHERE (vec_id + 100000) % 50 = 0
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.embedding, b.embedding), 6) AS cosine
FROM aug a, aug b
WHERE a.vec_id % 50 = 0 AND a.vec_id < b.vec_id
  AND round(list_cosine_similarity(a.embedding, b.embedding), 6) >= 0.95
"""


# brute-force ANN SQL fragments, merged into the e09 family oracle (r5:
# the former standalone e07 slot — the exact baseline travels with the
# approximate methods it calibrates)
_BRUTE_SELECT = """
SELECT 'brute' AS method, query_id, neighbor_id, cosine,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY cosine DESC, neighbor_id) AS rank
FROM brute_scored QUALIFY rank <= 10
"""

_BRUTE_CTE = """
brute_scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.e, c.e), 6) AS cosine
  FROM v q, v c
  WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id)"""


def _lsh_oracle_parts() -> tuple[str, str]:
    """LSH top-k as (CTE list, SELECT) SQL fragments for the merged e09
    oracle: per-table sign buckets against the same literal hyperplanes
    as lsh_topk(bits=4, tables=16, seed=42), candidate equi-join on
    (tbl, bkt), exact rescoring, rank<=10.  Expects a CTE ``v`` with
    (vec_id, e) in scope."""
    from sparkall_spark.operators.similarity import _hyperplanes

    tables, bits, dim, seed = 16, 4, 64, 42
    selects = []
    for t in range(tables):
        planes = _hyperplanes(dim, bits, t, seed)
        bucket = "\n      + ".join(
            f"(CASE WHEN list_dot_product(e, [{', '.join(repr(float(x)) for x in row)}])"
            f" >= 0 THEN {1 << i} ELSE 0 END)"
            for i, row in enumerate(planes)
        )
        selects.append(f"SELECT vec_id, ({bucket})::BIGINT AS bkt, {t} AS tbl FROM v")
    union = "\n  UNION ALL\n  ".join(selects)
    ctes = f"""
bk AS MATERIALIZED (
  {union}),
lsh_cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM bk q JOIN bk c ON q.tbl = c.tbl AND q.bkt = c.bkt
  WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id),
lsh_scored AS (
  SELECT lsh_cand.query_id, lsh_cand.neighbor_id,
         round(list_cosine_similarity(qv.e, cv.e), 6) AS cosine
  FROM lsh_cand
  JOIN v qv ON qv.vec_id = lsh_cand.query_id
  JOIN v cv ON cv.vec_id = lsh_cand.neighbor_id)"""
    select = """
SELECT 'lsh' AS method, query_id, neighbor_id, cosine,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY cosine DESC, neighbor_id) AS rank
FROM lsh_scored QUALIFY rank <= 10
"""
    return ctes, select


# data-independent codebook (seeded): makes the IVF entry fully
# deterministic and SQL-mirrorable; production default (k-means over a
# bounded sample) stays covered by tests/test_similarity.py
_E09_CENTROIDS = __import__("numpy").random.default_rng(123).standard_normal((16, 64))


def _e09_sim_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole batch-ANN family, tagged and unioned: exact brute-force
    baseline (r5: absorbs the former e07 slot), hyperplane-LSH (r5:
    absorbed e08), IVF, and IVF-PQ (r9: absorbs the former e26 slot —
    coarse cells + product-quantized ADC shortlist + exact refine; the
    searchable index per corpus vector is one int cell + 8 codes
    instead of 64 doubles, the 100 TB memory story), and 'q8' (r9) =
    brute-force top-k under the int8 scalar-quantized metric
    (operators/quantize.py — 4x smaller corpus working set; scales
    cancel in cosine, so scoring is integer dots + one division+sqrt,
    which is why it mirrors exactly), plus 'ivfq8' (r10) = the COMPOSED
    memory-bound shape ivf_topk_q8 (IVF cells bound the candidate set,
    int8 codes score it — one int cell + dim code bytes per corpus
    vector is the entry's own 100 TB memory story, now driver-gated) —
    all fully deterministic (fixed seeded centroids / hyperplanes /
    codebooks, floor-based rounding) and all mirrored literally in
    SQL."""
    import numpy as np

    from sparkall_spark.operators import quantize as Qz
    from sparkall_spark.operators.similarity import assign_cells, l2_norm

    emb = load_table(spark, sf_dir, "embeddings")
    # r13 shared corpus bases (guide §5, VERDICT r12 next #4): the six
    # methods previously re-derived their index columns from the raw
    # table per method — the double cast + l2 norm four times, the int8
    # codes twice (q8/ivfq8), the 16-cell Arrow assignment twice
    # (ivf/ivfq8), and six parquet scans.  ONE persisted frame now
    # carries (__v cast, __n norm, __q codes, __cell assignment) and
    # every method reads it; each precomputed column is built by the
    # SAME expression the operators use internally (their
    # corpus_*_col contracts), so values are identical by construction.
    # Eagerly materialized: the query-side broadcast exchanges run as
    # separate driver jobs, and racing jobs would otherwise recompute
    # the whole prep chain before the cache fills (the e03 lesson).
    # At 100 TB this is the difference between six corpus passes
    # (two of them through the Python boundary) and ONE.
    cents16 = np.asarray(_E09_CENTROIDS, dtype=float)
    from sparkall_spark.operators._cache import persist_tracked

    prep = persist_tracked(
        Qz.quantize_embeddings(
            emb.select(
                "vec_id",
                F.col("embedding").cast("array<double>").alias("__v"),
            ),
            "__v",
            "__q",
            "__qsc",
        )
        .withColumn("__n", l2_norm(F.col("__v")))
        .withColumn("__cell", assign_cells(F.col("__v"), cents16))
        .select("vec_id", "__v", "__n", "__q", "__cell")
    )
    prep.count()
    queries = prep.filter(F.col("vec_id") < 8)
    q8 = Qz.quantized_topk(
        prep, queries, k=10, vec_col="__v", corpus_code_col="__q"
    ).select(
        F.lit("q8").alias("method"),
        "query_id", "neighbor_id", "cosine",
        F.col("rank").cast("bigint").alias("rank"),
    )
    ivfq8 = Qz.ivf_topk_q8(
        prep, queries, centroids=_E09_CENTROIDS, k=10, nprobe=4,
        vec_col="__v", corpus_code_col="__q", corpus_cell_col="__cell",
    ).select(
        F.lit("ivfq8").alias("method"),
        "query_id", "neighbor_id", "cosine",
        F.col("rank").cast("bigint").alias("rank"),
    )
    # 'recall:*' legs (r10): recall@10 of every approximate method vs
    # the exact baseline (similarity.ann_recall_report) — the tuning
    # telemetry an ANN deployment reads before touching nprobe/bits.
    # Each branch is persisted (released by the entry teardown): the
    # top-k frames are <=80 rows, and both the union and its recall
    # leg read them, so no method runs twice.
    brute = S.brute_force_topk(
        prep, queries, k=10, vec_col="__v", corpus_norm_col="__n"
    ).select(
        F.lit("brute").alias("method"),
        "query_id", "neighbor_id", "cosine",
        F.col("rank").cast("bigint").alias("rank"),
    )
    ivf = S.ivf_topk(
        prep, queries, k=10, n_cells=16, nprobe=4, centroids=_E09_CENTROIDS,
        vec_col="__v", corpus_cell_col="__cell", corpus_norm_col="__n",
    ).select(
        F.lit("ivf").alias("method"),
        "query_id", "neighbor_id", "cosine",
        F.col("rank").cast("bigint").alias("rank"),
    )
    lsh = S.lsh_topk(
        prep, queries, k=10, bits=4, tables=16,
        vec_col="__v", corpus_norm_col="__n",
    ).select(
        F.lit("lsh").alias("method"),
        "query_id", "neighbor_id", "cosine",
        F.col("rank").cast("bigint").alias("rank"),
    )
    pq = S.ivf_pq_topk(
        prep,
        queries,
        k=10,
        n_cells=8,
        nprobe=3,
        m=8,
        ks=16,
        refine=3,
        centroids=_E26_CENTROIDS,
        codebooks=_E26_BOOKS,
        vec_col="__v",
        corpus_norm_col="__n",
    ).select(
        F.lit("ivfpq").alias("method"),
        "query_id", "neighbor_id", "cosine",
        F.col("rank").cast("bigint").alias("rank"),
    )
    brute = persist_tracked(brute)
    approx_all = persist_tracked(
        ivf.unionByName(lsh)
        .unionByName(pq)
        .unionByName(q8)
        .unionByName(ivfq8)
    )
    # ONE batched report (method_col) — a plan per method quintuples
    # the stage count and costs ~5 s of pure scheduling at sf0.1
    recall_legs = S.ann_recall_report(
        approx_all, brute, k=10, method_col="method"
    ).select(
        F.concat(F.lit("recall:"), F.col("method")).alias("method"),
        "query_id",
        F.col("n_overlap").alias("neighbor_id"),
        F.col("recall").alias("cosine"),
        F.lit(10).cast("bigint").alias("rank"),
    )
    return brute.unionByName(approx_all).unionByName(recall_legs)


def _qcos_sql(a: str, b: str) -> str:
    """The quantized-cosine scoring expression over two ``qcodes``
    aliases — ONE textual copy shared by the q8 and ivfq8 mirrors:
    integer-exact dots/norms (127^2*dim << 2^53, so DuckDB's double
    list_dot_product is exact) and the num / sqrt(n_a * n_b)
    association — NOT sqrt(n_a)*sqrt(n_b), which differs in ulp."""
    return (
        f"round(CASE WHEN {a}.n > 0 AND {b}.n > 0"
        f" THEN list_dot_product({a}.qc::DOUBLE[], {b}.qc::DOUBLE[])"
        f" / sqrt({a}.n * {b}.n)"
        f" ELSE 0.0 END, 6)"
    )


def _q8_select() -> str:
    """e09 'q8' mirror: brute-force top-k under the quantized metric,
    reading the shared ``qcodes`` CTE (codes rendered once by
    operators/quantize.quantize_sql in :func:`_ivfq8_parts`, scoring
    shared via :func:`_qcos_sql` — neither can drift per-leg)."""
    return f"""
SELECT 'q8' AS method, query_id, neighbor_id, cosine,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY cosine DESC, neighbor_id) AS rank
FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_qcos_sql('q', 'c')} AS cosine
  FROM (SELECT * FROM qcodes WHERE vec_id < 8) q
  JOIN qcodes c ON c.vec_id <> q.vec_id)
QUALIFY rank <= 10
"""


def _ivfq8_parts() -> tuple[str, str]:
    """e09 'ivfq8' mirror as (CTE, SELECT) fragments: the ivf leg's
    cell restriction (reuses the shared ``q``/``c`` CTEs — same fixed
    centroids, same argmax/probe rules) scored with the q8 leg's
    integer-exact quantized cosine (operators/quantize.quantize_sql
    renders the codes so the arithmetic cannot drift)."""
    from sparkall_spark.operators.quantize import quantize_sql

    qc = quantize_sql("embedding::DOUBLE[]")
    ctes = f"""
qcodes AS MATERIALIZED (
  SELECT vec_id, qc, list_dot_product(qc::DOUBLE[], qc::DOUBLE[]) AS n
  FROM (SELECT vec_id, {qc} AS qc FROM embeddings)),
ivfq8_scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_qcos_sql('a', 'b')} AS cosine
  FROM q JOIN c ON q.cell = c.cell AND c.vec_id <> q.vec_id
  JOIN qcodes a ON a.vec_id = q.vec_id
  JOIN qcodes b ON b.vec_id = c.vec_id)"""
    select = """
SELECT 'ivfq8' AS method, query_id, neighbor_id, cosine,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY cosine DESC, neighbor_id) AS rank
FROM ivfq8_scored QUALIFY rank <= 10
"""
    return ctes, select


def _e09_oracle_sql() -> str:
    """Mirror of ivf_topk with the fixed codebook (per-vector cell =
    argmax cosine over the 16 literal centroids, 6dp rounded, ties to
    the higher cell id — the same reverse(array_sort(structs)) order the
    Spark side uses; queries probe their 4 nearest cells; exact
    rescoring; rank<=10) UNIONed with the LSH mirror."""
    structs = ", ".join(
        "{'s': round(list_cosine_similarity(e, ["
        + ", ".join(repr(float(x)) for x in cent)
        + f"]), 6), 'cell': {j}}}"
        for j, cent in enumerate(_E09_CENTROIDS)
    )
    lsh_ctes, lsh_select = _lsh_oracle_parts()
    pq_ctes, pq_select = _pq_oracle_parts()
    iq8_ctes, iq8_select = _ivfq8_parts()
    return f"""
WITH v AS MATERIALIZED (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
cellinfo AS MATERIALIZED (
  SELECT vec_id, e,
         list_reverse(list_sort([{structs}])) AS ordered
  FROM v),
c AS (SELECT vec_id, e, ordered[1].cell AS cell FROM cellinfo),
q AS (SELECT vec_id, e,
             unnest(list_transform(ordered[1:4], x -> x.cell)) AS cell
      FROM cellinfo WHERE vec_id < 8),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.e, c.e), 6) AS cosine
  FROM q JOIN c ON q.cell = c.cell
  WHERE c.vec_id <> q.vec_id),
{lsh_ctes.strip()},
{pq_ctes.strip()},
{iq8_ctes.strip()},
{_BRUTE_CTE.strip()},
ivf_top AS MATERIALIZED (
  SELECT 'ivf' AS method, query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored QUALIFY rank <= 10),
lsh_top AS MATERIALIZED ({lsh_select.strip()}),
pq_top AS MATERIALIZED ({pq_select.strip()}),
brute_top AS MATERIALIZED ({_BRUTE_SELECT.strip()}),
q8_top AS MATERIALIZED ({_q8_select().strip()}),
iq8_top AS MATERIALIZED ({iq8_select.strip()})
SELECT * FROM ivf_top
UNION ALL
SELECT * FROM lsh_top
UNION ALL
SELECT * FROM pq_top
UNION ALL
SELECT * FROM brute_top
UNION ALL
SELECT * FROM q8_top
UNION ALL
SELECT * FROM iq8_top
{_e09_recall_sql()}
"""


def _e09_recall_sql() -> str:
    """recall@10 mirror legs: |approx_top10 ∩ brute_top10| per query,
    grouped over the brute rows so every query appears (a method that
    misses everything still reports recall 0).  Mirrors
    ann_recall_report's r12 semantics exactly: DISTINCT pair matches,
    n_overlap capped at least(overlap, k) (r11 advice — a >k-row exact
    frame cannot push recall past 1), and a per-query denominator of
    min(k, distinct exact rows) — on the well-formed k-per-query top-k
    frames all forms are identities, but the operator and its oracle
    must agree on EVERY input shape, not just this fixture's."""
    parts = []
    for tag, cte in (("ivf", "ivf_top"), ("lsh", "lsh_top"),
                     ("ivfpq", "pq_top"), ("q8", "q8_top"),
                     ("ivfq8", "iq8_top")):
        parts.append(f"""
UNION ALL
SELECT 'recall:{tag}' AS method, b.query_id,
       least(count(DISTINCT o.neighbor_id), 10)::BIGINT AS neighbor_id,
       round(least(count(DISTINCT o.neighbor_id), 10)::DOUBLE
             / least(10, count(DISTINCT b.neighbor_id)), 6) AS cosine,
       CAST(10 AS BIGINT) AS rank
FROM brute_top b LEFT JOIN {cte} o
  ON o.query_id = b.query_id AND o.neighbor_id = b.neighbor_id
GROUP BY b.query_id""")
    return "".join(parts)


# --- IVF-PQ leg of e09 (was standalone e26 until r9's slot rebalance) ------
# Fixed seeded coarse centroids (8 cells) + per-subspace PQ codebooks
# (m=8 subspaces x ks=16 codewords x d=8 dims): the encode argmin is
# quantized at 1e-6 (pq_encode) and the approx score HALF-UP-rounded at
# 6dp, so every stage — cell argmax, code assignment, ADC shortlist,
# exact refine — mirrors literally in SQL.
_E26_CENTROIDS = __import__("numpy").random.default_rng(77).standard_normal((8, 64))
_E26_BOOKS = __import__("numpy").random.default_rng(78).standard_normal((8, 16, 8))


def _pq_oracle_parts() -> tuple[str, str]:
    """Mirror of ivf_pq_topk with the fixed index, as (ctes, select)
    parts for the e09 family oracle: cell = argmax 6dp cosine (ties to
    higher cell); code_j = argmin over the 16 literal codewords of
    floor(d2*1e6+0.5) (ties to LOWER code — np.argmin); approx =
    HALF-UP 6dp of sum_j dot(q_sub_j, codeword); shortlist
    row_number<=30 by (approx desc, neighbor_id); exact cosine refine,
    rank<=10.  CTEs are pq-prefixed; the shared ``v`` base comes from
    the e09 oracle."""
    m, ks, d = _E26_BOOKS.shape
    structs = ", ".join(
        "{'s': round(list_cosine_similarity(e, ["
        + ", ".join(repr(float(x)) for x in cent)
        + f"]), 6), 'cell': {j}}}"
        for j, cent in enumerate(_E26_CENTROIDS)
    )
    codes = []
    for j in range(m):
        o = j * d
        cands = ", ".join(
            "{'d': floor(("
            + " + ".join(
                f"(e[{o + i + 1}] - {float(_E26_BOOKS[j, c, i])!r})"
                f" * (e[{o + i + 1}] - {float(_E26_BOOKS[j, c, i])!r})"
                for i in range(d)
            )
            + f") * 1e6 + 0.5), 'c': {c}}}"
            for c in range(ks)
        )
        codes.append(f"list_sort([{cands}])[1].c")
    code_arr = ",\n           ".join(codes)
    terms = []
    for j in range(m):
        o = j * d
        book = (
            "["
            + ", ".join(
                "[" + ", ".join(repr(float(x)) for x in _E26_BOOKS[j, c]) + "]"
                for c in range(ks)
            )
            + "]"
        )
        terms.append(
            f"list_dot_product(pqq.e[{o + 1}:{o + d}],"
            f" ({book})[pqenc.code[{j + 1}] + 1])"
        )
    approx = "\n         + ".join(terms)
    ctes = f"""
pqcell AS MATERIALIZED (
  SELECT vec_id, e,
         list_reverse(list_sort([{structs}])) AS ordered
  FROM v),
pqc AS (SELECT vec_id, e, ordered[1].cell AS cell FROM pqcell),
pqenc AS MATERIALIZED (
  SELECT vec_id, cell,
          [{code_arr}] AS code
  FROM pqc),
pqq AS (SELECT vec_id, e,
             unnest(list_transform(ordered[1:3], x -> x.cell)) AS cell
      FROM pqcell WHERE vec_id < 8),
pqap AS (
  SELECT pqq.vec_id AS query_id, pqenc.vec_id AS neighbor_id, pqq.e AS qe,
         round({approx}, 6) AS approx
  FROM pqq JOIN pqenc ON pqq.cell = pqenc.cell
  WHERE pqenc.vec_id <> pqq.vec_id),
pqshort AS (
  SELECT query_id, neighbor_id, qe,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY approx DESC, neighbor_id) AS pr
  FROM pqap QUALIFY pr <= 30),
pqref AS (
  SELECT s.query_id, s.neighbor_id,
         round(list_cosine_similarity(s.qe, cv.e), 6) AS cosine
  FROM pqshort s JOIN v cv ON cv.vec_id = s.neighbor_id)
"""
    select = """
SELECT 'ivfpq' AS method, query_id, neighbor_id, cosine,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY cosine DESC, neighbor_id) AS rank
FROM pqref QUALIFY rank <= 10
"""
    return ctes, select


# --- e27: distributed k-means (driver-gated r5) ---------------------------
# Fixed init (5 x 64): kmeans_fit runs TRUE distributed Lloyd rounds
# (Arrow-matmul assignment map-side, per-cell elementwise means via one
# partial-agg groupBy, k x dim metadata collect per round); the oracle
# unrolls the identical rounds as a CTE chain and must agree on the
# FINAL ASSIGNMENT of every vector exactly.
_E27_INIT = __import__("numpy").random.default_rng(7).standard_normal((5, 64))
_E27_ITERS = 2


def _e27_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd k-means (operators/clustering.py): fit 2 rounds
    from a fixed init over the embeddings table, then assign every
    vector — the iterative-algorithm analog of the PageRank oracle, but
    hash-checked end to end (assign_cells' 6dp/tie semantics make every
    round SQL-mirrorable).  r6 adds the Achlioptas random-projection leg
    (operators/projection.py): every vector's k=8 signed micro subset
    sums, one row per coordinate — integer-exact, so the oracle checks
    every projected coordinate bit-for-bit.  Uniform schema
    (tag, vec_id, j, val)."""
    from sparkall_spark.operators.clustering import kmeans_assign, kmeans_fit
    from sparkall_spark.operators.projection import random_project

    emb = load_table(spark, sf_dir, "embeddings")
    cents, _ = kmeans_fit(emb, iters=_E27_ITERS, init=_E27_INIT)
    km = kmeans_assign(emb, cents).select(
        F.lit("kmeans").alias("tag"),
        "vec_id",
        F.lit(0).alias("j"),
        F.col("cell").cast("bigint").alias("val"),
    )
    rp = (
        random_project(emb, "embedding", dim=64, k=8, seed=97)
        .select("vec_id", F.posexplode("proj_micro"))
        .toDF("vec_id", "j", "val")
        .select(F.lit("rp").alias("tag"), "vec_id", "j", "val")
    )
    # r7: logistic-regression quality classifier (operators/logreg.py)
    # — full-batch GD over portable-hashed token counts with exact
    # integer micro-gradient sums, so the LEARNED WEIGHTS (tag 'lr',
    # vec_id = bucket, bias at -1) and the per-doc decision margins
    # (tag 'lrscore', every 17th doc) hash-match the unrolled-CTE
    # mirror bit-for-bit.  Label: lang == 'en'.
    from sparkall_spark.operators.logreg import logreg_score, train_logreg

    docs = load_table(spark, sf_dir, "documents")
    labeled = docs.withColumn("__y", (F.col("lang") == "en").cast("int"))
    wts, bias = train_logreg(labeled, "__y", n_buckets=64, iters=3)
    lr_rows = spark.createDataFrame(
        [(j, int(w)) for j, w in enumerate(wts)] + [(-1, int(bias))],
        "vec_id bigint, val bigint",
    ).select(F.lit("lr").alias("tag"), "vec_id", F.lit(0).alias("j"), "val")
    lrscore = (
        logreg_score(docs, wts, bias)
        .filter(F.col("doc_id") % 17 == 0)
        .select(
            F.lit("lrscore").alias("tag"),
            F.col("doc_id").alias("vec_id"),
            F.lit(0).alias("j"),
            F.col("margin_micro").alias("val"),
        )
    )
    return km.unionByName(rp).unionByName(lr_rows).unionByName(lrscore)


def _e27_oracle_sql() -> str:
    from sparkall_spark.operators.clustering import kmeans_assign_oracle_sql
    from sparkall_spark.operators.projection import project_micro_sql

    sql = kmeans_assign_oracle_sql(_E27_INIT, _E27_ITERS)
    # the driver compares exact values: surface cell as BIGINT like the
    # Spark side's cast
    sql = sql.replace(
        "SELECT vec_id, cell FROM selfin",
        "SELECT vec_id, CAST(cell AS BIGINT) AS cell FROM selfin",
    )
    proj = project_micro_sql("embedding", dim=64, k=8, seed=97)
    from sparkall_spark.operators.logreg import (
        logreg_scores_select_sql,
        logreg_train_chain_sql,
    )

    # ONE training chain hoisted to the top-level WITH — the 'lr' and
    # 'lrscore' branches previously each embedded their own copy, and
    # DuckDB re-ran the whole unrolled GD per branch (half the entry's
    # oracle cost for no extra verification)
    chain = logreg_train_chain_sql("lang = 'en'", n_buckets=64, iters=3)
    scores = logreg_scores_select_sql(iters=3)
    return f"""
WITH {chain}
SELECT 'kmeans' AS tag, vec_id, CAST(0 AS INT) AS j, cell AS val
FROM ({sql}) km
UNION ALL
SELECT 'rp' AS tag, vec_id, CAST(j - 1 AS INT) AS j, pm[j] AS val
FROM (
  SELECT vec_id, unnest(range(1, len(pm) + 1)) AS j, pm
  FROM (SELECT vec_id, {proj} AS pm FROM embeddings) p) q
UNION ALL
SELECT 'lr' AS tag, b AS vec_id, CAST(0 AS INT) AS j, w AS val
FROM (SELECT b::BIGINT AS b, CAST(w AS BIGINT) AS w FROM w3
      UNION ALL
      SELECT -1::BIGINT, CAST(bias AS BIGINT) FROM b3) lw
UNION ALL
SELECT 'lrscore' AS tag, doc_id AS vec_id, CAST(0 AS INT) AS j,
       margin_micro AS val
FROM ({scores}) ls WHERE doc_id % 17 = 0
"""


# data-independent seeded codebook for the SemDeDup entry (same trick
# as _E09_CENTROIDS: fixed literals make the cell argmax, the
# within-cell pruning, and the SQL mirror fully deterministic)
_E24_CENTROIDS = __import__("numpy").random.default_rng(321).standard_normal((8, 64))


def _e24_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (operators/dedup.py:semdedup):
    k-means cells + within-cell cosine pruning, greedy min-id keep.
    The fixture has no natural near-dups (max pairwise cosine ~0.5), so
    affine near-copies (cosine ~0.99998) of every 40th vector are
    planted in-query — survivors must be exactly the originals."""
    emb = load_table(spark, sf_dir, "embeddings")
    planted = emb.filter(F.col("vec_id") % 40 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: x * F.lit(1.01) + F.lit(0.002),
        ).alias("embedding"),
    )
    aug = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).unionByName(planted)
    return D.semdedup(aug, threshold=0.95, centroids=_E24_CENTROIDS)


def _e24_oracle_sql() -> str:
    """Mirror of semdedup with the fixed codebook: cell = argmax 6dp
    cosine over the 8 literal centroids (ties to the higher cell id —
    the reverse(array_sort) order), dropped = any row with a smaller-id
    same-cell neighbor at cosine >= 0.95, survivors = the rest."""
    structs = ", ".join(
        "{'s': round(list_cosine_similarity(e, ["
        + ", ".join(repr(float(x)) for x in cent)
        + f"]), 6), 'cell': {j}}}"
        for j, cent in enumerate(_E24_CENTROIDS)
    )
    return f"""
WITH aug AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, list_transform(embedding::DOUBLE[],
                                         x -> x * 1.01 + 0.002)
  FROM embeddings WHERE vec_id % 40 = 0),
cellinfo AS (
  SELECT vec_id, e,
         list_reverse(list_sort([{structs}]))[1].cell AS cell
  FROM aug),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM cellinfo a JOIN cellinfo b
    ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE round(list_cosine_similarity(a.e, b.e), 6) >= 0.95)
SELECT vec_id, CAST(cell AS INT) AS cell FROM cellinfo
WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
"""


# chrome planted into every document for the e10 boilerplate leg: the
# strip must remove exactly these two lines (they hit 100% document
# frequency; no natural line reaches the 80% threshold)
_E10_CHROME = "cookie consent required\nall rights reserved footer"


# --- DuckDB mirrors of the Gopher char-fraction repetition signals ---
# (functions/text.py; shared by the e10 oracle and tests/test_text.py)

# lowercase whitespace tokens of a text expression
def _lt_sql(text: str = "text") -> str:
    return (
        f"list_filter(regexp_split_to_array(lower({text}), '\\s+'),"
        " x -> x <> '')"
    )


def _grams_sql(lt: str, n: int) -> str:
    """Every word n-gram of token-list expression ``lt`` (not distinct)."""
    return (
        f"[array_to_string({lt}[i:i+{n - 1}], ' ')"
        f" FOR i IN generate_series(1, len({lt}) - {n} + 1)]"
    )


_TOKCHARS_SQL = "coalesce(list_sum(list_transform({lt}, x -> length(x))), 0)"


def _top_ngram_char_fraction_sql(grams: str, lt: str, n: int) -> str:
    """Mirror of text.top_ngram_char_fraction over precomputed ``grams``
    and token-list ``lt`` column names (so the caller can CTE them)."""
    denom = _TOKCHARS_SQL.format(lt=lt)
    # lexicographic struct sort implements max-count/longest-tie, same
    # as the Spark side (both engines order structs field-by-field)
    top = (
        f"list_sort([{{'c': len(list_filter({grams}, x -> x = d)),"
        f" 'l': length(d) - {n - 1}}}"
        f" FOR d IN list_distinct({grams})])[-1]"
    )
    return (
        f"CASE WHEN len({grams}) > 0 AND {denom} > 0"
        f" THEN (({top}).c * ({top}).l)::DOUBLE / {denom} ELSE 0.0 END"
    )


def _dup_ngram_char_fraction_sql(grams: str, lt: str, n: int) -> str:
    """Mirror of text.duplicate_ngram_char_fraction: overlap-aware union
    of token positions covered by any n-gram occurring more than once."""
    denom = _TOKCHARS_SQL.format(lt=lt)
    # distinct token positions covered by any gram occurring >1 times
    # (gram i covers [i, i+n-1]) — the duplicate test runs once per
    # start position, mirroring the Spark flatten shape
    covered_idx = (
        f"list_distinct(flatten([CASE WHEN"
        f" len(list_filter({grams}, x -> x = {grams}[i])) > 1"
        f" THEN generate_series(i, i + {n - 1})"
        f" ELSE [] END FOR i IN generate_series(1, len({grams}))]))"
    )
    covered = (
        f"coalesce(list_sum([length({lt}[j]) FOR j IN {covered_idx}]), 0)"
    )
    return (
        f"CASE WHEN len({grams}) > 0 AND {denom} > 0"
        f" THEN ({covered})::DOUBLE / {denom} ELSE 0.0 END"
    )


def _dup_char_fraction_sql(parts: str) -> str:
    """Mirror of text._dup_char_fraction over a string-list expression."""
    total = f"coalesce(list_sum(list_transform({parts}, x -> length(x))), 0)"
    firsts = (
        "coalesce(list_sum(list_transform("
        f"list_distinct({parts}), x -> length(x))), 0)"
    )
    return (
        f"CASE WHEN {total} > 0"
        f" THEN ({total} - {firsts})::DOUBLE / {total} ELSE 0.0 END"
    )


def _paragraphs_sql(text: str = "text") -> str:
    """Mirror of text._nonempty_paragraphs."""
    return (
        f"list_filter(list_transform(regexp_split_to_array({text},"
        " '\\n\\s*\\n'), x -> trim(x)), x -> x <> '')"
    )


_LINES_SQL = (
    "list_filter(list_transform(regexp_split_to_array({text}, '\\r?\\n'),"
    " x -> trim(regexp_replace(x, '\\r+$', ''))), x -> x <> '')"
)


def _e10_text_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One pass over documents computing the full text-analysis family:
    token/char stats, punctuation ratio, n-gram language ID, the
    composite quality score, and the rolling-hash document fingerprint
    (merged e10+e11+e12+e02 so every family member keeps a
    driver-checked row within the 50-entry correctness budget; all pure
    Column expressions, zero UDFs).  r5 adds a driver-gated
    cross-document boilerplate-removal leg (operators/boilerplate.py):
    two chrome lines are planted into every document, stripped at 80%
    document frequency through the bounded-collect InSet path, and the
    cleaned length is emitted as ``clean_n_chars`` — the oracle rebuilds
    the identical frequency count and strip in SQL."""
    from sparkall_spark.operators.boilerplate import remove_boilerplate_lines

    docs = load_table(spark, sf_dir, "documents")
    planted = docs.withColumn(
        "__t2", F.concat(F.col("text"), F.lit("\n" + _E10_CHROME))
    )
    stripped = remove_boilerplate_lines(
        planted,
        id_col="doc_id",
        text_col="__t2",
        min_docs=2,
        min_doc_frac=0.8,
        out_col="__t2",
    )
    return stripped.select(
        "doc_id",
        X.fingerprint("text").alias("fp"),
        X.token_count("text").cast("bigint").alias("n_tokens"),
        X.distinct_token_count("text").cast("bigint").alias("n_distinct"),
        X.char_count("text").cast("bigint").alias("n_chars_calc"),
        F.round(X.punct_ratio("text"), 6).alias("punct_ratio"),
        X.bpe_token_count("text").cast("bigint").alias("n_bpe"),
        X.lang_id("text").alias("lang_pred"),
        X.quality_score("text").alias("quality"),
        F.round(X.duplicate_line_ratio("text"), 6).alias("dup_line_ratio"),
        F.round(X.duplicate_ngram_ratio("text", 2), 6).alias("dup_bigram_ratio"),
        # the r5 Gopher rule signals, driver-gated alongside the rest
        F.round(X.bullet_line_ratio("text"), 6).alias("bullet_ratio"),
        F.round(X.ellipsis_line_ratio("text"), 6).alias("ellipsis_ratio"),
        F.round(X.alpha_word_ratio("text"), 6).alias("alpha_word_ratio"),
        F.round(X.symbol_word_ratio("text"), 6).alias("symbol_word_ratio"),
        # r6: the Gopher REPETITION char-fraction signals — computed in
        # a SECOND select below over PRECOMPUTED token/gram array
        # columns (the `_over` forms): higher-order lambdas re-evaluate
        # referenced subtrees per element, so the inline convenience
        # forms re-split the document once per distinct gram (measured
        # ~10 CPU-minutes at sf0.01; the attribute forms run in
        # milliseconds).  The fixture docs are single-line, so the
        # line/paragraph legs run on a deterministic planted variant
        # (text + its first-40-char segment twice); concat (not
        # concat_ws) so NULL text propagates the same way as SQL ``||``.
        F.length("__t2").cast("bigint").alias("clean_n_chars"),
        # r6: the published filter predicates, driver-gated.  Gopher's
        # quality keep runs on raw text with the Table A1 defaults
        # unchanged (fixture word counts span 10..99, so the 50-word
        # floor plus the two-stop-words rule discriminate: ~36% of
        # sf0.01 docs pass).  C4's line rules run on a
        # planted two-line variant (fixture docs are single-line,
        # punctuation-free, so raw-text C4 would be constant-empty):
        # line 1 = the text (dropped: no terminal punctuation), line 2 =
        # its trimmed first-12-chars + '.' (kept iff >= 3 words — ~60%
        # of fixture docs) — so both c4 columns vary per document.
        # gopher_repetition_keep (added after the signal columns below)
        # is constant-FALSE here BY CONSTRUCTION: the line/paragraph
        # legs run on the planted segment-duplicated variant, which
        # always exceeds the paper's duplicate-char thresholds — the
        # thresholds stay the published Table A1 values rather than
        # fixture-tuned ones.
        X.gopher_quality_keep("text").alias("gopher_quality_keep"),
        F.length(X.c4_clean_lines(_e10_c4_src())).cast("bigint").alias(
            "c4_clean_n_chars"
        ),
        X.c4_keep(_e10_c4_src(), min_sentences=1).alias("c4_keep"),
        X.tokens(F.lower(F.col("text"))).alias("__lt"),
        X._nonempty_lines(_e10_planted("\n")).alias("__lml"),
        X._nonempty_paragraphs(_e10_planted("\n\n")).alias("__pmp"),
    ).select(
        "*",
        X.all_word_ngrams(F.col("__lt"), 2).alias("__g2"),
        X.all_word_ngrams(F.col("__lt"), 3).alias("__g3"),
        X.all_word_ngrams(F.col("__lt"), 5).alias("__g5"),
        X.all_word_ngrams(F.col("__lt"), 10).alias("__g10"),
    ).select(
        "*",
        F.round(
            X.top_ngram_char_fraction_over(F.col("__lt"), F.col("__g2"), 2), 6
        ).alias("top2_char_frac"),
        F.round(
            X.top_ngram_char_fraction_over(F.col("__lt"), F.col("__g3"), 3), 6
        ).alias("top3_char_frac"),
        F.round(
            X.duplicate_ngram_char_fraction_over(
                F.col("__lt"), F.col("__g5"), 5
            ), 6,
        ).alias("dup5_char_frac"),
        F.round(
            X.duplicate_ngram_char_fraction_over(
                F.col("__lt"), F.col("__g10"), 10
            ), 6,
        ).alias("dup10_char_frac"),
        F.round(X._dup_char_fraction(F.col("__lml")), 6).alias(
            "dup_line_char_frac"
        ),
        F.round(
            F.when(
                F.size("__pmp") > 0,
                F.lit(1.0)
                - F.size(F.array_distinct("__pmp")) / F.size("__pmp"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_para_ratio"),
        F.round(X._dup_char_fraction(F.col("__pmp")), 6).alias(
            "dup_para_char_frac"
        ),
    ).select(
        # Gopher's REPETITION keep: the Table A1 thresholds ANDed over
        # the signal columns computed above (the cheap way to finish the
        # Gopher filter — recomputing the signals inside a predicate
        # would double the heavy array passes).  Comparisons run on the
        # ROUNDED columns, mirrored identically in the oracle.
        "*",
        (
            (F.col("dup_line_ratio") <= 0.30)
            & (F.col("dup_para_ratio") <= 0.30)
            & (F.col("dup_line_char_frac") <= 0.20)
            & (F.col("dup_para_char_frac") <= 0.20)
            & (F.col("top2_char_frac") <= 0.20)
            & (F.col("top3_char_frac") <= 0.18)
            & (F.col("dup5_char_frac") <= 0.15)
            & (F.col("dup10_char_frac") <= 0.10)
        ).alias("gopher_repetition_keep"),
    ).drop("__lt", "__lml", "__pmp", "__g2", "__g3", "__g5", "__g10")


def _e10_c4_src() -> Column:
    """The planted two-line C4 input (see the e10 docstring note)."""
    return F.concat(
        F.col("text"),
        F.lit("\n"),
        F.trim(F.substring("text", 1, 12)),
        F.lit("."),
    )


def _e10_planted(sep: str) -> Column:
    """text + twice its trimmed first-40-char segment, ``sep``-joined —
    the deterministic multi-line/-paragraph variant the line- and
    paragraph-level repetition signals run on (fixture docs are
    single-line)."""
    seg = F.trim(F.substring("text", 1, 40))
    return F.concat(F.col("text"), F.lit(sep), seg, F.lit(sep), seg)


# the BPE segment count mirrored in DuckDB: identical RE2-compatible
# pattern, dollar-quoted so the embedded quote needs no escaping
_BPE_SQL = (
    "len(regexp_extract_all(text, "
    "$$'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+$$"
    "))::BIGINT"
)


def _langid_hits(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in X.STOPWORDS[lang])
    return (
        "len(list_filter(list_filter(regexp_split_to_array(lower(text), '\\s+'),"
        f" x -> x <> ''), x -> list_contains([{words}], x)))"
    )


_E10_CHROME_SQL = "chr(10) || 'cookie consent required' || chr(10) || 'all rights reserved footer'"

# the planted two-line C4 source and its cleaned form, as SQL (mirrors
# _e10_c4_src + functions/text.py:c4_clean_lines)
_E10_C4_SRC_SQL = "text || chr(10) || trim(substr(text, 1, 12)) || '.'"
_E10_C4_CLEAN_SQL = X.c4_clean_lines_sql(_E10_C4_SRC_SQL)

_E10_ORACLE = f"""
WITH t2 AS (
  SELECT doc_id, text || {_E10_CHROME_SQL} AS tt FROM documents),
nthresh AS (
  SELECT greatest(2, floor(0.8 * count(*))::BIGINT + 1) AS th
  FROM documents),
bl AS (
  SELECT doc_id,
         unnest(list_distinct(list_filter(
           list_transform(string_split(tt, chr(10)), x -> trim(lower(x))),
           x -> length(x) >= 4))) AS line
  FROM t2),
freq AS (
  SELECT line FROM bl GROUP BY line
  HAVING count(*) >= (SELECT th FROM nthresh)),
fl AS (SELECT coalesce(list(line), CAST([] AS VARCHAR[])) AS fls FROM freq),
clean AS (
  SELECT t2.doc_id,
         array_to_string(list_filter(string_split(tt, chr(10)),
           ln -> length(trim(lower(ln))) < 4
                 OR NOT list_contains(fls, trim(lower(ln)))), chr(10)) AS ct
  FROM t2, fl),
t AS (
  SELECT doc_id, text,
         {_FP_SQL} AS fp,
         len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))
           AS n_tok,
         len(list_distinct(list_filter(regexp_split_to_array(text, '\\s+'),
                                       x -> x <> ''))) AS n_dist,
         CASE WHEN len(text) > 0 THEN
           len(regexp_replace(text, '[^.,;:!?''"()\\[\\]-]', '', 'g'))::DOUBLE
             / len(text)
         ELSE 0.0 END AS pr,
         {_langid_hits('en')} AS h_en, {_langid_hits('de')} AS h_de,
         {_langid_hits('fr')} AS h_fr, {_langid_hits('es')} AS h_es,
         list_filter(list_transform(regexp_split_to_array(text, '\\r?\\n'),
                                    x -> trim(regexp_replace(x, '\\r+$', ''))),
                     x -> x <> '') AS lf,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     x -> x <> '') AS lt
  FROM documents),
tp AS (
  SELECT t.*,
         text || chr(10) || trim(substr(text, 1, 40))
              || chr(10) || trim(substr(text, 1, 40)) AS ml,
         text || chr(10) || chr(10) || trim(substr(text, 1, 40))
              || chr(10) || chr(10) || trim(substr(text, 1, 40)) AS mp
  FROM t),
tg AS (
  SELECT tp.*,
         {_grams_sql('lt', 2)} AS g2,
         {_grams_sql('lt', 3)} AS g3,
         {_grams_sql('lt', 5)} AS g5,
         {_grams_sql('lt', 10)} AS g10,
         {_LINES_SQL.format(text='ml')} AS lml,
         {_paragraphs_sql('mp')} AS pmp
  FROM tp)
SELECT t.doc_id,
       fp,
       n_tok AS n_tokens,
       n_dist AS n_distinct,
       len(text) AS n_chars_calc,
       round(pr, 6) AS punct_ratio,
       {_BPE_SQL} AS n_bpe,
       CASE WHEN greatest(h_en, h_de, h_fr, h_es) = 0 THEN 'und'
            WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es THEN 'en'
            WHEN h_de >= h_fr AND h_de >= h_es THEN 'de'
            WHEN h_fr >= h_es THEN 'fr'
            ELSE 'es' END AS lang_pred,
       round(((CASE WHEN n_tok BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END)
              + (CASE WHEN n_tok > 0 THEN n_dist::DOUBLE / n_tok ELSE 0.0 END)
              + (1.0 - least(pr * 5, 1.0))) / 3, 6) AS quality,
       round(CASE WHEN len(lf) > 0
             THEN 1.0 - len(list_distinct(lf))::DOUBLE / len(lf)
             ELSE 0.0 END, 6) AS dup_line_ratio,
       round(CASE WHEN n_tok - 1 > 0
             THEN 1.0 - len(list_distinct(list_transform(
                    range(1, len(lt)), i -> lt[i] || ' ' || lt[i + 1])))::DOUBLE
                  / (n_tok - 1)
             ELSE 0.0 END, 6) AS dup_bigram_ratio,
       round(CASE WHEN len(lf) > 0
             THEN len(list_filter(lf, x ->
                    regexp_matches(x, '^(?:[-*•]|\\d{{1,3}}[.)])\\s')))::DOUBLE
                  / len(lf)
             ELSE 0.0 END, 6) AS bullet_ratio,
       round(CASE WHEN len(lf) > 0
             THEN len(list_filter(lf, x ->
                    regexp_matches(x, '(?:\\.\\.\\.|…)$')))::DOUBLE / len(lf)
             ELSE 0.0 END, 6) AS ellipsis_ratio,
       round(CASE WHEN n_tok > 0
             THEN len(list_filter(lt, x ->
                    regexp_matches(x, '[A-Za-z]')))::DOUBLE / n_tok
             ELSE 0.0 END, 6) AS alpha_word_ratio,
       round(CASE WHEN n_tok > 0
             THEN (length(regexp_replace(text, '[^#…]', '', 'g'))
                   + len(regexp_extract_all(text, '(\\.\\.\\.)')))::DOUBLE
                  / n_tok
             ELSE 0.0 END, 6) AS symbol_word_ratio,
       round({_top_ngram_char_fraction_sql('g2', 'lt', 2)}, 6)
         AS top2_char_frac,
       round({_top_ngram_char_fraction_sql('g3', 'lt', 3)}, 6)
         AS top3_char_frac,
       round({_dup_ngram_char_fraction_sql('g5', 'lt', 5)}, 6)
         AS dup5_char_frac,
       round({_dup_ngram_char_fraction_sql('g10', 'lt', 10)}, 6)
         AS dup10_char_frac,
       round({_dup_char_fraction_sql('lml')}, 6) AS dup_line_char_frac,
       round(CASE WHEN len(pmp) > 0
             THEN 1.0 - len(list_distinct(pmp))::DOUBLE / len(pmp)
             ELSE 0.0 END, 6) AS dup_para_ratio,
       round({_dup_char_fraction_sql('pmp')}, 6) AS dup_para_char_frac,
       len(clean.ct)::BIGINT AS clean_n_chars,
       (n_tok >= 50 AND n_tok <= 100000
        AND (CASE WHEN n_tok > 0 THEN
               list_sum(list_transform(lt, x -> length(x)))::DOUBLE / n_tok
             ELSE 0.0 END) >= 3.0
        AND (CASE WHEN n_tok > 0 THEN
               list_sum(list_transform(lt, x -> length(x)))::DOUBLE / n_tok
             ELSE 0.0 END) <= 10.0
        AND (CASE WHEN n_tok > 0
             THEN length(regexp_replace(text, '[^#]', '', 'g'))::DOUBLE
                  / n_tok
             ELSE 0.0 END) <= 0.1
        AND (CASE WHEN n_tok > 0
             THEN (length(regexp_replace(text, '[^…]', '', 'g'))
                   + len(regexp_extract_all(text, '(\\.\\.\\.)')))::DOUBLE
                  / n_tok
             ELSE 0.0 END) <= 0.1
        AND (CASE WHEN len(lf) > 0
             THEN len(list_filter(lf, x ->
                    regexp_matches(x, '^(?:[-*•]|\\d{{1,3}}[.)])\\s')))::DOUBLE
                  / len(lf)
             ELSE 0.0 END) <= 0.9
        AND (CASE WHEN len(lf) > 0
             THEN len(list_filter(lf, x ->
                    regexp_matches(x, '(?:\\.\\.\\.|…)$')))::DOUBLE / len(lf)
             ELSE 0.0 END) <= 0.3
        AND (CASE WHEN n_tok > 0
             THEN len(list_filter(lt, x ->
                    regexp_matches(x, '[A-Za-z]')))::DOUBLE / n_tok
             ELSE 0.0 END) >= 0.8
        AND {X.gopher_stop_hits_sql('text')} >= 2) AS gopher_quality_keep,
       len({_E10_C4_CLEAN_SQL})::BIGINT AS c4_clean_n_chars,
       (len(regexp_extract_all({_E10_C4_CLEAN_SQL}, '[.!?]')) >= 1
        AND NOT contains(lower({_E10_C4_SRC_SQL}), 'lorem ipsum')
        AND NOT contains(lower({_E10_C4_SRC_SQL}), '{{')) AS c4_keep
FROM tg t JOIN clean ON t.doc_id = clean.doc_id
"""

# Gopher's repetition keep compares the ROUNDED signal columns, so it
# wraps the projection (SQL cannot reference sibling aliases in-place)
_E10_ORACLE = f"""
SELECT *,
       (dup_line_ratio <= 0.30 AND dup_para_ratio <= 0.30
        AND dup_line_char_frac <= 0.20 AND dup_para_char_frac <= 0.20
        AND top2_char_frac <= 0.20 AND top3_char_frac <= 0.18
        AND dup5_char_frac <= 0.15 AND dup10_char_frac <= 0.10)
         AS gopher_repetition_keep
FROM ({_E10_ORACLE}) inner_e10
"""


def _e14_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The temporal-join family, tagged and unioned (r5: absorbs the
    former e17 range-join slot so a registry slot frees up for the
    data-selection entry): 'asof' = each event matched to the user's
    latest prior event (single-shuffle union+window,
    operators/temporal.py); 'range' = events inside each user's
    first-2-day window (bucketed equi-join, never a cartesian theta
    join); 'bloomsemi' (r9) = events of high-activity users (count >=
    1.1x the per-user average — the fixture's per-user counts are
    Poisson-tight, so 1.1x selects the top ~10-15% tail at every SF) via bloom_reduced_join
    (operators/joins.py) — the probe side is pruned map-only by a
    broadcast one-row bitmap BEFORE the join shuffle, and the
    no-false-negatives contract makes the result identical to the
    plain join, which is exactly what the oracle runs.  Unified schema
    (tag, event_id, other_id, val)."""
    from sparkall_spark.operators.joins import bloom_reduced_join
    from sparkall_spark.operators.temporal import asof_join, range_join

    ev = load_table(spark, sf_dir, "events")
    asof = asof_join(
        ev,
        ev.select("user_id", "ts", "event_id", "value"),
        on=["user_id"],
        right_cols=["event_id", "value"],
        strict=True,
        how="inner",
    ).select(
        F.lit("asof").alias("tag"),
        "event_id",
        F.col("asof_event_id").alias("other_id"),
        F.round("asof_value", 6).alias("val"),
    )
    intervals = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("start_ts"))
        .withColumn("end_ts", F.col("start_ts") + F.expr("INTERVAL 2 DAYS"))
    )
    rng = range_join(
        ev, intervals, on=["user_id"], point="ts",
        range_start="start_ts", range_end="end_ts",
    ).select(
        F.lit("range").alias("tag"),
        "event_id",
        F.col("user_id").alias("other_id"),
        F.lit(None).cast("double").alias("val"),
    )
    # one aggregate serves all three consumers (threshold scalar, hot
    # filter, bloom build) — uncached it would shuffle events three
    # times; the count table is per-user (metadata-scale), so the
    # eager driver threshold read is the cheap side of the trade
    from sparkall_spark.operators._cache import persist_tracked

    counts = persist_tracked(
        ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_ev"))
    )
    agg = counts.agg(
        (F.avg("n_ev") * 1.1).alias("t"),
        F.sum("n_ev").cast("bigint").alias("n_probe"),
    ).first()
    thr, n_probe = agg["t"], int(agg["n_probe"])
    hot = counts.filter(F.col("n_ev") >= F.lit(thr))
    # r11 (VERDICT Next #5): the CMS planning gate runs IN the gated
    # path with PINNED parameters — both join-key sketches go through
    # save_sketch -> load_sketch, and the returned pinned dicts are
    # threaded into semi_reduce_gate, so the width/depth validation
    # (operators/sketches.py:cms_join_cardinality) executes under the
    # driver oracle every round, not just in unit tests.  The gate's
    # one-sided estimate decides bloom-reduce vs plain join; the bloom
    # path's no-false-negatives contract makes both results identical,
    # so the oracle is path-independent by construction.  Sketch
    # frames are per-key counters over user_id (bounded: depth*width),
    # the probe-row total rides the counts agg above (no extra scan).
    import tempfile

    from sparkall_spark.operators.joins import semi_reduce_gate
    from sparkall_spark.operators.sketches import (
        cms_sketch,
        load_sketches,
        save_sketches,
    )

    sk_dir = tempfile.mkdtemp(prefix="sparkall_e14_cms_")
    # both sketches come off the PERSISTED per-user counts table, not a
    # raw-events rescan: the weighted build (weight_col=n_ev) is the
    # identical counter table by CMS linearity, over ~|users| rows
    # instead of |events| — exactly the "sketches come from the daily
    # key-telemetry pass" discipline the gate's docstring prescribes
    # (first cut scanned raw events and cost +3.8 s at sf0.1).  r12
    # (VERDICT Next #2): the pair goes through ONE tagged-union write
    # and ONE shared read (save_sketches/load_sketches) — the per-
    # sketch lifecycle cost ~9 tiny jobs of pure stage scheduling
    sk_params = {"depth": 3, "width": 1024}
    save_sketches(
        {
            "probe": (
                cms_sketch(counts, "user_id", depth=3, width=1024,
                           weight_col="n_ev"),
                sk_params,
            ),
            "build": (
                cms_sketch(hot.select("user_id"), "user_id",
                           depth=3, width=1024),
                sk_params,
            ),
        },
        sk_dir, "cms",
    )
    loaded = load_sketches(spark, sk_dir, "cms")
    (probe_sk, p_params), (build_sk, b_params) = (
        loaded["probe"], loaded["build"],
    )
    should_reduce, _est = semi_reduce_gate(
        probe_sk, build_sk, depth=3, probe_rows=n_probe,
        width=1024, params_probe=p_params, params_build=b_params,
    )
    # the gate consumed the sketches EAGERLY (its estimate is a driver
    # scalar); nothing downstream reads sk_dir, so reclaim it now
    # instead of leaking a temp dir per run (review catch)
    import shutil

    shutil.rmtree(sk_dir, ignore_errors=True)
    # m_bits pinned (skips auto-sizing's build.count() job): 2^14 bits
    # carries ~1k hot users at 16 bits/key; at larger SF the fpp merely
    # rises and the real join still removes every false positive
    if should_reduce:
        joined = bloom_reduced_join(
            ev, hot, on="user_id", probe_key="user_id", m_bits=1 << 14
        )
    else:  # estimate says the filter keeps ~everything: join directly
        joined = ev.join(hot, "user_id")
    bsemi = joined.select(
        F.lit("bloomsemi").alias("tag"),
        "event_id",
        F.col("user_id").alias("other_id"),
        F.col("n_ev").cast("double").alias("val"),
    )
    return asof.unionByName(rng).unionByName(bsemi)


_E14_ORACLE = """
SELECT 'asof' AS tag, a.event_id AS event_id, b.event_id AS other_id,
       round(b.value, 6) AS val
FROM events a ASOF JOIN events b
  ON a.user_id = b.user_id AND b.ts < a.ts
UNION ALL
SELECT 'range' AS tag, e.event_id, e.user_id AS other_id,
       CAST(NULL AS DOUBLE) AS val
FROM events e JOIN (
  SELECT user_id, min(ts) AS start_ts, min(ts) + INTERVAL 2 DAY AS end_ts
  FROM events GROUP BY user_id) iv ON e.user_id = iv.user_id
WHERE iv.start_ts <= e.ts AND e.ts < iv.end_ts
UNION ALL
SELECT 'bloomsemi' AS tag, e.event_id, e.user_id AS other_id,
       CAST(h.n_ev AS DOUBLE) AS val
FROM events e JOIN (
  SELECT user_id, count(*) AS n_ev FROM events GROUP BY user_id
  HAVING count(*) >= 1.1 * (SELECT avg(cnt) FROM (
      SELECT count(*)::DOUBLE AS cnt FROM events GROUP BY user_id))
) h ON e.user_id = h.user_id
"""


def _e15_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window functions (SURVEY §2.5 — absent in the reference,
    exposed here): top-3 orders per customer by totalprice."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
            F.col("rk").cast("bigint").alias("rk"),
        )
    )


_E15_ORACLE = """
SELECT o_custkey AS custkey, o_orderkey AS orderkey,
       o_totalprice AS totalprice,
       row_number() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey) AS rk
FROM orders QUALIFY rk <= 3
"""


def _e16_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column handling: pull a typed field out of the
    events props JSON (JVM-side get_json_object, no UDF)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )


_E16_ORACLE = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
"""


def _e28_data_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The data-selection family (operators/selection.py), tagged and
    unioned in the slot freed by merging the range join into e14:
    'cap' = greedy per-source n_chars budget (stratum_token_cap);
    'bucket:<head|middle|tail>' = CCNet perplexity terciles under the
    doc_id%5 reference unigram LM; 'dsir' = Gumbel-top-k importance
    resampling toward the lang='en' target domain (exact BIGINT
    micro-logp weights + micro-quantized Gumbel keys); 'report' = the
    one-aggregate corpus health summary (n_docs/total_tokens/distinct
    fingerprints encoded into the shared columns); 'mix:<lang>' (r10)
    = multinomial temperature-sampling weights at XLM-R's alpha=0.3
    (selection.temperature_mix_weights — one count agg over the
    corpus, micro-exact mirror); 'epochs:<lang>' (r11) = the epoch
    SAMPLER (selection.apply_mix_weights) gated end-to-end — per-(lang,
    epoch) row counts + doc-id sums of the materialized mixed corpus
    vs the SQL twin of the integer LCG replicate rule.  Unified schema
    (tag, doc_id, a, b)."""
    from sparkall_spark.operators import lm as L
    from sparkall_spark.operators import selection as SEL

    docs = load_table(spark, sf_dir, "documents")
    cap = SEL.stratum_token_cap(
        docs, "source", "n_chars", token_budget=50_000,
        id_col="doc_id", order_col="n_chars",
    ).select(
        F.lit("cap").alias("tag"),
        "doc_id",
        F.col("n_chars").cast("bigint").alias("a"),
        F.lit(None).cast("bigint").alias("b"),
    )
    # r7: the four model trainings each run ONE eager totals job over a
    # persisted counts table (lm.py/selection.py now cache the counts,
    # so training touches its corpus slice once) — and the four jobs
    # are independent, so they run on a thread pool instead of
    # serializing ~4 sequential driver jobs at construction time.
    import concurrent.futures as _fut

    with _fut.ThreadPoolExecutor(max_workers=4) as pool:
        f_ref = pool.submit(
            L.train_unigram_lm, docs.filter(F.col("doc_id") % 5 == 0)
        )
        f_tgt = pool.submit(
            L.train_unigram_lm, docs.filter(F.col("lang") == "en")
        )
        f_th = pool.submit(
            SEL.train_hashed_ngram_model,
            docs.filter(F.col("lang") == "en"),
            n_buckets=10_000, max_n=2,
        )
        f_rh = pool.submit(
            SEL.train_hashed_ngram_model,
            docs.filter(F.col("doc_id") % 5 == 0),
            n_buckets=10_000, max_n=2,
        )
        ref_model, ref_unk = f_ref.result()
        target_model, target_unk = f_tgt.result()
        th_model, th_unk = f_th.result()
        rh_model, rh_unk = f_rh.result()
    scored = L.lm_score(docs, ref_model, ref_unk).select(
        "doc_id", "n_lm_tokens", "sum_logp_micro"
    )
    bucket = SEL.perplexity_buckets(scored).select(
        F.concat(F.lit("bucket:"), F.col("bucket")).alias("tag"),
        "doc_id",
        F.col("sum_logp_micro").alias("a"),
        F.col("n_lm_tokens").alias("b"),
    )
    dsir = SEL.dsir_select(
        docs, target_model, target_unk, ref_model, ref_unk,
        k=100, seed=11,
    ).select(
        F.lit("dsir").alias("tag"),
        "doc_id",
        F.col("logw_micro").alias("a"),
        F.col("key_micro").alias("b"),
    )
    # r7: the paper's actual feature space — hashed unigram+bigram
    # occurrences in a fixed 10k-bucket domain (selection.py
    # hashed-ngram family; models are <=n_buckets rows, always
    # broadcast).  Same target/raw slices, independent seed; the models
    # were trained on the pool above.
    dsirh = SEL.dsir_select_hashed(
        docs, th_model, th_unk, rh_model, rh_unk,
        k=100, n_buckets=10_000, max_n=2, seed=13,
    ).select(
        F.lit("dsirh").alias("tag"),
        "doc_id",
        F.col("logw_micro").alias("a"),
        F.col("key_micro").alias("b"),
    )
    dsir = dsir.unionByName(dsirh)
    from sparkall_spark.operators.pipeline import corpus_report

    report = corpus_report(docs).select(
        F.lit("report").alias("tag"),
        F.col("n_docs").alias("doc_id"),
        F.col("total_tokens").alias("a"),
        F.col("n_distinct").alias("b"),
    )
    # 'mix' (r10): multinomial temperature-sampling weights per lang
    # (XLM-R alpha=0.3) — micro-exact across engines by the micro-logp
    # discipline (selection.temperature_mix_weights).  Persisted: the
    # weights frame feeds BOTH the mix leg and the epochs sampler leg
    # (metadata-scale — a handful of language rows).
    from sparkall_spark.operators._cache import persist_tracked

    w = persist_tracked(SEL.temperature_mix_weights(docs, "lang", alpha=0.3))
    mix = w.select(
        F.concat(F.lit("mix:"), F.col("lang")).alias("tag"),
        F.col("n_docs").alias("doc_id"),
        F.col("weight_micro").alias("a"),
        F.col("boost_micro").alias("b"),
    )
    # 'epochs:<lang>' (r11): the epoch SAMPLER driver-gated
    # (selection.apply_mix_weights — the one r10 operator without an
    # oracle leg): materialize the temperature-mixed corpus, then
    # per-(lang, epoch) row counts AND doc-id sums — the sum pins
    # exactly WHICH documents got a k-th copy (the integer LCG
    # replicate decision), not just how many.  Map-only sampler over a
    # broadcast weights table; output is epochs x langs rows.
    epochs = (
        SEL.apply_mix_weights(
            docs.select("doc_id", "lang"), w, "lang", seed=7
        )
        .groupBy("lang", "epoch")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("a"),
            F.sum("doc_id").cast("bigint").alias("b"),
        )
        .select(
            F.concat(F.lit("epochs:"), F.col("lang")).alias("tag"),
            F.col("epoch").cast("bigint").alias("doc_id"),
            "a",
            "b",
        )
    )
    return (
        cap.unionByName(bucket)
        .unionByName(dsir)
        .unionByName(report)
        .unionByName(mix)
        .unionByName(epochs)
    )


def _e28_oracle_sql() -> str:
    """Literal mirror: greedy running-sum cap, the LM-model CTEs (the
    same micro-logp build the e20/lm mirrors pin), rank terciles, and
    the DSIR weight + Gumbel-key top-k.  The DSIR raw model is the
    doc_id%5 reference model (shared with the bucket leg) so the
    mirror trains two models, not three."""
    from sparkall_spark.operators.selection import (
        gumbel_micro_sql,
        hashed_ngram_list_sql,
    )

    tok = (
        "list_filter(regexp_split_to_array(lower(text), '\\s+'),"
        " x -> x <> '')"
    )
    g = gumbel_micro_sql("doc_id", seed=11)
    gh = gumbel_micro_sql("doc_id", seed=13)
    hng = hashed_ngram_list_sql("t", 10_000, 2)
    from sparkall_spark.operators.selection import (
        mix_sql as _sel_mix_sql,
        temperature_mix_sql,
    )

    _mix_oracle = temperature_mix_sql("documents", "lang", alpha=0.3)
    # the epoch sampler's replicate decision: k = boost//1e6 + [LCG %
    # 1e6 < boost % 1e6] over the SAME portable hash the Spark side
    # folds (apply_mix_weights / sampling._mix, seed pinned at 7)
    _mix_lcg = _sel_mix_sql("doc_id", 7)
    # ONE materialized weights table shared by the mix and epochs legs
    # (the logreg-chain lesson from this same round: DuckDB re-executes
    # a derived table per embedding site)
    return f"""
WITH mixw AS MATERIALIZED ({_mix_oracle.strip()}),
tok AS (
  SELECT doc_id, unnest({tok}) AS token FROM documents),
hfeat AS (
  SELECT doc_id, unnest({hng}) AS bucket
  FROM (SELECT doc_id, {tok} AS t FROM documents)),
hraw AS (
  SELECT bucket, count(*) AS c FROM hfeat
  WHERE doc_id % 5 = 0 GROUP BY bucket),
hrtot AS (SELECT coalesce(sum(c), 0) AS total FROM hraw),
hrmodel AS (
  SELECT bucket,
         CAST(round(ln((c + 1.0) / (total + 10000)) * 1000000) AS BIGINT)
           AS lp
  FROM hraw, hrtot),
hrunk AS (
  SELECT CAST(round(ln(1.0 / (total + 10000)) * 1000000) AS BIGINT) AS u
  FROM hrtot),
htgt AS (
  SELECT bucket, count(*) AS c FROM hfeat
  WHERE doc_id IN (SELECT doc_id FROM documents WHERE lang = 'en')
  GROUP BY bucket),
httot AS (SELECT coalesce(sum(c), 0) AS total FROM htgt),
htmodel AS (
  SELECT bucket,
         CAST(round(ln((c + 1.0) / (total + 10000)) * 1000000) AS BIGINT)
           AS lp
  FROM htgt, httot),
htunk AS (
  SELECT CAST(round(ln(1.0 / (total + 10000)) * 1000000) AS BIGINT) AS u
  FROM httot),
hweights AS (
  SELECT f.doc_id, count(*) AS n_lm_tokens,
         CAST(sum(coalesce(tm.lp, htunk.u) - coalesce(rm.lp, hrunk.u))
              AS BIGINT) AS logw_micro
  FROM hfeat f
  LEFT JOIN htmodel tm USING (bucket)
  LEFT JOIN hrmodel rm USING (bucket), htunk, hrunk
  GROUP BY f.doc_id),
ref AS (
  SELECT token, count(*) AS c FROM tok WHERE doc_id % 5 = 0
  GROUP BY token),
tot AS (SELECT sum(c) AS total, count(*) AS v FROM ref),
model AS (
  SELECT token,
         CAST(round(ln((c + 1.0) / (total + v + 1)) * 1000000) AS BIGINT)
           AS lp
  FROM ref, tot),
unk AS (
  SELECT CAST(round(ln(1.0 / (total + v + 1)) * 1000000) AS BIGINT) AS u
  FROM tot),
per AS (
  SELECT t.doc_id, count(*) AS n_lm_tokens,
         CAST(sum(coalesce(m.lp, unk.u)) AS BIGINT) AS sum_logp_micro
  FROM tok t LEFT JOIN model m USING (token), unk
  GROUP BY t.doc_id),
scored AS (
  SELECT d.doc_id,
         CAST(coalesce(per.n_lm_tokens, 0) AS BIGINT) AS n_lm_tokens,
         CAST(coalesce(per.sum_logp_micro, 0) AS BIGINT) AS sum_logp_micro
  FROM documents d LEFT JOIN per USING (doc_id)),
tref AS (
  SELECT token, count(*) AS c FROM tok
  WHERE doc_id IN (SELECT doc_id FROM documents WHERE lang = 'en')
  GROUP BY token),
ttot AS (SELECT sum(c) AS total, count(*) AS v FROM tref),
tmodel AS (
  SELECT token,
         CAST(round(ln((c + 1.0) / (total + v + 1)) * 1000000) AS BIGINT)
           AS lp
  FROM tref, ttot),
tunk AS (
  SELECT CAST(round(ln(1.0 / (total + v + 1)) * 1000000) AS BIGINT) AS u
  FROM ttot),
dweights AS (
  SELECT t.doc_id, count(*) AS n_lm_tokens,
         CAST(sum(coalesce(tm.lp, tunk.u) - coalesce(m.lp, unk.u))
              AS BIGINT) AS logw_micro
  FROM tok t
  LEFT JOIN tmodel tm USING (token)
  LEFT JOIN model m USING (token), tunk, unk
  GROUP BY t.doc_id)
SELECT 'cap' AS tag, doc_id, CAST(n_chars AS BIGINT) AS a,
       CAST(NULL AS BIGINT) AS b
FROM (
  SELECT doc_id, n_chars, sum(CAST(n_chars AS BIGINT)) OVER (
      PARTITION BY source ORDER BY n_chars DESC, doc_id
      ROWS UNBOUNDED PRECEDING) AS run
  FROM documents)
WHERE run <= 50000
UNION ALL
SELECT 'bucket:' || CASE CAST(floor(3.0 * (rk - 1) / n) AS INT)
         WHEN 0 THEN 'head' WHEN 1 THEN 'middle' ELSE 'tail' END AS tag,
       doc_id, sum_logp_micro AS a, n_lm_tokens AS b
FROM (
  SELECT doc_id, n_lm_tokens, sum_logp_micro,
         row_number() OVER (
           ORDER BY (CAST(sum_logp_micro AS DOUBLE)
                     / CAST(n_lm_tokens AS DOUBLE)) DESC, doc_id) AS rk,
         count(*) OVER () AS n
  FROM scored WHERE n_lm_tokens > 0)
UNION ALL
SELECT 'bucket:tail' AS tag, doc_id, sum_logp_micro AS a,
       n_lm_tokens AS b
FROM scored WHERE n_lm_tokens <= 0
UNION ALL
SELECT * FROM (
  SELECT 'dsir' AS tag, doc_id, logw_micro AS a,
         logw_micro + {g} AS b
  FROM dweights WHERE n_lm_tokens > 0
  ORDER BY b DESC, doc_id LIMIT 100)
UNION ALL
SELECT * FROM (
  SELECT 'dsirh' AS tag, doc_id, logw_micro AS a,
         logw_micro + {gh} AS b
  FROM hweights WHERE n_lm_tokens > 0
  ORDER BY b DESC, doc_id LIMIT 100)
UNION ALL
SELECT 'report' AS tag, CAST(count(*) AS BIGINT) AS doc_id,
       CAST(coalesce(sum(len(list_filter(
         regexp_split_to_array(text, '\\s+'),
         x -> x <> ''))), 0) AS BIGINT) AS a,
       CAST(count(DISTINCT {_FP_SQL}) AS BIGINT) AS b
FROM (SELECT coalesce(text, '') AS text FROM documents)
UNION ALL
SELECT 'mix:' || grp AS tag, n_docs AS doc_id,
       weight_micro AS a, boost_micro AS b
FROM mixw
UNION ALL
SELECT 'epochs:' || lang AS tag, CAST(epoch AS BIGINT) AS doc_id,
       count(*)::BIGINT AS a, sum(did)::BIGINT AS b
FROM (
  SELECT d.doc_id AS did, d.lang,
         unnest(range((w.boost_micro // 1000000)
           + CASE WHEN ({_mix_lcg}) % 1000000 < w.boost_micro % 1000000
                  THEN 1 ELSE 0 END)) AS epoch
  FROM documents d JOIN mixw w ON w.grp = d.lang) q
GROUP BY lang, epoch
"""


def _e18_cube_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimensional aggregation family in one entry (merged
    e18+e19 so a registry slot frees up for the path/GROUP_CONCAT
    query): CUBE over (returnflag, linestatus) rollups left-joined with
    the linestatus pivot (explicit value list — no extra distinct job,
    stable schema at any scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    cube = (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.count("*").alias("n"),
        )
        .select(
            F.col("l_returnflag").alias("flag"),
            F.col("l_linestatus").alias("status"),
            "sum_qty",
            "n",
        )
    )
    piv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 4))
        .select(
            F.col("l_returnflag").alias("pflag"),
            F.col("O").alias("qty_open"),
            F.col("F").alias("qty_filled"),
        )
    )
    return cube.join(piv, cube.flag == piv.pflag, "left").select(
        "flag", "status", "sum_qty", "n", "qty_open", "qty_filled"
    )


_E18_ORACLE = """
WITH cube_t AS (
  SELECT l_returnflag AS flag, l_linestatus AS status,
         round(sum(l_quantity), 4) AS sum_qty, count(*) AS n
  FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)),
piv AS (
  SELECT l_returnflag AS pflag,
         round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 4)
           AS qty_open,
         round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 4)
           AS qty_filled
  FROM lineitem GROUP BY 1)
SELECT flag, status, sum_qty, n, qty_open, qty_filled
FROM cube_t LEFT JOIN piv ON flag = pflag
"""


def _e20_pretrain_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed pipeline: quality filter -> lang-id -> exact dedup ->
    CCNet-style LM perplexity filter (unigram LM trained on the
    doc_id%13 reference slice, exact integer micro-logp threshold, r4)
    -> NB quality-classifier gate (trained on the doc_id%11 slice
    labeled lang=='en', exact integer log-odds threshold, r5) ->
    benchmark decontamination (8-gram overlap vs a deterministic eval
    slice, r4; r6 runs it through the BLOOM-prefilter path — a
    fixed-size bitmap prunes corpus grams map-side and the exact
    confirm join removes bloom false positives, so the results and the
    oracle are bit-identical to the exact path while the bench set no
    longer broadcasts raw) — one lazy plan end-to-end
    (operators/pipeline.py, operators/lm.py, operators/classifier.py,
    operators/decontam.py)."""
    from pyspark.sql import functions as F

    from sparkall_spark.operators.pipeline import prepare_documents

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 17 == 0).select("text")
    lm_ref = docs.filter(F.col("doc_id") % 13 == 0)
    labeled = docs.filter(F.col("doc_id") % 11 == 0).withColumn(
        "label", F.col("lang") == "en"
    )
    out = prepare_documents(
        docs,
        min_quality=0.5,
        decontam_bench=bench,
        decontam_n=8,
        decontam_prefilter="bloom",
        lm_ref=lm_ref,
        lm_max_perplexity=_E20_MAX_PPL,
        classifier_labeled=labeled,
        classifier_min_prob=_E20_NB_MIN_PROB,
    )
    return out.select("doc_id", "lang_pred", "quality")


# LM perplexity cap for the e20 pipeline: fixture perplexities under
# the %13-slice model span ~29-35; 31.0 keeps ~3/4 of the docs, so the
# stage filters non-vacuously in both directions.  The predicate runs
# in the exact integer micro-logp domain (operators/lm.py), so the cap
# needs no float-tie safety margin.
_E20_MAX_PPL = 31.0

from sparkall_spark.operators.lm import lm_threshold_micro as _lm_t_micro

_E20_T_MICRO = _lm_t_micro(_E20_MAX_PPL)

# NB classifier gate (r5): P(en-like) >= 0.5, evaluated as an exact
# integer log-odds comparison; scores are far from the boundary (the
# fixture's class log-odds are O(10^7) micro units), so the cut is
# stable at any SF
_E20_NB_MIN_PROB = 0.5

from sparkall_spark.operators.classifier import (  # noqa: E402
    nb_threshold_micro as _nb_t_micro,
)

_E20_NB_T = _nb_t_micro(_E20_NB_MIN_PROB)

_E20_LM_TOK = (
    "list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')"
)

_E20_ORACLE = f"""
WITH t AS (
  SELECT doc_id, text,
         len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))
           AS n_tok,
         len(list_distinct(list_filter(regexp_split_to_array(text, '\\s+'),
                                       x -> x <> ''))) AS n_dist,
         CASE WHEN len(text) > 0 THEN
           len(regexp_replace(text, '[^.,;:!?''"()\\[\\]-]', '', 'g'))::DOUBLE
             / len(text)
         ELSE 0.0 END AS pr,
         {_langid_hits('en')} AS h_en, {_langid_hits('de')} AS h_de,
         {_langid_hits('fr')} AS h_fr, {_langid_hits('es')} AS h_es,
         list_reduce(
           list_prepend(0::BIGINT,
             [ascii(c) FOR c IN
                list_filter(string_split(
                  regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ''),
                  x -> x <> '')]),
           (acc, c) -> (acc * 31 + c) % 1000000007) AS fp
  FROM documents),
scored AS (
  SELECT doc_id, fp,
         round(((CASE WHEN n_tok BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END)
                + (CASE WHEN n_tok > 0 THEN n_dist::DOUBLE / n_tok ELSE 0.0 END)
                + (1.0 - least(pr * 5, 1.0))) / 3, 6) AS quality,
         CASE WHEN greatest(h_en, h_de, h_fr, h_es) = 0 THEN 'und'
              WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es THEN 'en'
              WHEN h_de >= h_fr AND h_de >= h_es THEN 'de'
              WHEN h_fr >= h_es THEN 'fr'
              ELSE 'es' END AS lang_pred
  FROM t),
surv AS (
  SELECT doc_id, lang_pred, quality FROM (
    SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
    FROM scored WHERE quality >= 0.5) s
  WHERE rn = 1),
-- benchmark decontamination (r4): 8-gram overlap vs the doc_id%17
-- eval slice, same tokenization as the engine (lowercased non-empty
-- whitespace tokens)
dtoks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     x -> x <> '') AS tk
  FROM documents),
dgrams AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
             range(1, greatest(len(tk) - 7, 0) + 1),
             i -> array_to_string(tk[i:i+7], ' ')))) AS gram
  FROM dtoks WHERE len(tk) >= 8),
bgrams AS (
  SELECT DISTINCT gram FROM dgrams WHERE doc_id % 17 = 0),
dirty AS (
  SELECT DISTINCT doc_id FROM dgrams JOIN bgrams USING (gram)),
-- CCNet-style LM perplexity filter (r4): unigram LM trained on the
-- doc_id%13 slice, add-one smoothing, integer micro-logp scoring —
-- keep docs with sum_logp_micro >= -T_micro * n (exact integers, the
-- same predicate the engine runs; see operators/lm.py)
lmtok AS (
  SELECT doc_id, unnest({_E20_LM_TOK}) AS token FROM documents),
lmref AS (
  SELECT token, count(*) AS c FROM lmtok WHERE doc_id % 13 = 0
  GROUP BY token),
lmtot AS (SELECT sum(c) AS total, count(*) AS v FROM lmref),
lmmodel AS (
  SELECT token,
         CAST(round(ln((c + 1.0) / (total + v + 1)) * 1000000) AS BIGINT)
           AS lp
  FROM lmref, lmtot),
lmunk AS (
  SELECT CAST(round(ln(1.0 / (total + v + 1)) * 1000000) AS BIGINT) AS u
  FROM lmtot),
lmper AS (
  SELECT t.doc_id, count(*) AS n,
         CAST(sum(coalesce(m.lp, lmunk.u)) AS BIGINT) AS s
  FROM lmtok t LEFT JOIN lmmodel m USING (token), lmunk
  GROUP BY t.doc_id),
lmkeep AS (
  SELECT doc_id FROM lmper
  WHERE n > 0 AND s >= -({_E20_T_MICRO}) * n),
-- NB quality-classifier gate (r5): binary multinomial NB trained on
-- the doc_id%11 slice (lang='en' positive), add-one smoothing over the
-- union vocabulary, per-feature micro log-odds as BIGINT, keep when
-- prior + sum(w) >= the quantized logit threshold (operators/classifier.py)
nbfeat AS (
  SELECT lang = 'en' AS pos, unnest({_E20_LM_TOK}) AS feature
  FROM documents WHERE doc_id % 11 = 0),
nbcnt AS (
  SELECT feature,
         sum(CASE WHEN pos THEN 1 ELSE 0 END) AS c_pos,
         sum(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS c_neg
  FROM nbfeat GROUP BY feature),
nbtot AS (SELECT sum(c_pos) AS t_pos, sum(c_neg) AS t_neg,
                 count(*) AS v FROM nbcnt),
nbnn AS (
  SELECT sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS n_pos,
         sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS n_neg
  FROM documents WHERE doc_id % 11 = 0),
nbmodel AS (
  SELECT feature,
         CAST(round((ln((c_pos + 1.0) / (t_pos + v + 1))
                     - ln((c_neg + 1.0) / (t_neg + v + 1))) * 1000000)
              AS BIGINT) AS w
  FROM nbcnt, nbtot),
nbunk AS (
  SELECT CAST(round((ln(1.0 / (t_pos + v + 1))
                     - ln(1.0 / (t_neg + v + 1))) * 1000000) AS BIGINT) AS u
  FROM nbtot),
nbprior AS (
  SELECT CAST(round(ln(n_pos::DOUBLE / n_neg) * 1000000) AS BIGINT) AS p
  FROM nbnn),
nbfx AS (SELECT doc_id, unnest({_E20_LM_TOK}) AS feature FROM documents),
nbper AS (
  SELECT nbfx.doc_id, CAST(sum(coalesce(m.w, nbunk.u)) AS BIGINT) AS s
  FROM nbfx LEFT JOIN nbmodel m USING (feature), nbunk
  GROUP BY nbfx.doc_id),
-- zero-token docs never reach the gate (quality >= 0.5 already
-- requires tokens), so the per-doc inner join is exact here
nbkeep AS (
  SELECT nbper.doc_id FROM nbper, nbprior
  WHERE nbper.s + nbprior.p >= {_E20_NB_T})
SELECT * FROM surv
WHERE doc_id IN (SELECT doc_id FROM lmkeep)
  AND doc_id IN (SELECT doc_id FROM nbkeep)
  AND doc_id NOT IN (SELECT doc_id FROM dirty)
"""


def _e21_stats_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus/table statistics as a tagged long-form union (r6: absorbs
    the BPE trainer's distributed half so it is driver-gated):

    - ``flagstats``: the r2 statistical aggregates beyond the
      reference's five (exact interpolated percentiles, correlation,
      covariance, stddev), unpivoted to (key, stat, value).
    - ``wordfreq``: the exact top-500 word-frequency table from
      operators/bpe.py:word_frequency_table — ONE map-side-combined
      aggregate + TakeOrdered top-k, ties broken by word so the
      truncation is stable cross-engine.  This is the corpus-wide pass
      BPE training runs on; the merge loop itself is driver-side on
      the bounded table and stays tests-only (rank-greedy merging is
      not SQL-expressible — operators/bpe.py:1-35).
    - ``overlap`` (r6): cross-corpus n-gram overlap diagnostics.
    - ``fuzzydecon`` (r8): NEAR-duplicate benchmark decontamination
      (minhash_decontaminate) — per contaminated doc, the bench-match
      count and exact max jaccard, mirrored by an all-pairs oracle.
    - ``embdecon`` (r8): SEMANTIC decontamination — embedding-cosine
      contamination against a planted eval set (the affine-copy trick
      from e06), exact cosines, all-pairs mirror.
    - ``unorm`` (r9): Unicode NFC normalization
      (functions/text.unicode_normalize, Arrow-batched unicodedata)
      gated against DuckDB's independent nfc_normalize — decomposed
      e+U+0301 sequences planted in-query must recompose; stats are
      the portable fingerprint of the normalized text and the
      composition count.

    (The r8 kmv/phrase/bm25 legs moved to ``e29_index_telemetry`` in
    r9 — the VERDICT-endorsed rebalance that keeps this entry readable
    and puts the index/sketch telemetry where the saved-index receipts
    live.)"""
    from sparkall_spark.operators import bpe as B

    li = load_table(spark, sf_dir, "lineitem")
    flag = li.groupBy(F.col("l_returnflag").alias("key")).agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("p50_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.9)), 4).alias("p90_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 4).alias("cov_qty_disc"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("std_price"),
    )
    stats = ["p50_qty", "p90_qty", "corr_qty_price", "cov_qty_disc", "std_price"]
    flag_long = flag.select(
        F.lit("flagstats").alias("family"),
        "key",
        F.expr(
            "stack(5, "
            + ", ".join(f"'{s}', {s}" for s in stats)
            + ") as (stat, value)"
        ),
    )
    docs = load_table(spark, sf_dir, "documents")
    wf = B.word_frequency_table(docs, max_words=500).select(
        F.lit("wordfreq").alias("family"),
        F.col("word").alias("key"),
        F.lit("freq").alias("stat"),
        F.col("freq").cast("double").alias("value"),
    )
    # r6 leg 3: cross-corpus overlap diagnostics (train/val leakage
    # measurement, operators/decontam.py:corpus_overlap) between two
    # source slices; n=3 because the fixture's templated sentences
    # share trigrams across sources (71 shared grams, 22/25 docs at
    # sf0.01) while 5-grams are disjoint
    from sparkall_spark.operators.decontam import corpus_overlap

    ov = corpus_overlap(
        docs.filter(F.col("source") == "src0"),
        docs.filter(F.col("source") == "src1"),
        n=3,
    )
    ov_long = ov.select(
        F.lit("overlap").alias("family"),
        F.lit("src0|src1").alias("key"),
        F.expr(
            "stack(8, "
            "'n_grams_a', cast(n_grams_a as double), "
            "'n_grams_b', cast(n_grams_b as double), "
            "'n_shared', cast(n_shared as double), "
            "'gram_jaccard', gram_jaccard, "
            "'containment_a_in_b', containment_a_in_b, "
            "'containment_b_in_a', containment_b_in_a, "
            "'n_docs_a', cast(n_docs_a as double), "
            "'n_docs_a_overlapping', cast(n_docs_a_overlapping as double)"
            ") as (stat, value)"
        ),
    )
    # r8 leg 4 (r7 VERDICT item 5): FUZZY benchmark decontamination —
    # published pipelines (GPT-3 appendix C, Llama 2) drop training
    # docs that are NEAR-duplicates of eval items, which exact n-gram
    # matching misses when the eval text was lightly edited.
    # operators/decontam.py:minhash_decontaminate: the bench side's
    # band table is broadcast, the corpus side is a map-only signature
    # pass — no corpus shuffle; candidates get exact token-set Jaccard.
    # doc_id % 10 == 7 plays the eval set.  Recall at t=0.9 with 16x4
    # banding: a true-j pair is missed with prob (1-j^4)^16 <= 3.9e-8
    # — ~6e-3 expected misses across ALL of sf0.1's 158K grey-zone
    # pairs, the same risk class as the hash-green e03 oracle.
    from sparkall_spark.operators.decontam import minhash_decontaminate

    fuzzy = minhash_decontaminate(
        docs.filter(F.col("doc_id") % 10 != 7),
        docs.filter(F.col("doc_id") % 10 == 7),
        ngram=1,
        threshold=0.9,
        mode="annotate",
    )
    fuzzy_long = fuzzy.filter(F.col("contaminated")).select(
        F.lit("fuzzydecon").alias("family"),
        F.col("doc_id").cast("string").alias("key"),
        F.expr(
            "stack(2, "
            "'n_bench_matches', cast(n_bench_matches as double), "
            "'max_jaccard', max_jaccard"
            ") as (stat, value)"
        ),
    )
    # r8 leg 6: SEMANTIC (embedding-cosine) decontamination — the
    # third decontamination rung (exact n-grams -> MinHash -> embedding
    # cosine), catching paraphrased eval leakage.  The fixture has no
    # natural >=0.95 pairs (max pairwise cosine ~0.51), so — exactly as
    # e06 does — the "eval set" is planted in-query: an elementwise
    # affine copy (x*1.01 + 0.002, cosine ~0.99998 to its source) of
    # every 25th vector, mirrored in the oracle; precisely those
    # sources must come back contaminated.  Broadcast nested-loop
    # cosine scan, exact values, no corpus shuffle
    # (operators/decontam.py:embedding_decontaminate).
    from sparkall_spark.operators.decontam import embedding_decontaminate

    emb = load_table(spark, sf_dir, "embeddings")
    planted_bench = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: x * F.lit(1.01) + F.lit(0.002),
        ).alias("embedding")
    )
    sem = embedding_decontaminate(
        emb, planted_bench, threshold=0.95, mode="annotate"
    )
    sem_long = sem.filter(F.col("contaminated")).select(
        F.lit("embdecon").alias("family"),
        F.col("vec_id").cast("string").alias("key"),
        F.expr(
            "stack(2, "
            "'n_bench_matches', cast(n_bench_matches as double), "
            "'max_cosine', max_cosine"
            ") as (stat, value)"
        ),
    )
    # 'unorm' (r9): Unicode NFC normalization gated end-to-end against
    # DuckDB's independent nfc_normalize — the fixture is ASCII, so
    # decomposed sequences are planted in-query ('e' -> 'e'+U+0301);
    # NFC must recompose them ('fp' = portable fingerprint of the
    # normalized text, 'delta_len' = how many compositions happened)
    from sparkall_spark.functions.text import fingerprint, unicode_normalize

    dec = F.regexp_replace(F.col("text"), "e", "e\u0301")
    norm = unicode_normalize(dec, "NFC")
    unorm_long = docs.select(
        F.lit("unorm").alias("family"),
        F.col("doc_id").cast("string").alias("key"),
        fingerprint(norm).cast("double").alias("__fp"),
        (F.length(dec) - F.length(norm)).cast("double").alias("__dl"),
    ).select(
        "family",
        "key",
        F.expr(
            "stack(2, 'fp', __fp, 'delta_len', __dl) as (stat, value)"
        ),
    )
    # 'read' (r10): Flesch reading ease per document — the readability
    # gate education-quality corpus filters apply
    # (functions/text.flesch_reading_ease; SQL-mirrored via flesch_sql)
    from sparkall_spark.functions.text import flesch_reading_ease

    read_long = docs.select(
        F.lit("read").alias("family"),
        F.col("doc_id").cast("string").alias("key"),
        F.lit("flesch").alias("stat"),
        flesch_reading_ease("text").alias("value"),
    ).filter(F.col("value").isNotNull())
    return (
        flag_long.unionByName(wf)
        .unionByName(ov_long)
        .unionByName(fuzzy_long)
        .unionByName(sem_long)
        .unionByName(unorm_long)
        .unionByName(read_long)
    )


# canonical SQL renderings of the KMV hash chain (poly token hash ->
# two-round LCG mix) — built from the SAME lockstep mirrors the Spark
# side uses (sampling.mix_sql; features._P_MOD poly fold), so a change
# to either hash desynchronizes loudly instead of silently drifting
# from a hand-copied constant block.
from sparkall_spark.operators.sampling import mix_sql as _mix_sql_render

from sparkall_spark.operators.features import (  # noqa: E402
    portable_token_hash_sql as _poly_sql_render,
)

_KMV_POLY_SQL = _poly_sql_render("w")
_KMV_MIX_SQL = _mix_sql_render(_KMV_POLY_SQL, seed=0)

_E21_ORACLE = """
WITH flag AS (
  SELECT l_returnflag AS key,
         round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
         round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
         round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
         round(covar_samp(l_quantity, l_discount), 4) AS cov_qty_disc,
         round(stddev_samp(l_extendedprice), 4) AS std_price
  FROM lineitem GROUP BY 1),
wf AS (
  SELECT word, count(*) AS freq
  FROM (SELECT unnest(list_filter(
          regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) AS word
        FROM documents)
  GROUP BY word
  ORDER BY freq DESC, word ASC
  LIMIT 500)
SELECT 'flagstats' AS family, key, s.stat,
       CASE s.stat
         WHEN 'p50_qty' THEN p50_qty
         WHEN 'p90_qty' THEN p90_qty
         WHEN 'corr_qty_price' THEN corr_qty_price
         WHEN 'cov_qty_disc' THEN cov_qty_disc
         ELSE std_price
       END AS value
FROM flag, (VALUES ('p50_qty'), ('p90_qty'), ('corr_qty_price'),
                   ('cov_qty_disc'), ('std_price')) AS s(stat)
UNION ALL
SELECT 'wordfreq' AS family, word AS key, 'freq' AS stat,
       freq::DOUBLE AS value
FROM wf
UNION ALL
SELECT 'overlap' AS family, 'src0|src1' AS key, s.stat,
       CASE s.stat
         WHEN 'n_grams_a' THEN (SELECT count(*) FROM ovga)::DOUBLE
         WHEN 'n_grams_b' THEN (SELECT count(*) FROM ovgb)::DOUBLE
         WHEN 'n_shared' THEN (SELECT count(*) FROM ovsh)::DOUBLE
         WHEN 'gram_jaccard' THEN (SELECT round(
             CASE WHEN (SELECT count(*) FROM ovga) + (SELECT count(*) FROM ovgb)
                       - (SELECT count(*) FROM ovsh) > 0
             THEN (SELECT count(*) FROM ovsh)::DOUBLE
                  / ((SELECT count(*) FROM ovga) + (SELECT count(*) FROM ovgb)
                     - (SELECT count(*) FROM ovsh))
             ELSE 0.0 END, 6))
         WHEN 'containment_a_in_b' THEN (SELECT round(
             CASE WHEN (SELECT count(*) FROM ovga) > 0
             THEN (SELECT count(*) FROM ovsh)::DOUBLE
                  / (SELECT count(*) FROM ovga)
             ELSE 0.0 END, 6))
         WHEN 'containment_b_in_a' THEN (SELECT round(
             CASE WHEN (SELECT count(*) FROM ovgb) > 0
             THEN (SELECT count(*) FROM ovsh)::DOUBLE
                  / (SELECT count(*) FROM ovgb)
             ELSE 0.0 END, 6))
         WHEN 'n_docs_a' THEN (SELECT count(*)
             FROM documents WHERE source = 'src0')::DOUBLE
         ELSE (SELECT count(DISTINCT doc_id) FROM ovg
               WHERE source = 'src0'
                 AND gram IN (SELECT gram FROM ovsh))::DOUBLE
       END AS value
FROM (VALUES ('n_grams_a'), ('n_grams_b'), ('n_shared'), ('gram_jaccard'),
             ('containment_a_in_b'), ('containment_b_in_a'),
             ('n_docs_a'), ('n_docs_a_overlapping')) AS s(stat)
UNION ALL
SELECT 'fuzzydecon' AS family, CAST(fdh.doc_id AS VARCHAR) AS key, s.stat,
       CASE s.stat WHEN 'n_bench_matches' THEN fdh.n_matches::DOUBLE
            ELSE fdh.max_j END AS value
FROM (
  SELECT doc_id, count(*) AS n_matches, max(jac) AS max_j
  FROM (SELECT c.doc_id,
               round(len(list_intersect(c.toks, b.toks))::DOUBLE
                     / len(list_distinct(list_concat(c.toks, b.toks))),
                     6) AS jac
        FROM fdc c, fdb b)
  WHERE jac >= 0.9
  GROUP BY doc_id) fdh,
  (VALUES ('n_bench_matches'), ('max_jaccard')) AS s(stat)
UNION ALL
SELECT 'embdecon' AS family, CAST(sd.vec_id AS VARCHAR) AS key, s.stat,
       CASE s.stat WHEN 'n_bench_matches' THEN sd.n_matches::DOUBLE
            ELSE sd.max_cos END AS value
FROM (
  SELECT vec_id, count(*) AS n_matches, max(cos) AS max_cos
  FROM (SELECT c.vec_id,
               round(list_cosine_similarity(c.embedding::DOUBLE[],
                                            b.be), 6) AS cos
        FROM embeddings c,
             (SELECT list_transform(embedding::DOUBLE[],
                                    x -> x * 1.01 + 0.002) AS be
              FROM embeddings WHERE vec_id % 25 = 0) b)
  WHERE cos >= 0.95
  GROUP BY vec_id) sd,
  (VALUES ('n_bench_matches'), ('max_cosine')) AS s(stat)
"""

# the overlap leg's gram CTEs, prepended to the e21 oracle (DuckDB
# resolves CTE references lexically, so they must precede the SELECT)
_E21_ORACLE = (
    """
WITH ovd AS (
  SELECT doc_id, source,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     x -> x <> '') t
  FROM documents WHERE source IN ('src0', 'src1')),
ovg AS (
  SELECT doc_id, source,
         unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                 FOR i IN generate_series(1, len(t) - 2)])) AS gram
  FROM ovd WHERE len(t) >= 3),
ovga AS (SELECT DISTINCT gram FROM ovg WHERE source = 'src0'),
ovgb AS (SELECT DISTINCT gram FROM ovg WHERE source = 'src1'),
ovsh AS (SELECT gram FROM ovga INTERSECT SELECT gram FROM ovgb),
fdt AS (
  SELECT doc_id, list_distinct(list_filter(
        regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) toks
  FROM documents),
fdc AS (SELECT * FROM fdt WHERE doc_id % 10 <> 7 AND len(toks) > 0),
fdb AS (SELECT * FROM fdt WHERE doc_id % 10 = 7 AND len(toks) > 0),
"""
    + _E21_ORACLE.strip().removeprefix("WITH")
)


def _e29_index_telemetry(
    spark: SparkSession, sf_dir: str, include_zorder: bool = True
) -> DataFrame:
    """Index + sketch telemetry as a tagged long-form union (r9: the
    VERDICT-endorsed split of e21's r8 telemetry legs, now running
    against the SAVED index layout):

    ``include_zorder=False`` is the bench A/B knob (r12, VERDICT Next
    #5): it drops ONLY the zorder write-lifecycle leg so its isolated
    cost can be read same-session (scripts/bench_variance_probe.py /
    BENCH_NOTES); the driver always runs the full entry.

    - ``idxmeta``: the saved index's corpus stats (n_docs) read back
      from its ``_meta`` side table — gates the save/append/compact/
      load lifecycle (r10: the index is built via an initial save, an
      ingest-batch append, and an in-place compaction).
    - ``phrase``: exact phrase search for "hash table" served from the
      SAVED token-bucket-partitioned index (operators/postings.py:
      save_postings) — every per-token lookup carries the literal
      ``tok_bucket`` predicate, so the executed scans are
      partition-PRUNED directory reads, not index scans (the pruning
      itself is plan-asserted in tests/test_postings.py); positional
      scan mirror.
    - ``bm25``: BM25 scores over the same saved index in exact-micro
      form, with corpus stats from ``_meta`` and doc lengths from
      ``_doclen`` — ZERO full-index passes at query time; formula-
      identical SQL mirror.
    - ``kmv``: deterministic KMV distinct sketches (vocab size per
      source + src0/src1 overlap), value-hash-exact vs the same k-min
      construction in SQL.
    - ``hh``: exact phi-heavy hitters over the corpus vocabulary via
      the bounded-state Misra-Gries candidate pass + one exact refine
      (operators/sketches.py:heavy_hitters) — partition-layout
      independent by the MG guarantee, so the plain GROUP BY/HAVING
      oracle gates the sketch end-to-end (a dropped true heavy hitter
      would hash-mismatch).
    - ``q``: deterministic bottom-k sampled quantiles of the document
      length distribution (operators/sketches.py:sampled_quantiles) —
      the k rows whose doc_id hash ranks smallest form a uniform,
      layout-independent, mergeable sample; exact interpolated
      percentiles over it mirror bit-for-bit (integer-valued n_chars
      keeps both engines' interpolation formulas ulp-aligned).
    - ``tq`` (r9): boolean term retrieval over the SAME saved index
      (operators/postings.py:term_query) — 'and_tf' = summed term
      frequency of docs containing BOTH query terms, 'or_n' = matched
      term count of docs containing EITHER; each per-term lookup is a
      pruned partition read; plain tf-join SQL mirror.
    - ``cms`` (r9): Count-Min point-frequency estimates for a fixed
      probe list over the corpus vocabulary
      (operators/sketches.py:cms_sketch/cms_query) — the counter table
      is a pure function of the word multiset and the query is depth
      chained broadcast lookups, so the estimates mirror bit-for-bit
      (same hash family, same seeds) in the SQL oracle; includes a
      never-seen probe (gates the zero path).
    - ``zorder`` (r11): the Z-order clustered layout lifecycle — an
      in-entry write_zordered round-trip, read back through a
      trailing-dimension slice and value-gated against the raw table
      (tests/test_zorder.py keeps the row-group skip receipt)."""
    import tempfile

    from sparkall_spark.operators import sketches as K
    from sparkall_spark.operators.postings import (
        append_postings,
        bm25_scores,
        build_postings,
        compact_postings,
        load_doclen,
        load_postings,
        phrase_search,
        read_postings_meta,
        save_postings,
        term_query,
    )

    docs = load_table(spark, sf_dir, "documents")
    # r12 (guide §2.6, the e03/e28 thread pattern): the zorder leg's
    # eager work (one min/max agg + one range-partitioned sort-write
    # over events) shares NOTHING with the postings lifecycle below
    # (documents-derived), yet ran sequentially after it — ~2-3 s of
    # independent jobs serialized behind ~4-5 s of index maintenance.
    # Submit the write from a helper thread at entry start so the two
    # eager phases overlap; the thread is joined before the returned
    # plan reads zdir, so laziness/teardown semantics are unchanged.
    zorder_fut = None
    zorder_pool = None
    if include_zorder:
        import concurrent.futures as _fut
        import os

        from sparkall_spark.sources.sinks import write_zordered

        def _zorder_write() -> str:
            zdir = _tmpdir("sparkall_e29_z_")
            ev = load_table(spark, sf_dir, "events").select(
                "event_id", "user_id", "value"
            )
            write_zordered(
                ev, zdir, ["user_id", "event_id"], bits=12, n_files=8
            )
            return zdir

        if os.environ.get("SPARKALL_E29_SEQ") == "1":
            # same-session A/B knob (scripts/profile_entries.py):
            # run the leg sequentially, as pre-r12 code did
            class _Now:
                def __init__(self) -> None:
                    self._z = _zorder_write()

                def result(self) -> str:
                    return self._z

                def shutdown(self) -> None:
                    pass

            zorder_fut = _Now()
            zorder_pool = zorder_fut
        else:
            zorder_pool = _fut.ThreadPoolExecutor(max_workers=1)
            zorder_fut = zorder_pool.submit(_zorder_write)
    # build + persist the index through the FULL maintenance lifecycle
    # (r10): initial save over 4/5 of the corpus, one ingest-batch
    # append (the remaining 1/5), then an in-place compaction back to
    # one file per bucket — append->compact == fresh rebuild is
    # hash-equality-tested in tests/test_postings.py, and every query
    # leg below now gates the lifecycle end-to-end through its oracle
    # (the oracles mirror the full corpus, so a row lost or duplicated
    # by append/compact hash-mismatches)
    # r13 (guide §2.3/§6, VERDICT r12 next #5): both the initial save
    # and the ingest append build BUCKET-ALIGNED postings — the token
    # explode is shuffled once on tok_bucket and aggregated in place,
    # and the writers skip their full-data repartition (prebucketed):
    # one exchange per index write instead of two.  Plan receipt in
    # tests/test_postings.py (exchange-count assert); rows/meta/
    # lookups hash-identical to the plain path.
    idx_dir = _tmpdir("sparkall_e29_idx_")
    save_postings(
        build_postings(docs.filter(F.col("doc_id") % 5 != 0), n_buckets=16),
        idx_dir,
        n_buckets=16,
        prebucketed=True,
    )
    append_postings(
        build_postings(docs.filter(F.col("doc_id") % 5 == 0), n_buckets=16),
        idx_dir,
        prebucketed=True,
    )
    compact_postings(spark, idx_dir)
    meta = read_postings_meta(spark, idx_dir)
    saved = load_postings(spark, idx_dir)
    meta_long = spark.range(1).select(
        F.lit("idxmeta").alias("family"),
        F.lit("corpus").alias("key"),
        F.lit("n_docs").alias("stat"),
        F.lit(float(meta["n_docs"])).alias("value"),
    )
    ph = phrase_search(saved, "hash table", n_buckets=16)
    ph_long = ph.select(
        F.lit("phrase").alias("family"),
        F.col("doc_id").cast("string").alias("key"),
        F.expr(
            "stack(2, "
            "'n_matches', cast(n_matches as double), "
            "'first_pos', cast(element_at(match_positions, 1) as double)"
            ") as (stat, value)"
        ),
    )
    bm = bm25_scores(
        saved,
        "hash table scan",
        exact_micro=True,
        n_docs=meta["n_docs"],
        avg_len=meta["avg_len"],
        doclen=load_doclen(spark, idx_dir),
        n_buckets=16,
    )
    bm_long = bm.select(
        F.lit("bm25").alias("family"),
        F.col("doc_id").cast("string").alias("key"),
        F.lit("bm25_micro").alias("stat"),
        F.col("bm25_micro").cast("double").alias("value"),
    )
    # vocabulary telemetry: KMV distinct sketches (per-source vocab +
    # src0/src1 overlap) — k-row sketches instead of COUNT(DISTINCT)
    # shuffles at 100 TB
    words = docs.select(
        "source",
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
        ).alias("word"),
    )
    vsk = K.kmv_sketch(words, "word", k=64, group_cols=["source"])
    kmv_card = vsk.select(
        F.lit("kmv").alias("family"),
        F.col("source").alias("key"),
        F.lit("est_distinct").alias("stat"),
        F.col("est_distinct").alias("value"),
    )
    ov_est = K.kmv_overlap_estimate(
        vsk.filter(F.col("source") == "src0").drop("source"),
        vsk.filter(F.col("source") == "src1").drop("source"),
        k=64,  # explicit: skips two eager .first() reads of kmv_k
    )
    kmv_ov = ov_est.select(
        F.lit("kmv").alias("family"),
        F.lit("src0|src1").alias("key"),
        F.expr(
            "stack(3, 'est_union', est_union, 'jaccard_est', jaccard_est, "
            "'est_intersection', est_intersection) as (stat, value)"
        ),
    )
    # which words dominate: exact 1%-heavy hitters, MG-candidates +
    # one exact refine — <= k+1 rows leave each partition in pass 1
    hh = K.heavy_hitters(words, "word", phi=0.01)
    hh_long = hh.select(
        F.lit("hh").alias("family"),
        F.col("item").alias("key"),
        F.expr(
            "stack(2, "
            "'count', cast(cnt as double), "
            "'share', share"
            ") as (stat, value)"
        ),
    )
    # how values are distributed: bottom-k sampled quantiles of the
    # doc-length distribution — k (hash, value) pairs out, whatever
    # the corpus size
    sq = K.sampled_quantiles(
        docs, "n_chars", "doc_id", probs=[0.25, 0.5, 0.9], k=128
    )
    q_long = sq.select(
        F.lit("q").alias("family"),
        F.col("prob").cast("string").alias("key"),
        F.lit("quantile_est").alias("stat"),
        F.col("quantile_est").alias("value"),
    ).unionByName(
        sq.select(
            F.lit("q").alias("family"),
            F.lit("sample").alias("key"),
            F.lit("n_sampled").alias("stat"),
            F.col("n_sampled").cast("double").alias("value"),
        ).distinct()
    )
    tq_and = term_query(saved, ["hash", "table"], n_buckets=16)
    tq_or = term_query(saved, ["hash", "table"], mode="or", n_buckets=16)
    tq_long = tq_and.select(
        F.lit("tq").alias("family"),
        F.col("doc_id").cast("string").alias("key"),
        F.lit("and_tf").alias("stat"),
        F.col("total_tf").cast("double").alias("value"),
    ).unionByName(
        tq_or.select(
            F.lit("tq").alias("family"),
            F.col("doc_id").cast("string").alias("key"),
            F.lit("or_n").alias("stat"),
            F.col("n_terms_matched").cast("double").alias("value"),
        )
    )
    # point-frequency telemetry: CMS estimates for fixed probe words
    # (one absent) — bounded depth*width counter state instead of a
    # full vocabulary count at 100 TB
    csk = K.cms_sketch(
        words.select("word"), "word", depth=_E29_CMS_DEPTH,
        width=_E29_CMS_WIDTH,
    )
    probes = spark.createDataFrame(
        [(w,) for w in _E29_CMS_PROBES], ["word"]
    )
    cms_long = K.cms_query(
        csk, probes, "word", depth=_E29_CMS_DEPTH, width=_E29_CMS_WIDTH
    ).select(
        F.lit("cms").alias("family"),
        F.col("word").alias("key"),
        F.lit("est_count").alias("stat"),
        F.col("est").cast("double").alias("value"),
    )
    # 'zorder' (r11, VERDICT Next #3): the z-order clustered layout
    # lifecycle driver-gated — write a Morton-clustered copy of the
    # events projection in-entry (sources/sinks.py:write_zordered),
    # read a TRAILING-dimension slice back THROUGH the layout, and
    # value-gate those rows against the raw table in the oracle.  A row
    # lost, duplicated, or mangled by the clustered write now
    # hash-mismatches every round; the row-group skip receipt (the
    # performance half) stays plan-asserted in tests/test_zorder.py.
    out = (
        meta_long.unionByName(ph_long)
        .unionByName(bm_long)
        .unionByName(kmv_card)
        .unionByName(kmv_ov)
        .unionByName(hh_long)
        .unionByName(q_long)
        .unionByName(tq_long)
        .unionByName(cms_long)
    )
    if not include_zorder:  # bench A/B probe path only
        return out
    zdir = zorder_fut.result()  # join the overlapped write (see top)
    zorder_pool.shutdown()
    z_long = (
        spark.read.parquet(zdir)
        .filter((F.col("event_id") >= 100) & (F.col("event_id") < 200))
        .select(
            F.lit("zorder").alias("family"),
            F.col("event_id").cast("string").alias("key"),
            F.expr(
                "stack(2, "
                "'user_id', cast(user_id as double), "
                "'value', cast(value as double)"
                ") as (stat, value)"
            ),
        )
    )
    return out.unionByName(z_long)


#: CMS leg parameters — shared between the e29 entry and oracle builder
_E29_CMS_DEPTH = 3
_E29_CMS_WIDTH = 1024
_E29_CMS_PROBES = ("the", "data", "hash", "qzxunseen")


_E29_TQ_SQL = """
UNION ALL
SELECT 'tq' AS family, CAST(doc_id AS VARCHAR) AS key, 'and_tf' AS stat,
       sum(tf)::DOUBLE AS value
FROM bmp WHERE token IN ('hash', 'table')
GROUP BY doc_id HAVING count(*) = 2
UNION ALL
SELECT 'tq' AS family, CAST(doc_id AS VARCHAR) AS key, 'or_n' AS stat,
       count(*)::DOUBLE AS value
FROM bmp WHERE token IN ('hash', 'table')
GROUP BY doc_id
"""


# 'zorder' family mirror: the raw rows the trailing-dim slice must
# return after the round-trip through the Morton-clustered layout —
# the layout changes WHERE rows live, never which rows exist
_E29_ZORDER_SQL = """
UNION ALL
SELECT 'zorder' AS family, CAST(event_id AS VARCHAR) AS key,
       s.stat AS stat,
       CASE s.stat WHEN 'user_id' THEN user_id::DOUBLE
            ELSE value::DOUBLE END AS value
FROM events CROSS JOIN (VALUES ('user_id'), ('value')) s(stat)
WHERE event_id >= 100 AND event_id < 200
"""


def _e29_cms_oracle_sql() -> str:
    """'cms' family mirror: per-(d,bucket) counts over the same corpus
    word stream (the hhw CTE), probed at the same bucket indexes —
    bucket arithmetic rendered by the sketch module itself so the hash
    family/seed schedule can never drift between engines."""
    from sparkall_spark.operators.sketches import _cms_bucket_sql

    d, w = _E29_CMS_DEPTH, _E29_CMS_WIDTH
    counter_branches = " UNION ALL ".join(
        f"SELECT {i} AS d, {_cms_bucket_sql('w', i, w)} AS bucket FROM hhw"
        for i in range(d)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT '{p}' AS pw, {i} AS d,"
        f" {_cms_bucket_sql(repr(p), i, w)} AS bucket"
        for p in _E29_CMS_PROBES
        for i in range(d)
    )
    return f"""
UNION ALL
SELECT 'cms' AS family, pw AS key, 'est_count' AS stat,
       MIN(COALESCE(c.cnt, 0))::DOUBLE AS value
FROM ({probe_rows}) p
LEFT JOIN (
  SELECT d, bucket, COUNT(*)::BIGINT AS cnt
  FROM ({counter_branches}) GROUP BY d, bucket
) c USING (d, bucket)
GROUP BY pw
"""


_E29_ORACLE = (
    """
WITH kmvh AS (
  SELECT source, {_KMV_MIX_SQL} AS h
  FROM (SELECT source, unnest(list_filter(
          regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) AS w
        FROM documents)),
kmvs AS (
  SELECT source, list_sort(list(DISTINCT h))[1:64] AS hs
  FROM kmvh GROUP BY source),
kmvu AS (
  SELECT list_sort(list_distinct(list_concat(a.hs, b.hs)))[1:64] AS uk,
         a.hs AS ha, b.hs AS hb
  FROM kmvs a, kmvs b WHERE a.source = 'src0' AND b.source = 'src1'),
phh AS (
  SELECT doc_id, list_filter([i FOR i IN generate_series(1, len(toks) - 1)],
             i -> toks[i] = 'hash' AND toks[i+1] = 'table') AS hits
  FROM (SELECT doc_id, list_filter(
          regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') toks
        FROM documents)),
bmp AS (
  SELECT token, doc_id, count(*)::DOUBLE AS tf
  FROM (SELECT doc_id, unnest(list_filter(
          regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) AS token
        FROM documents)
  GROUP BY 1, 2),
bml AS (SELECT doc_id, sum(tf) AS len FROM bmp GROUP BY 1),
bmn AS (SELECT count(*)::BIGINT AS n, avg(len) AS al FROM bml),
bmd AS (SELECT token, count(*) AS df FROM bmp
        WHERE token IN ('hash', 'scan', 'table') GROUP BY 1),
hhw AS (SELECT unnest(list_filter(
          regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) AS w
        FROM documents),
hhc AS (SELECT w, count(*)::BIGINT AS cnt FROM hhw GROUP BY 1),
hhn AS (SELECT count(*)::BIGINT AS n FROM hhw),
bkq AS (
  SELECT {_KMV_MIX_SQL} AS h, n_chars::DOUBLE AS v
  FROM (SELECT CAST(doc_id AS VARCHAR) AS w, n_chars FROM documents
        WHERE n_chars IS NOT NULL AND doc_id IS NOT NULL)),
bks AS (SELECT v FROM bkq QUALIFY row_number() OVER (ORDER BY h, v) <= 128)
SELECT 'idxmeta' AS family, 'corpus' AS key, 'n_docs' AS stat,
       (SELECT count(*) FROM bml)::DOUBLE AS value
UNION ALL
SELECT 'phrase' AS family, CAST(doc_id AS VARCHAR) AS key, s.stat,
       CASE s.stat WHEN 'n_matches' THEN len(hits)::DOUBLE
            ELSE (hits[1] - 1)::DOUBLE END AS value
FROM phh, (VALUES ('n_matches'), ('first_pos')) AS s(stat)
WHERE len(hits) > 0
UNION ALL
SELECT 'bm25' AS family, CAST(p.doc_id AS VARCHAR) AS key,
       'bm25_micro' AS stat,
       CAST(sum(CAST(round(
           ln(1 + (bmn.n - bmd.df + 0.5) / (bmd.df + 0.5))
           * p.tf * 2.2
           / (p.tf + 1.2 * (0.25 + 0.75 * l.len / bmn.al))
           * 1000000.0) AS BIGINT)) AS DOUBLE) AS value
FROM bmp p, bmd, bmn, bml l
WHERE p.token = bmd.token AND l.doc_id = p.doc_id
GROUP BY p.doc_id
UNION ALL
SELECT 'kmv' AS family, source AS key, 'est_distinct' AS stat,
       round(CASE WHEN len(hs) < 64 THEN len(hs)::DOUBLE
             ELSE 63.0 * 2147483647 / hs[64] END, 4) AS value
FROM kmvs
UNION ALL
SELECT 'kmv' AS family, 'src0|src1' AS key, s.stat,
       CASE s.stat
         WHEN 'est_union' THEN eu
         WHEN 'jaccard_est' THEN je
         ELSE round(je * eu, 4)
       END AS value
FROM (SELECT round(CASE WHEN len(uk) < 64 THEN len(uk)::DOUBLE
                   ELSE 63.0 * 2147483647 / uk[64] END, 4) AS eu,
             round(len(list_intersect(list_intersect(uk, ha), hb))::DOUBLE
                   / len(uk), 6) AS je
      FROM kmvu),
     (VALUES ('est_union'), ('jaccard_est'), ('est_intersection')) AS s(stat)
UNION ALL
SELECT 'hh' AS family, w AS key, s.stat,
       CASE s.stat WHEN 'count' THEN cnt::DOUBLE
            ELSE round(cnt::DOUBLE / n, 6) END AS value
FROM hhc, hhn, (VALUES ('count'), ('share')) AS s(stat)
WHERE cnt::DOUBLE >= 0.01 * n
UNION ALL
SELECT 'q' AS family, '0.25' AS key, 'quantile_est' AS stat,
       round((SELECT quantile_cont(v, 0.25) FROM bks), 6) AS value
UNION ALL
SELECT 'q' AS family, '0.5' AS key, 'quantile_est' AS stat,
       round((SELECT quantile_cont(v, 0.5) FROM bks), 6) AS value
UNION ALL
SELECT 'q' AS family, '0.9' AS key, 'quantile_est' AS stat,
       round((SELECT quantile_cont(v, 0.9) FROM bks), 6) AS value
UNION ALL
SELECT 'q' AS family, 'sample' AS key, 'n_sampled' AS stat,
       (SELECT count(*) FROM bks)::DOUBLE AS value
"""
).replace("{_KMV_MIX_SQL}", _KMV_MIX_SQL)

_E21_UNORM_SQL = """
UNION ALL
SELECT 'unorm' AS family, CAST(doc_id AS VARCHAR) AS key, s.stat,
       CASE s.stat WHEN 'fp' THEN fp ELSE dl END AS value
FROM (
  SELECT doc_id,
         list_reduce(
           list_prepend(0::BIGINT,
             [ascii(c)::BIGINT FOR c IN
                list_filter(string_split(
                  regexp_replace(trim(lower(n)), '\\s+', ' ', 'g'), ''),
                  x -> x <> '')]),
           (acc, c) -> (acc * 31 + c) % 1000000007)::DOUBLE AS fp,
         (length(d) - length(n))::DOUBLE AS dl
  FROM (SELECT doc_id, d, nfc_normalize(d) AS n
        FROM (SELECT doc_id, replace(text, 'e', 'e' || chr(769)) AS d
              FROM documents))
), (VALUES ('fp'), ('delta_len')) s(stat)
"""


def _e21_read_sql() -> str:
    """'read' family mirror: the same Flesch arithmetic rendered by
    functions/text.flesch_sql (shared extraction regexes, operation
    order, 6dp round)."""
    from sparkall_spark.functions.text import flesch_sql

    return f"""
UNION ALL
SELECT 'read' AS family, key, 'flesch' AS stat, value
FROM (SELECT CAST(doc_id AS VARCHAR) AS key, {flesch_sql('text')} AS value
      FROM documents)
WHERE value IS NOT NULL
"""


def _e22_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two near-dup dedup MODES over the same machinery, tagged and
    unioned (the family pattern of e09/e14/e21/e28):

    - 'cluster': transitive near-dup clusters — iterative connected
      components over the *representative* minhash graph
      (operators/dedup.py: minhash_dedup_clusters — intra-clique member
      pairs are never materialized); val = cluster_rep.  Oracle:
      recursive-CTE closure over the exact-jaccard pair set.
    - 'mhinc' (r7): the INCREMENTAL mode (minhash_ledger_table +
      minhash_dedup_incremental) — doc_id % 4 == 1 is the
      already-ingested corpus whose ledger is persisted, doc_id % 8 == 0
      the arriving batch; emits the batch docs that survive (no
      verified >=0.9-jaccard neighbor in the corpus ledger, no
      smaller-id dominating batch survivor); val = distinct-token-set
      size.  At t=0.9 the fixture's qualifying pairs are identical
      token sets, so LSH recall is exact and the all-pairs mirror
      matches bit-for-bit.  broadcast knobs pinned (ingest batches are
      bounded by contract).
    - 'embinc' (r9): the SEMANTIC incremental mode
      (embedding_ledger_table + embedding_dedup_incremental over the
      embeddings table, quantized-cosine metric) — corpus = vec_id%4==1,
      batch = the raw vec_id%4==2 rows (novel, kept) + planted affine
      copies of corpus rows at +100000 (dropped via the ledger) +
      planted copies of batch rows at +200000 (dropped via the
      dominated rule); val = the int8 code self-dot (integer-exact
      cross-engine).  The oracle is the all-pairs quantized-cosine
      mirror: candidate recall at the planted pairs' qcos ~0.9999 is
      1 - ~1e-14 per pair (8 tables x 8 bits), the documented
      miss-odds pattern of the minhash legs.
    Plus the graph-analytics families over events-derived graphs
    (re-merged in r13 — the r12 split into a separate e30 entry made 51
    declared entries and the driver's 50-query correctness window
    silently dropped e29, the VERDICT r12 gate regression; post the r12
    diamond-collapse the graph legs are cheap enough to live here
    again, and the declared set is back at exactly 50):

    - 'tri'/'cc' (r10): per-node exact triangle corners
      (degree-oriented wedge join, Suri-Vassilvitskii) and local
      clustering coefficient over the u -> u+1/u+2 edge set
      (EQUI-joins via explode, never a nested-loop range join); 'cc'
      micro-encodes the 6dp coefficient into the bigint val.
    - 'kcore' (r12): maximal 3-core via iterative peeling
      (graph.k_core, the iterate_with_truncation consumer) over a
      deterministic expander-ish modular graph on the SAME user
      domain: u -> 2u+1, 3u+5 (mod |users|); val = within-core degree.
    """
    from sparkall_spark.functions.text import token_set

    from sparkall_spark.operators import sampling as S

    from sparkall_spark.operators._cache import persist_tracked

    docs = load_table(spark, sf_dir, "documents")
    # persisted (teardown-released): the cluster frame feeds BOTH the
    # 'cluster' leg and the leakage-free 'split' leg — without the pin
    # the iterative-CC subplan executes twice, doubling the entry's
    # dominant cost for no information
    clustered = persist_tracked(
        D.minhash_dedup_clusters(docs, threshold=0.9, broadcast_reps=True)
    )
    clusters = clustered.select(
        F.lit("cluster").alias("family"),
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("cluster_rep").cast("bigint").alias("val"),
    )
    # leakage-free split over the SAME clusters: every near-dup
    # component co-travels into one split (rep_col path — map-only on
    # top of the already-computed representatives); split names encoded
    # as stable bigint codes for the long-form union
    labeled = S.leakage_free_split(
        clustered, _E22_SPLIT_W, rep_col="cluster_rep", seed=_E22_SPLIT_SEED
    )
    split_leg = labeled.select(
        F.lit("split").alias("family"),
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.when(F.col("split") == "train", 0)
        .when(F.col("split") == "val", 1)
        .otherwise(2)
        .cast("bigint")
        .alias("val"),
    )
    corpus = docs.filter(F.col("doc_id") % 4 == 1)
    batch = docs.filter(F.col("doc_id") % 8 == 0)
    ledger = D.minhash_ledger_table(corpus)
    kept, _delta = D.minhash_dedup_incremental(
        batch, ledger, broadcast_reps=True, candidate_strategy="broadcast"
    )
    mhinc = kept.select(
        F.lit("mhinc").alias("family"),
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.size(token_set("text")).cast("bigint").alias("val"),
    )
    from sparkall_spark.operators.quantize import int_dot

    embsrc = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    affine = F.transform(
        "embedding", lambda x: x * F.lit(1.01) + F.lit(0.002)
    ).alias("embedding")
    ecorpus = embsrc.filter(F.col("vec_id") % 4 == 1)
    ebatch = (
        embsrc.filter(F.col("vec_id") % 4 == 2)
        .unionByName(
            embsrc.filter(F.col("vec_id") % 20 == 1).select(
                (F.col("vec_id") + 100000).alias("vec_id"), affine
            )
        )
        .unionByName(
            embsrc.filter(
                (F.col("vec_id") % 4 == 2) & (F.col("vec_id") % 20 == 2)
            ).select((F.col("vec_id") + 200000).alias("vec_id"), affine)
        )
    )
    eledger = D.embedding_ledger_table(ecorpus)
    _ekept, edelta = D.embedding_dedup_incremental(
        ebatch, eledger, threshold=0.99
    )
    embinc = edelta.select(
        F.lit("embinc").alias("family"),
        F.col("vec_id").cast("bigint").alias("doc_id"),
        int_dot(F.col("qvec"), F.col("qvec")).alias("val"),
    )
    # --- graph-analytics legs (tri/cc/kcore, re-merged from e30) ---
    from sparkall_spark.operators import graph as G

    users = persist_tracked(
        load_table(spark, sf_dir, "events")
        .select(F.col("user_id").cast("bigint").alias("u"))
        .distinct()
    )
    # persisted (r12): gedges contains a join and is consumed by BOTH
    # the triangle machinery and the coefficient's own degree pass —
    # unpersisted, each reference recomputed the users self-join
    gedges = persist_tracked(
        users.select(
            "u",
            F.explode(
                F.array(F.col("u") + 1, F.col("u") + 2)
            ).alias("v"),
        )
        .join(users.select(F.col("u").alias("v")), "v")
        .select(F.col("u").alias("id_a"), F.col("v").alias("id_b"))
    )
    # the wedge join is the expensive step: compute per-node triangles
    # ONCE (persisted) and feed both the 'tri' leg and the coefficient
    tri_pn = persist_tracked(G.triangle_count(gedges, per_node=True))
    tri = tri_pn.select(
        F.lit("tri").alias("family"),
        F.col("node").cast("bigint").alias("doc_id"),
        F.col("n_triangles").cast("bigint").alias("val"),
    )
    cc = G.clustering_coefficient(gedges, triangles=tri_pn).select(
        F.lit("cc").alias("family"),
        F.col("node").cast("bigint").alias("doc_id"),
        F.round(F.col("coeff") * F.lit(1000000.0))
        .cast("bigint")
        .alias("val"),
    )
    n_users = users.count()
    kedges = users.select(
        F.col("u").alias("id_a"),
        F.explode(
            F.array(
                (2 * F.col("u") + 1) % n_users,
                (3 * F.col("u") + 5) % n_users,
            )
        ).alias("id_b"),
    )
    kcore = G.k_core(kedges, k=3).select(
        F.lit("kcore").alias("family"),
        F.col("node").cast("bigint").alias("doc_id"),
        F.col("core_degree").cast("bigint").alias("val"),
    )
    return (
        clusters.unionByName(mhinc)
        .unionByName(split_leg)
        .unionByName(embinc)
        .unionByName(tri)
        .unionByName(cc)
        .unionByName(kcore)
    )


#: weights/seed for the e22 'split' leg — shared with the oracle builder
_E22_SPLIT_W = {"train": 0.8, "val": 0.1, "test": 0.1}
_E22_SPLIT_SEED = 7


def _e22_embinc_oracle_sql() -> str:
    """'embinc' family mirror: all-pairs quantized-cosine drops (the
    code arithmetic rendered by operators/quantize.quantize_sql; dots
    and self-dots are integer-exact as doubles).  Non-recursive
    dominated rule, exactly as implemented."""
    from sparkall_spark.operators.quantize import quantize_sql

    qc = quantize_sql("e")
    qcos = (
        "round(CASE WHEN list_dot_product(x.qc::DOUBLE[], x.qc::DOUBLE[]) > 0"
        " AND list_dot_product(y.qc::DOUBLE[], y.qc::DOUBLE[]) > 0"
        " THEN list_dot_product(x.qc::DOUBLE[], y.qc::DOUBLE[])"
        " / sqrt(list_dot_product(x.qc::DOUBLE[], x.qc::DOUBLE[])"
        " * list_dot_product(y.qc::DOUBLE[], y.qc::DOUBLE[]))"
        " ELSE 0.0 END, 6)"
    )
    return f"""
UNION ALL
SELECT 'embinc' AS family, vec_id AS doc_id,
       CAST(list_dot_product(qc::DOUBLE[], qc::DOUBLE[]) AS BIGINT) AS val
FROM (
  WITH ebase AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
  ebatch AS (
    SELECT vec_id, e FROM ebase WHERE vec_id % 4 = 2
    UNION ALL
    SELECT vec_id + 100000, list_transform(e, x -> x * 1.01 + 0.002)
    FROM ebase WHERE vec_id % 20 = 1
    UNION ALL
    SELECT vec_id + 200000, list_transform(e, x -> x * 1.01 + 0.002)
    FROM ebase WHERE vec_id % 4 = 2 AND vec_id % 20 = 2),
  eqc AS (SELECT vec_id, {qc} AS qc FROM ebase WHERE vec_id % 4 = 1),
  eqb AS (SELECT vec_id, {qc} AS qc FROM ebatch),
  vsled AS (
    SELECT DISTINCT x.vec_id FROM eqb x JOIN eqc y ON {qcos} >= 0.99),
  esurv AS (
    SELECT * FROM eqb
    WHERE vec_id NOT IN (SELECT vec_id FROM vsled)),
  edom AS (
    SELECT DISTINCT y.vec_id FROM esurv x JOIN esurv y
    ON x.vec_id < y.vec_id AND {qcos} >= 0.99)
  SELECT vec_id, qc FROM esurv
  WHERE vec_id NOT IN (SELECT vec_id FROM edom)
)
"""


def _e22_split_oracle_sql() -> str:
    """'split' family mirror: rep = min reachable id (the closure the
    'cluster' family already gates), then hash_split arithmetic on the
    rep, then the same name->code CASE as the Spark leg."""
    from sparkall_spark.operators import sampling as S

    case = S.hash_split_sql("rep", _E22_SPLIT_W, seed=_E22_SPLIT_SEED)
    return f"""
UNION ALL
SELECT 'split' AS family, node AS doc_id,
       CAST(CASE ({case}) WHEN 'train' THEN 0 WHEN 'val' THEN 1
            ELSE 2 END AS BIGINT) AS val
FROM (SELECT node, min(r) AS rep FROM reach GROUP BY node)
"""


_E22_ORACLE = """
WITH RECURSIVE
t AS MATERIALIZED (SELECT doc_id, toks, len(toks) AS nt FROM (
      SELECT doc_id, list_distinct(list_filter(
        regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) toks
      FROM documents)),
pairs AS MATERIALIZED (
  -- length-ratio prefilter (r12): J >= 0.9 forces min(len)/max(len)
  -- >= 0.9 (|A∩B| <= min, |A∪B| >= max) — a cheap necessary condition
  -- that kills most of the quadratic pair set before the expensive
  -- list_intersect; 0.899999 covers the 6dp rounding slack.  Values
  -- identical (asserted offline on the full pair set).
  SELECT a.doc_id ia, b.doc_id ib FROM t a, t b
  WHERE a.doc_id < b.doc_id
    AND least(a.nt, b.nt) >= 0.899999 * greatest(a.nt, b.nt)
    AND round(len(list_intersect(a.toks, b.toks))::DOUBLE
        / len(list_distinct(list_concat(a.toks, b.toks))), 6) >= 0.9),
edges AS MATERIALIZED (SELECT ia u, ib v FROM pairs UNION ALL SELECT ib, ia FROM pairs),
reach(node, r) AS (
  SELECT doc_id, doc_id FROM t
  UNION
  SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.node),
mcorpus AS (SELECT * FROM t WHERE doc_id % 4 = 1 AND len(toks) > 0),
mbatch  AS (SELECT * FROM t WHERE doc_id % 8 = 0),
mdrop AS (
  SELECT DISTINCT b.doc_id
  FROM mbatch b JOIN mcorpus c
    ON len(b.toks) > 0
   AND len(list_intersect(b.toks, c.toks))::DOUBLE
       / len(list_distinct(list_concat(b.toks, c.toks))) >= 0.9),
msurv AS (
  SELECT * FROM mbatch
  WHERE doc_id NOT IN (SELECT doc_id FROM mdrop)),
mdom AS (
  SELECT DISTINCT b.doc_id
  FROM msurv b JOIN msurv a
    ON a.doc_id < b.doc_id AND len(a.toks) > 0 AND len(b.toks) > 0
   AND len(list_intersect(a.toks, b.toks))::DOUBLE
       / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.9)
SELECT 'cluster' AS family, node AS doc_id, min(r) AS val
FROM reach GROUP BY node
UNION ALL
SELECT 'mhinc' AS family, doc_id, CAST(len(toks) AS BIGINT) AS val
FROM msurv WHERE doc_id NOT IN (SELECT doc_id FROM mdom)
"""


def _e22_graph_oracle_sql() -> str:
    """'tri'/'cc' family mirror: brute-force triangle enumeration over
    the canonical (x<y, distinct-by-construction) events-derived edge
    set — each triangle once as a<b<c, corners unioned — and the
    textbook 2t/(d(d-1)) coefficient, 6dp-rounded then micro-encoded
    exactly like the Spark leg.

    'kcore' mirror (r12): iterative peeling as a RECURSIVE
    working-table CTE — each round's rows are (node, still-alive
    neighbor list); the recursive term drops sub-k nodes from every
    list via a second reference to the working table (DuckDB allows
    it; the aggregate builds the round's removal list).  Round-capped
    at 40: after the fixpoint rows replicate unchanged, so the capped
    round IS the core (measured peel depth on this expander graph:
    3-4 rounds at sf0.01/sf0.1).

    r13: appended to the e22 oracle chain (the e30 entry is re-merged
    into e22 — see _e22_dedup_clusters); the graph CTEs live inside
    their own subquery, so they cannot collide with the dedup chain's
    names."""
    return """
UNION ALL
SELECT family, doc_id, val FROM (
  WITH RECURSIVE
  gu AS (SELECT DISTINCT CAST(user_id AS BIGINT) AS n FROM events),
  ge AS (SELECT a.n AS x, b.n AS y FROM gu a
         JOIN gu b ON b.n = a.n + 1 OR b.n = a.n + 2),
  gtri AS (
    SELECT e1.x AS a, e1.y AS b, e2.y AS c
    FROM ge e1
    JOIN ge e2 ON e2.x = e1.x AND e2.y > e1.y
    JOIN ge e3 ON e3.x = e1.y AND e3.y = e2.y),
  gcorners AS (
    SELECT a AS node FROM gtri
    UNION ALL SELECT b FROM gtri
    UNION ALL SELECT c FROM gtri),
  gt AS (SELECT node, count(*)::BIGINT AS t FROM gcorners GROUP BY node),
  gdeg AS (SELECT node, count(*)::BIGINT AS d
           FROM (SELECT x AS node FROM ge UNION ALL SELECT y FROM ge)
           GROUP BY node),
  kraw AS (
    SELECT n AS a, (2*n + 1) % (SELECT count(*) FROM gu) AS b FROM gu
    UNION ALL
    SELECT n, (3*n + 5) % (SELECT count(*) FROM gu) FROM gu),
  ke AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
         FROM kraw WHERE a <> b),
  kadj AS (SELECT node, list(nbr) AS nbrs FROM (
      SELECT u AS node, v AS nbr FROM ke UNION ALL SELECT v, u FROM ke)
      GROUP BY node),
  kalive(round, node, nbrs) AS (
    SELECT 0, node, nbrs FROM kadj
    UNION ALL
    SELECT a.round + 1, a.node,
           list_filter(a.nbrs,
                       x -> NOT coalesce(list_contains(r.removed, x), FALSE))
    FROM kalive a CROSS JOIN
         (SELECT list(b.node) AS removed FROM kalive b
          WHERE len(b.nbrs) < 3) r
    WHERE a.round < 40 AND len(a.nbrs) >= 3)
  SELECT 'tri' AS family, node AS doc_id, t AS val FROM gt
  UNION ALL
  SELECT 'cc' AS family, gdeg.node AS doc_id,
         CAST(round(round(CASE WHEN gdeg.d > 1
              THEN 2.0 * COALESCE(gt.t, 0) / (gdeg.d * (gdeg.d - 1))
              ELSE 0.0 END, 6) * 1000000.0) AS BIGINT) AS val
  FROM gdeg LEFT JOIN gt ON gt.node = gdeg.node
  UNION ALL
  SELECT 'kcore' AS family, node AS doc_id,
         CAST(len(nbrs) AS BIGINT) AS val
  FROM kalive WHERE round = 40
)
"""


def _e23_split_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split + GPT-style sequence packing
    (operators/sampling.py, r4): every assignment is pure id-hash
    arithmetic (two LCG rounds mod 2^31-1), so the oracle reproduces it
    bit-for-bit — the property that makes splits stable across engines,
    reruns, and corpus growth.  Packs by the n_chars length column over
    8 independent shards (per-shard windows, never a global ordering)."""
    from sparkall_spark.operators import sampling as S

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    out = S.hash_split(
        docs, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05}, seed=42
    )
    out = S.pack_sequences(
        out, "doc_id", "n_chars", ctx_len=2048, n_shards=8, seed=42
    )
    return out.select(
        "doc_id",
        "split",
        F.col("shard").cast("bigint").alias("shard"),
        F.col("start_offset").cast("bigint").alias("start_offset"),
        F.col("seq_id").cast("bigint").alias("seq_id"),
    )


def _e23_oracle_sql() -> str:
    from sparkall_spark.operators import sampling as S

    split_case = S.hash_split_sql(
        "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05}, seed=42
    )
    mix = S.mix_sql("doc_id", 42)
    return f"""
    WITH d AS (
        SELECT doc_id, n_chars, {split_case} AS split,
               ({mix}) % 8 AS shard, ({mix}) AS mixed
        FROM documents
    ),
    packed AS (
        SELECT doc_id, split, shard,
               sum(n_chars) OVER (
                   PARTITION BY shard ORDER BY mixed, doc_id
               ) - n_chars AS start_offset
        FROM d
    )
    SELECT doc_id, split, shard,
           CAST(start_offset AS BIGINT) AS start_offset,
           CAST(floor(start_offset / 2048) AS BIGINT) AS seq_id
    FROM packed
    """


def _e13_rdf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serialize the nation table to N-Triples with Spark, then load it
    back through the RDF pivot reader via the SPARQL engine — exercises
    the full rdf source path (reference: NTtoDF.java) distributively."""
    out_dir = _tmpdir("sparkall_nt_")
    nation = load_table(spark, sf_dir, "nation")
    subj = F.format_string("<http://sparkall.io/nation/%d>", F.col("n_nationkey"))
    rdf_type = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
    triples = nation.select(
        F.concat(
            subj, F.lit(f" {rdf_type} <{NS}Nation> .\n"),
            subj, F.format_string(
                f" <{NS}name> \"%s\" .\n", F.col("n_name")),
            subj, F.format_string(
                f" <{NS}region> \"%d\"^^<http://www.w3.org/2001/XMLSchema#int> .",
                F.col("n_regionkey")),
        ).alias("value")
    )
    triples.write.mode("overwrite").text(out_dir)

    mapping = EntityMapping(
        name="Nation",
        source=out_dir,
        source_type="rdf",
        id_attr="nat",
        predicates={NS + "name": "name", NS + "region": "region"},
        class_iri=NS + "Nation",
        options={"subject_template": "http://sparkall.io/nation/{nr}"},
    )
    df = Engine(spark, MappingIndex([mapping])).sparql(
        PREFIX_BLOCK
        + """
        SELECT ?nat ?name ?region WHERE {
            ?nat a sa:Nation ; sa:name ?name ; sa:region ?region .
        }
        """
    )
    return df


_E13_ORACLE = """
SELECT CAST(n_nationkey AS VARCHAR) AS nat, n_name AS name,
       n_regionkey AS region
FROM nation
"""


def _e25_warc_crawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw-crawl front end, end-to-end (sources/warc.py +
    operators/pipeline.py:crawl_to_documents): build a deterministic
    WARC fixture from the documents table (plain file + per-record-gzip
    file, plus hostile records — warcinfo, 404, non-HTML content type,
    a garbled Content-Length, a zero-inflation bomb member, a truncated
    gzip member), then WARC -> HTTP parse -> html_to_text -> documents.
    The oracle rebuilds the same HTML in SQL and applies the
    html_to_text SQL mirror; hostile records must all be skipped
    without error.  Fixture build is driver-side and bounded (<=40
    rows), like e13's N-Triples round trip."""
    import gzip
    import os

    from sparkall_spark.operators.pipeline import crawl_to_documents

    rows = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 40)
        .select("doc_id", "text")
        .collect()
    )

    def esc(t: str) -> str:
        return t.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

    def record(uri: str, body: bytes, ctype: str = "text/html",
               status: str = "200 OK") -> bytes:
        http = (
            f"HTTP/1.1 {status}\r\nContent-Type: {ctype}\r\n\r\n"
        ).encode() + body
        head = (
            "WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        return head + http + b"\r\n\r\n"

    out_dir = _tmpdir("sparkall_warc_e25_")
    plain, gz = [], []
    for r in rows:
        body = f"<html><body><p>{esc(r['text'])}</p></body></html>".encode()
        rec = record(f"http://ex.com/{r['doc_id']}", body)
        (plain if r["doc_id"] % 2 == 0 else gz).append(rec)
    warcinfo = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 9\r\n\r\n"
        b"software:" + b"\r\n\r\n"
    )
    # excluded by status / content-type filters:
    plain.append(record("http://ex.com/gone", b"nope", status="404 Not Found"))
    plain.append(record("http://ex.com/txt", b"txt", ctype="text/plain"))
    # garbled Content-Length ends this FILE's scan — placed last
    plain.append(b"WARC/1.0\r\nContent-Length: zz\r\n\r\n")
    with open(os.path.join(out_dir, "crawl-0.warc"), "wb") as f:
        f.write(warcinfo + b"".join(plain))
    members = [gzip.compress(warcinfo)] + [gzip.compress(r) for r in gz]
    # a zero-inflation bomb member (scan stops at the zeros) and a
    # truncated member (bounded_gunzip returns the prefix) — both after
    # every valid record
    members.append(gzip.compress(b"\x00" * (1 << 22)))
    members.append(gzip.compress(record("http://ex.com/cut", b"cut"))[:20])
    with open(os.path.join(out_dir, "crawl-1.warc.gz"), "wb") as f:
        f.write(b"".join(members))

    docs = crawl_to_documents(spark, out_dir)
    # doc_id is a Spark-side xxhash64 pair (not SQL-computable); the
    # oracle joins on url, which is unique by construction
    return docs.select("url", "text")


def _e25_oracle_sql() -> str:
    html = (
        "'<html><body><p>' || replace(replace(replace(text, '&', '&amp;'),"
        " '<', '&lt;'), '>', '&gt;') || '</p></body></html>'"
    )
    return f"""
WITH h AS (
  SELECT doc_id, {html} AS html
  FROM documents WHERE doc_id < 40)
SELECT 'http://ex.com/' || doc_id AS url,
       {X.html_to_text_sql('html')} AS text
FROM h
"""


# ---------------------------------------------------------------------------
# Contract functions
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: 5-star join + filters at sf0.001 (driver smoke check)."""
    return _sparql(SPARQL_QUERIES["q04_join_five_stars"][0])(
        spark, "/root/testdata/sf0.001"
    )


# These entries execute through Engine.sparql(backend="sql") — the
# reference's Presto single-SQL path analog (compile_sql -> ONE
# spark.sql statement) — so the driver hash-checks the SQL backend
# against the DuckDB oracle, not just the DataFrame backend.
# q06 (BIND + expression filter) and q34 (property path + GROUP_CONCAT
# + expressions) route the round-3 grammar surface through it.
SQL_BACKEND_KEYS = {
    "q03_join_filters",
    "q25_bsbm_q1",
    "q06_bind_rlike",
    "q34_path_groupconcat",
    # r4: UNION + path-alternation shapes through the compiled-SQL route
    "q19_sparql_union",
}


def _sparql_sql(text: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _engine(spark, sf_dir).sparql(PREFIX_BLOCK + text, backend="sql")

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, (text, _oracle) in SPARQL_QUERIES.items():
        if name in SQL_BACKEND_KEYS:
            out[name] = _sparql_sql(text)
        elif name not in ("q05_groupby_aggregates", "q20_having"):
            out[name] = _sparql(text)
    out["q05_groupby_aggregates"] = _q05
    out["q20_having"] = _q20_having
    out["q08_topk_groups"] = _q08_topk_groups
    out["q09_multisource_union"] = _q09_multisource_union
    out["q14_events_window"] = _q14_events_window
    out["q15_events_sessions"] = _q15_events_sessions
    out["q24_rml_fno_transform"] = _q24_rml_fno
    out["e01_dedup_exact"] = _e01_dedup_exact
    out["e03_dedup_minhash"] = _e03_dedup_minhash
    out["e04_dedup_simhash"] = _e04_dedup_simhash
    out["e06_dedup_embedding"] = _e06_dedup_embedding
    out["e09_sim_topk_ivf"] = _e09_sim_ivf
    out["e27_kmeans_assign"] = _e27_kmeans_assign
    out["e10_text_analysis"] = _e10_text_analysis
    out["e13_rdf_roundtrip"] = _e13_rdf_roundtrip
    out["e14_temporal_join"] = _e14_temporal_join
    out["e15_window_rank"] = _e15_window_rank
    out["e16_json_extract"] = _e16_json_extract
    out["e28_data_selection"] = _e28_data_selection
    out["e18_cube_pivot"] = _e18_cube_pivot
    out["e20_pretrain_pipeline"] = _e20_pretrain_pipeline
    out["e21_stats_aggregates"] = _e21_stats_aggregates
    out["e22_dedup_clusters"] = _e22_dedup_clusters
    out["e23_split_pack"] = _e23_split_pack
    out["e24_semdedup"] = _e24_semdedup
    out["e25_warc_crawl"] = _e25_warc_crawl
    out["e29_index_telemetry"] = _e29_index_telemetry

    # Entry teardown: the dedup/graph operators persist intermediates
    # that must outlive their call (the driver consumes results lazily).
    # Releasing the PREVIOUS entry's caches when the next entry starts
    # keeps cached-RDD count flat across the 50-entry run
    # (tests/test_dedup.py::test_no_cache_growth_across_entries).
    #
    # Per-entry session confs: every entry start RESETS the keys below
    # to the library default, then applies its own overrides, so a pin
    # never leaks into the next entry.  e03 pins AQE off: all its join
    # strategies are already chosen at the operator level (broadcast
    # attachment, shuffle candidate distinct), and in a long-lived
    # single-JVM session AQE's per-stage replanning re-triggers codegen
    # compilation nondeterministically — measured 3.6s stable with the
    # pin vs 10s..100s swings without, same results.  AQE stays ON as
    # the library/session default (skew-split and runtime coalescing
    # are the right cluster posture; get_spark enables it).
    _CONF_DEFAULTS = {"spark.sql.adaptive.enabled": "true"}
    _ENTRY_CONFS: dict[str, dict[str, str]] = {
        "e03_dedup_minhash": {"spark.sql.adaptive.enabled": "false"},
    }

    def _with_teardown(name, fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            from sparkall_spark.operators._cache import release_caches

            release_caches()
            for k, v in _CONF_DEFAULTS.items():
                spark.conf.set(k, v)
            for k, v in _ENTRY_CONFS.get(name, {}).items():
                spark.conf.set(k, v)
            return fn(spark, sf_dir)

        return run

    return {name: _with_teardown(name, fn) for name, fn in out.items()}


def oracle_sql() -> dict[str, str]:
    out = {
        name: oracle
        for name, (_text, oracle) in SPARQL_QUERIES.items()
        if oracle is not None
    }
    out["q05_groupby_aggregates"] = _Q05_ORACLE
    out["q20_having"] = _Q20_ORACLE
    out["q08_topk_groups"] = _Q08_ORACLE
    out["q09_multisource_union"] = _Q09_ORACLE
    out["q14_events_window"] = _Q14_ORACLE
    out["q15_events_sessions"] = _Q15_ORACLE
    out["q24_rml_fno_transform"] = _Q24_ORACLE
    out["e01_dedup_exact"] = _E01_ORACLE + _e01_diff_oracle_sql()
    out["e03_dedup_minhash"] = _E03_ORACLE
    out["e04_dedup_simhash"] = _e04_oracle_sql()
    out["e06_dedup_embedding"] = _E06_ORACLE
    out["e09_sim_topk_ivf"] = _e09_oracle_sql()
    out["e27_kmeans_assign"] = _e27_oracle_sql()
    out["e10_text_analysis"] = _E10_ORACLE
    out["e13_rdf_roundtrip"] = _E13_ORACLE
    out["e14_temporal_join"] = _E14_ORACLE
    out["e15_window_rank"] = _E15_ORACLE
    out["e16_json_extract"] = _E16_ORACLE
    out["e28_data_selection"] = _e28_oracle_sql()
    out["e18_cube_pivot"] = _E18_ORACLE
    out["e20_pretrain_pipeline"] = _E20_ORACLE
    out["e21_stats_aggregates"] = (
        _E21_ORACLE + _E21_UNORM_SQL + _e21_read_sql()
    )
    out["e22_dedup_clusters"] = (
        _E22_ORACLE
        + _e22_split_oracle_sql()
        + _e22_embinc_oracle_sql()
        + _e22_graph_oracle_sql()
    )
    out["e23_split_pack"] = _e23_oracle_sql()
    out["e24_semdedup"] = _e24_oracle_sql()
    out["e25_warc_crawl"] = _e25_oracle_sql()
    out["e29_index_telemetry"] = (
        _E29_ORACLE + _E29_TQ_SQL + _e29_cms_oracle_sql() + _E29_ZORDER_SQL
    )
    return out
