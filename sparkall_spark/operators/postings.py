"""Positional inverted index + exact phrase search.

The index structure every corpus-scale *exact* text query reduces to:
``build_postings`` turns a document table into ``(token, doc_id,
positions)`` rows — token-partitioned, so "which documents contain
token t" is one partition-pruned lookup instead of a corpus scan —
and ``phrase_search`` answers "which documents contain this exact
phrase, where" by intersecting the phrase tokens' postings with a
positional-adjacency check (the classic positional-index AND-merge,
e.g. Manning et al., IIR §2.4).  In an LLM-data pipeline this is the
exact-phrase rung of decontamination ("drop every document containing
this eval question verbatim") and the audit tool for "where did this
string come from", both at index-lookup cost.

Scale shape:

- ``build_postings``: one explode (map-side, narrow) + one groupBy
  shuffle keyed on (token, doc) partials — O(total tokens) once,
  amortized across every later query; write it out partitioned/
  bucketed by token and lookups become partition-pruned scans.
- ``phrase_search``: the phrase's FIRST token's postings anchor the
  candidate set; each later token joins on doc_id with a positional
  ``arrays_overlap`` on shifted positions.  Join keys are doc ids —
  the rare-token side is tiny by Zipf, and Catalyst/AQE broadcasts
  it.  Nothing touches documents whose first token never matches.
- Everything is Column-expression only (split/posexplode/
  array_intersect) — whole-stage codegen, no UDFs — and the
  tokenization matches ``functions.text.tokens`` so DuckDB test
  mirrors agree bit-for-bit.

The reference engine has no text-index surface (its sources are
tabular/NoSQL scans); this extends the beyond-reference pipeline
tooling.
"""

from __future__ import annotations

import concurrent.futures as _fut
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from sparkall_spark.functions.text import tokens
from sparkall_spark.operators.features import _P_MOD, _portable_token_hash
from sparkall_spark.operators.sampling import _A1, _A2, _B1, _M, _mix


def _hadoop_delete(spark: SparkSession, path: str) -> None:
    """Recursively delete ``path`` through the Hadoop FS API (no-op if
    absent) — works on any filesystem the session can write."""
    jvm = spark._jvm
    jp = jvm.org.apache.hadoop.fs.Path(path)
    jp.getFileSystem(spark._jsc.hadoopConfiguration()).delete(jp, True)


def _run_both(a: Callable[[], None], b: Callable[[], None]) -> None:
    """Run two independent write chains on two driver threads (guide
    §2.6: Spark job submission is thread-safe and concurrent jobs
    back-fill each other's task tails).  The maintenance passes below
    each contain a postings chain and a ``_doclen``/``_meta`` chain
    that touch disjoint output directories; serializing them doubles
    the wall-clock of what is mostly per-job scheduling latency at
    bench scale.  Exceptions propagate (first chain's first)."""
    with _fut.ThreadPoolExecutor(max_workers=2) as pool:
        fa, fb = pool.submit(a), pool.submit(b)
        fa.result()
        fb.result()


def build_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
    n_buckets: int | None = None,
    bucket_seed: int = 0,
) -> DataFrame:
    """Positional postings: one row per (token, doc) with the sorted
    0-based ``positions`` array and ``tf`` (= size(positions)).

    Output: ``token, doc_id, positions: array<int>, tf: bigint``.
    Empty/NULL documents contribute no rows.

    ``n_buckets`` (r13, guide §2.3/§6): build BUCKET-ALIGNED for a
    save/append into a saved index with this layout — the exploded
    tokens are shuffled ONCE on ``tok_bucket`` (``n_buckets``
    partitions) and aggregated in place: ``tok_bucket`` is in the
    grouping key and is a pure function of ``token``, so the hash
    partitioning on it already satisfies the aggregation's clustering
    requirement and Spark inserts NO second exchange.  The output
    carries the ``tok_bucket`` column and is physically clustered by
    it, which lets :func:`save_postings` / :func:`append_postings`
    (``prebucketed=True``) write hive partitions directly — the plain
    form costs TWO full-data exchanges per index write (the groupBy
    shuffle here + the writer's repartition); this form costs ONE.  At
    100 TB that removes a full shuffle of the index per save/append.
    The aggregation runs at ``n_buckets``-way parallelism — size the
    layout's bucket count to the cluster, exactly as §6 sizes output
    files.
    """
    txt = F.col(text_col)
    if lowercase:
        txt = F.lower(txt)
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(txt)).alias("pos", "token"),
    )
    agg = [
        F.array_sort(F.collect_list("pos")).alias("positions"),
        F.count(F.lit(1)).cast("bigint").alias("tf"),
    ]
    if n_buckets is None:
        return tok.groupBy("token", "doc_id").agg(*agg)
    return (
        tok.withColumn(
            "tok_bucket", _token_bucket_col(F.col("token"), n_buckets, bucket_seed)
        )
        .repartition(n_buckets, "tok_bucket")
        .groupBy("tok_bucket", "token", "doc_id")
        .agg(*agg)
    )


# --- saved (partition-pruned) index layout ---------------------------------
#
# At 100 TB the index is built ONCE and queried many times, so the value
# proposition is the LOOKUP cost: a saved index laid out as hive
# partitions on a token hash bucket turns "which documents contain token
# t" into a scan of 1/n_buckets of the index (PartitionFilters prunes
# the directories at planning time — no file of any other bucket is even
# listed) with the exact `token = t` predicate pushed into the parquet
# row-group filter inside the one surviving bucket.  Partitioning on the
# raw token would be exact pruning but creates one directory per
# vocabulary word — a Zipf vocabulary means millions of tiny partitions,
# which kills both the object-store listing and the writer; the hash
# bucket keeps the directory count fixed while preserving static
# pruning, the standard layout compromise.
#
# The bucket must be computable DRIVER-side (the query plan needs the
# literal) and ENGINE-side (the writer computes it per row), so it uses
# the repo's portable poly-hash -> LCG-mix chain with a Python twin
# (`token_bucket`) kept in lockstep by construction (same imported
# constants) and by tests.

#: hidden side-tables inside a saved index directory — names start with
#: "_" so Spark's scan of the index root ignores them (the _SUCCESS /
#: _delta_log convention)
_DOCLEN_SUBDIR = "_doclen"
_META_SUBDIR = "_meta"
_COMPACT_SUBDIR = "_compact_tmp"


def token_bucket(token: str, n_buckets: int, seed: int = 0) -> int:
    """Driver-side twin of the saved index's partition column: the
    portable polynomial char hash pushed through the two-round LCG mix
    (sampling._mix), mod ``n_buckets``.  Must stay in bit-lockstep with
    :func:`_token_bucket_col`; uses the same imported constants and is
    equality-tested against the Column form."""
    acc = 0
    for ch in token:
        acc = (acc * 31 + ord(ch)) % _P_MOD
    h = (acc + seed) % _M
    h = (h * _A1 + _B1) % _M
    return (h * _A2) % _M % n_buckets


def _token_bucket_col(tok: Column, n_buckets: int, seed: int = 0) -> Column:
    """Engine-side twin of :func:`token_bucket`."""
    return (_mix(_portable_token_hash(tok), seed) % n_buckets).cast("int")


def save_postings(
    postings: DataFrame,
    path: str,
    n_buckets: int = 64,
    seed: int = 0,
    prebucketed: bool = False,
) -> None:
    """Persist a postings table for partition-pruned lookups.

    Layout under ``path``:

    - the postings rows, hive-partitioned by ``tok_bucket`` (the
      portable token hash mod ``n_buckets``) — lookups filtering on
      ``tok_bucket = token_bucket(t)`` prune to one directory;
    - ``_doclen/``: the per-document length table (``doc_id,
      doc_len``) BM25 needs — precomputed once here so scoring a query
      never re-aggregates the whole index;
    - ``_meta/``: a one-row table (``n_buckets, seed, n_docs,
      avg_len``) with the layout parameters and corpus stats, written
      through Spark so the layout works on any filesystem.

    The ``_``-prefixed side tables are invisible to a scan of ``path``
    itself (Spark's hidden-path convention).

    ``prebucketed=True`` (r13, guide §2.3/§6): the input was built by
    :func:`build_postings` with THIS layout's ``n_buckets``/``seed``,
    so it already carries ``tok_bucket`` and is physically clustered
    on it — the writer's full-data repartition is skipped (one
    exchange per index write instead of two).  Defensive by
    construction: the bucket column is RE-derived from the token with
    the layout parameters regardless, so a wrong claim can only cost
    file counts (multiple files per bucket until compaction), never
    lookup correctness.
    """
    spark = postings.sparkSession
    # pin the input across its two consumers (the append_postings
    # discipline: index rows and doclen rows must come from ONE stable
    # snapshot of the source plan) — r12: doclen is derived from the
    # pinned input rather than a read-back of the just-written path,
    # which removes the write->read dependency so the postings write
    # and the doclen/meta chain run on two driver threads
    pinned = postings.persist()
    try:
        with_bucket = pinned.drop("tok_bucket").withColumn(
            "tok_bucket", _token_bucket_col(F.col("token"), n_buckets, seed)
        )
        # overwrite semantics, made deterministic for the concurrent
        # chains: delete the target ONCE, driver-side, before either
        # thread starts.  A threaded mode("overwrite") on `path` would
        # delete the whole directory inside the postings chain and
        # could wipe a `_doclen`/`_meta` the other chain had already
        # written if thread scheduling ever inverted; append-into-the
        # -now-empty dir is value-identical and race-free.
        _hadoop_delete(spark, path)

        def _write_postings() -> None:
            # repartition on the partition column so each hive
            # directory is written by the tasks that own its rows
            # (without it, every task holding rows of every bucket
            # opens n_buckets writers -> n_tasks * n_buckets files);
            # prebucketed input is already clustered — write directly
            out = (
                with_bucket
                if prebucketed
                else with_bucket.repartition(n_buckets, "tok_bucket")
            )
            out.write.mode("append").partitionBy("tok_bucket").parquet(path)

        def _write_doclen_meta() -> None:
            doclen = pinned.groupBy("doc_id").agg(
                F.sum("tf").cast("bigint").alias("doc_len")
            )
            doclen.write.mode("overwrite").parquet(
                f"{path}/{_DOCLEN_SUBDIR}"
            )
            _write_meta(spark, path, n_buckets, seed)

        _run_both(_write_postings, _write_doclen_meta)
    finally:
        pinned.unpersist()


def _write_meta(spark: SparkSession, path: str, n_buckets: int, seed: int) -> None:
    """(Re)derive the ``_meta`` stats row from the current ``_doclen``
    side table and replace it.

    r13: staged write + rename replace, NOT a direct overwrite — a
    crash inside a direct overwrite could leave ``_meta`` empty, and
    ``_meta`` carries the layout parameters every maintenance re-run
    (including compact_postings' crash recovery) reads first.  With
    the rename, the live ``_meta`` exists in full at every crash
    point except inside the one directory rename."""
    tmp = f"{path}/{_META_SUBDIR}_staging"
    stats = (
        spark.read.parquet(f"{path}/{_DOCLEN_SUBDIR}")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.avg(F.col("doc_len").cast("double")).alias("avg_len"),
        )
        .select(
            F.lit(n_buckets).cast("int").alias("n_buckets"),
            F.lit(seed).cast("int").alias("seed"),
            "n_docs",
            "avg_len",
        )
    )
    stats.write.mode("overwrite").parquet(tmp)
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    src_p = jvm.org.apache.hadoop.fs.Path(tmp)
    dst_p = jvm.org.apache.hadoop.fs.Path(f"{path}/{_META_SUBDIR}")
    fs = dst_p.getFileSystem(hconf)
    fs.delete(dst_p, True)
    if not fs.rename(src_p, dst_p):
        raise IOError(f"_write_meta: rename {tmp} -> {dst_p} failed")


def append_postings(
    postings: DataFrame, path: str, prebucketed: bool = False
) -> None:
    """Append a NEW batch's postings to a saved index without a full
    rebuild — the index-maintenance half of the 100 TB story (an index
    over a growing corpus is re-amortized per ingest batch, not
    rebuilt): bucket the batch with the SAVED layout's
    ``n_buckets``/``seed`` (read from ``_meta``, so a drifting bucket
    function can't corrupt pruning), append the hive rows, append the
    batch's ``_doclen`` rows, and rewrite ``_meta`` from the updated
    doclen.

    Contract: the batch's doc_ids must be NEW to the index (the
    standard ingest-ledger discipline, ``pipeline.ingest_documents``)
    — appending an existing doc's postings would double-count its tf.
    Single-writer, like every plain-parquet sink here.  Each append
    adds one file per touched bucket; a periodic
    :func:`compact_postings` restores file counts in place.  The input
    plan is pinned (persist) across its two consumers so the index
    rows and the doclen rows cannot diverge on an unstable source —
    the ``ingest_documents`` lesson.

    ``prebucketed=True`` (r13): the batch was built by
    :func:`build_postings` with the SAVED layout's ``n_buckets``/
    ``seed`` — skip the writer's full-batch repartition (one exchange
    per append instead of two; guide §2.3/§6).  The bucket column is
    re-derived from the token with the ``_meta`` parameters
    regardless, so a layout mismatch can only cost file counts, never
    lookup correctness.
    """
    spark = postings.sparkSession
    meta = read_postings_meta(spark, path)
    nb, seed = int(meta["n_buckets"]), int(meta["seed"])
    pinned = postings.persist()
    try:
        with_bucket = pinned.drop("tok_bucket").withColumn(
            "tok_bucket", _token_bucket_col(F.col("token"), nb, seed)
        )

        def _append_postings() -> None:
            out = (
                with_bucket
                if prebucketed
                else with_bucket.repartition(nb, "tok_bucket")
            )
            out.write.mode("append").partitionBy("tok_bucket").parquet(path)

        def _append_doclen_meta() -> None:
            batch_len = pinned.groupBy("doc_id").agg(
                F.sum("tf").cast("bigint").alias("doc_len")
            )
            batch_len.write.mode("append").parquet(
                f"{path}/{_DOCLEN_SUBDIR}"
            )
            _write_meta(spark, path, nb, seed)

        # r12: the index-row append and the doclen/meta chain touch
        # disjoint directories off the same pinned snapshot — overlap
        _run_both(_append_postings, _append_doclen_meta)
    finally:
        pinned.unpersist()


def compact_postings(spark: SparkSession, path: str) -> None:
    """Rewrite a saved index down to one data file per bucket,
    preserving the saved layout parameters — the maintenance pass
    :func:`append_postings` budgets for ("one file per touched bucket
    per append; periodic compaction restores file counts").

    Two-phase — one Spark write, then a filesystem-level swap:

    1. stage the live rows — re-bucketed with the SAVED
       ``n_buckets``/``seed`` from ``_meta``, never the caller's
       memory — into a hidden ``_compact_tmp`` subdir (Spark refuses
       to overwrite a path it is lazily reading from, so the staging
       hop breaks the read-write cycle the way a real compaction job
       on S3/HDFS does);
    2. swap each staged ``tok_bucket=`` directory into place with a
       Hadoop FS delete+rename (r12, guide §2.4/§6: the staged write
       already produced the final one-file-per-bucket layout, so the
       previous dynamic-partition-overwrite swap — a full re-read,
       re-shuffle and re-write of every live row — moved the whole
       index a second time for nothing; at 100 TB the compaction now
       rewrites the index once, not twice).  ``_doclen`` swaps the
       same way (appends grow its file count too), and ``_meta`` is
       re-derived.

    The staging dir is removed through the Hadoop FS API afterward.
    Single-writer, like every plain-parquet sink here; concurrent
    queries against ``path`` during the swap see a partially-compacted
    listing — schedule it like any other table-maintenance window.

    Crash recovery: the answer to a crash at ANY point is "re-run
    compact_postings(path)".  A crash during staging leaves the live
    index untouched (staging is ``_``-hidden, invisible to the parquet
    reader) and the re-run discards the incomplete staging (no
    ``_SUCCESS`` marker) and restages.  A crash during the swap can
    leave a bucket deleted-but-not-renamed — so the re-run FIRST looks
    for a completed staging (``_SUCCESS`` present) and FINISHES the
    swap from that snapshot instead of restaging (r13, per r12 advice:
    restaging from a mid-swap live set would overwrite the only full
    copy of the un-swapped buckets' rows — the staged snapshot, not
    the live tree, is the source of truth once the swap has begun).
    A crash between the postings and ``_doclen``/``_meta`` rewrites
    leaves those side tables un-compacted but value-identical (the
    rewrite only re-packs files); the resume swaps them in iff their
    staging completed.  Single-writer discipline matters here: do NOT
    append between a crashed compact and its re-run — the resume
    restores the staged snapshot, which predates such an append.

    Filesystem contract (r12 advice): the swap relies on directory
    rename being atomic and O(1), which holds for HDFS and POSIX
    filesystems but NOT for object stores (S3A renames are non-atomic
    O(data) copies — there, the per-bucket exposure window becomes a
    long partially-copied-directory window).  Run compactions against
    object stores through a table format with a metadata commit
    (Iceberg/Delta) or a rename-capable layer; this plain-parquet
    layout targets rename-atomic filesystems.

    Invariants (tests/test_postings.py): post-compact rows, meta and
    query answers are hash-equal to the pre-compact index AND to a
    fresh :func:`save_postings` rebuild; each bucket directory holds
    exactly one data file; pruned lookups keep their PartitionFilters.
    """
    meta = read_postings_meta(spark, path)
    nb, seed = int(meta["n_buckets"]), int(meta["seed"])
    staging = f"{path}/{_COMPACT_SUBDIR}"

    def _fs(p: str):
        jp = spark._jvm.org.apache.hadoop.fs.Path(p)
        return jp.getFileSystem(spark._jsc.hadoopConfiguration()), jp

    def _exists(p: str) -> bool:
        fs, jp = _fs(p)
        return fs.exists(jp)

    def _swap_in(src: str, dst: str) -> None:
        # filesystem-level swap: the staged dir IS the final layout —
        # delete the live dir, move the staged one in.  Raising on a
        # False return keeps a failed rename loud (a silent miss would
        # drop the bucket from the live set until the re-run).
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        src_p = jvm.org.apache.hadoop.fs.Path(src)
        dst_p = jvm.org.apache.hadoop.fs.Path(dst)
        fs = dst_p.getFileSystem(hconf)
        fs.delete(dst_p, True)
        if not fs.rename(src_p, dst_p):
            raise IOError(f"compact_postings: rename {src} -> {dst} failed")

    def _swap_staged_buckets() -> None:
        # swap every staged bucket dir into place (r12: zero re-read /
        # re-shuffle / re-write — the old dynamic-overwrite swap moved
        # every live row through Spark a second time); the _-hidden
        # side tables are untouched, exactly as dynamic mode left them
        fs, src_root = _fs(f"{staging}/postings")
        for st in fs.listStatus(src_root):
            name = st.getPath().getName()
            if name.startswith("tok_bucket="):
                _swap_in(f"{staging}/postings/{name}", f"{path}/{name}")

    # r13 (r12 advice): a leftover staging with a COMPLETED write
    # (_SUCCESS present) means a previous compaction crashed mid-swap.
    # The staged snapshot — not the possibly-partially-swapped live
    # tree — is the only guaranteed-full copy of the un-swapped
    # buckets' rows, so FINISH the swap from it; restaging here would
    # overwrite that snapshot from the incomplete live set and lose
    # rows permanently.  Already-swapped buckets were renamed OUT of
    # the staging, so finishing is naturally incremental.  Without the
    # marker the staging is an incomplete WRITE (live index untouched)
    # and is discarded below by the fresh staging's own overwrite.
    if _exists(f"{staging}/postings/_SUCCESS"):
        _swap_staged_buckets()
        if _exists(f"{staging}/doclen/_SUCCESS"):
            _swap_in(f"{staging}/doclen", f"{path}/{_DOCLEN_SUBDIR}")
        _write_meta(spark, path, nb, seed)
        _hadoop_delete(spark, staging)
        return

    rebucketed = (
        load_postings(spark, path)
        .drop("tok_bucket")
        .withColumn(
            "tok_bucket", _token_bucket_col(F.col("token"), nb, seed)
        )
    )

    # one shuffle partition per bucket -> each bucket dir is written
    # by exactly one task -> exactly one file per bucket
    def _compact_postings_chain() -> None:
        rebucketed.repartition(nb, "tok_bucket").write.mode(
            "overwrite"
        ).partitionBy("tok_bucket").parquet(f"{staging}/postings")
        _swap_staged_buckets()

    def _compact_doclen_chain() -> None:
        # repartition bounds the rewritten _doclen at n_buckets files
        # — without it the staging write of N append-era small files
        # would emit N files again, defeating the restore; n_buckets
        # matches the index's own file-count budget and stays valid
        # at any doc count
        load_doclen(spark, path).repartition(nb).write.mode(
            "overwrite"
        ).parquet(f"{staging}/doclen")
        _swap_in(f"{staging}/doclen", f"{path}/{_DOCLEN_SUBDIR}")
        _write_meta(spark, path, nb, seed)

    # r12: stage->swap of the postings rows and stage->rewrite of
    # _doclen/_meta are two independent chains over disjoint
    # directories — overlap them (crash idempotence is unchanged:
    # whichever chain a crash interrupts, both remain value-identical
    # re-packs and "re-run compact_postings" still restores the
    # one-file-per-bucket layout everywhere)
    _run_both(_compact_postings_chain, _compact_doclen_chain)
    _hadoop_delete(spark, staging)


def load_postings(spark: SparkSession, path: str) -> DataFrame:
    """The saved postings rows (with the ``tok_bucket`` partition
    column).  Pass :func:`read_postings_meta`'s ``n_buckets``/``seed``
    to :func:`phrase_search` / :func:`bm25_scores` so their token
    filters carry the literal bucket predicate that makes the scan
    partition-pruned."""
    return spark.read.parquet(path)


def load_doclen(spark: SparkSession, path: str) -> DataFrame:
    """The saved per-document length side table (``doc_id, doc_len``)."""
    return spark.read.parquet(f"{path}/{_DOCLEN_SUBDIR}")


def read_postings_meta(spark: SparkSession, path: str) -> dict:
    """Layout + corpus stats of a saved index: ``{n_buckets, seed,
    n_docs, avg_len}``."""
    return spark.read.parquet(f"{path}/{_META_SUBDIR}").first().asDict()


def _term_pred(term: str, n_buckets: int | None, seed: int) -> Column:
    """Filter for one token; on a bucketed saved index the literal
    ``tok_bucket`` equality is what the planner turns into a
    PartitionFilter (directory pruning), with the token equality pushed
    to the parquet reader inside the surviving bucket."""
    p = F.col("token") == term
    if n_buckets:
        p = (
            F.col("tok_bucket") == F.lit(token_bucket(term, n_buckets, seed))
        ) & p
    return p


def phrase_search(
    postings: DataFrame,
    phrase: str,
    lowercase: bool = True,
    n_buckets: int | None = None,
    bucket_seed: int = 0,
) -> DataFrame:
    """Documents containing the exact token ``phrase``, with every
    0-based start position.

    Output: ``doc_id, match_positions: array<int>, n_matches: bigint``.
    Positional AND-merge: token i of the phrase must occur at
    ``start + i`` — implemented by shifting each token's positions
    back by i and intersecting, so a k-token phrase is k-1 equi-joins
    on doc_id over only the candidate documents.  A single-token
    phrase is a plain lookup.  Raises on an empty phrase.

    Against a saved index (:func:`save_postings`), pass the layout's
    ``n_buckets``/``bucket_seed``: every per-token filter then carries
    the literal ``tok_bucket`` predicate, so each token's postings come
    from ONE pruned partition directory instead of a full index scan
    (asserted plan-level in tests/test_postings.py).
    """
    terms = [t for t in (phrase.lower() if lowercase else phrase).split() if t]
    if not terms:
        raise ValueError("phrase must contain at least one token")
    out = (
        postings.filter(_term_pred(terms[0], n_buckets, bucket_seed))
        .select("doc_id", F.col("positions").alias("__starts"))
    )
    def _shift_by(i: int):
        # a UNARY lambda on purpose: pyspark's ``transform`` dispatches
        # on lambda arity, so a default-arg second parameter would be
        # silently bound to the ARRAY INDEX instead of the default
        return lambda p: p - F.lit(i)

    for i, term in enumerate(terms[1:], start=1):
        nxt = postings.filter(_term_pred(term, n_buckets, bucket_seed)).select(
            "doc_id",
            F.transform("positions", _shift_by(i)).alias("__shift"),
        )
        out = (
            out.join(nxt, "doc_id")
            .select(
                "doc_id",
                F.array_intersect("__starts", "__shift").alias("__starts"),
            )
            .filter(F.size("__starts") > 0)
        )
    return out.select(
        "doc_id",
        F.array_sort("__starts").alias("match_positions"),
        F.size("__starts").cast("bigint").alias("n_matches"),
    )


def term_query(
    postings: DataFrame,
    terms: list[str],
    mode: str = "and",
    lowercase: bool = True,
    n_buckets: int | None = None,
    bucket_seed: int = 0,
) -> DataFrame:
    """Boolean multi-term retrieval over the (saved) postings index:
    documents containing ALL (``mode="and"``) or ANY (``mode="or"``)
    of ``terms``, position-free.

    Output: ``doc_id, n_terms_matched: int, total_tf: bigint`` (how
    many of the query terms hit, and their summed term frequency —
    enough to feed a downstream ranker without touching positions).

    Scale shape mirrors :func:`phrase_search`: each term's postings
    come from ONE pruned partition directory when the saved layout's
    ``n_buckets``/``bucket_seed`` are passed; AND is a cascade of
    doc_id equi-joins over candidate docs only, OR is a union +
    groupBy over the touched postings rows — never an index scan.
    Duplicate query terms are collapsed (a term cannot match twice).
    """
    if mode not in ("and", "or"):
        raise ValueError(f"mode must be 'and' or 'or', got {mode!r}")
    uniq = list(dict.fromkeys(
        t
        for t in (
            (x.lower() if lowercase else x).strip() for x in terms
        )
        if t
    ))
    if not uniq:
        raise ValueError("terms must contain at least one non-empty token")

    def _hits(term: str) -> DataFrame:
        return postings.filter(
            _term_pred(term, n_buckets, bucket_seed)
        ).select("doc_id", F.size("positions").cast("bigint").alias("__tf"))

    if mode == "or":
        allhits = _hits(uniq[0])
        for t in uniq[1:]:
            allhits = allhits.unionByName(_hits(t))
        return allhits.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("int").alias("n_terms_matched"),
            F.sum("__tf").alias("total_tf"),
        )
    out = _hits(uniq[0]).select(
        "doc_id", F.col("__tf").alias("total_tf")
    )
    for t in uniq[1:]:
        nxt = _hits(t)
        out = out.join(nxt, "doc_id").select(
            "doc_id", (F.col("total_tf") + F.col("__tf")).alias("total_tf")
        )
    return out.select(
        "doc_id",
        F.lit(len(uniq)).cast("int").alias("n_terms_matched"),
        F.col("total_tf").cast("bigint").alias("total_tf"),
    )


def phrase_decontaminate(
    docs: DataFrame,
    phrases: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "annotate",
    postings: DataFrame | None = None,
    n_buckets: int | None = None,
    bucket_seed: int = 0,
) -> DataFrame:
    """Exact-phrase decontamination over a (small) phrase list — the
    "drop every doc containing this eval item verbatim" form: builds
    the postings once, unions the per-phrase hit sets, and annotates
    (``n_phrase_hits``, ``contaminated``) or drops (``clean``).

    For recurring audits, pass a SAVED index instead of rebuilding:
    ``postings=load_postings(...)`` with the layout's ``n_buckets``/
    ``bucket_seed`` turns every phrase lookup into partition-pruned
    directory reads — the corpus text is never rescanned (its doc ids
    must match the index's).
    """
    if mode not in ("annotate", "clean"):
        raise ValueError(f"mode must be 'annotate' or 'clean', got {mode!r}")
    if not phrases:
        raise ValueError("phrases must be non-empty")
    post = (
        postings
        if postings is not None
        else build_postings(docs, id_col=id_col, text_col=text_col)
    )
    hits = None
    for p in phrases:
        h = phrase_search(
            post, p, n_buckets=n_buckets, bucket_seed=bucket_seed
        ).select("doc_id", "n_matches")
        hits = h if hits is None else hits.unionByName(h)
    agg = hits.groupBy("doc_id").agg(
        F.sum("n_matches").cast("bigint").alias("n_phrase_hits")
    )
    if mode == "clean":
        dirty = agg.select("doc_id")
        return docs.join(
            F.broadcast(dirty),
            docs[id_col] == dirty["doc_id"],
            "left_anti",
        )
    out = docs.join(
        F.broadcast(agg.withColumnRenamed("doc_id", "__hid")),
        docs[id_col] == F.col("__hid"),
        "left",
    ).drop("__hid")
    return out.withColumn(
        "n_phrase_hits", F.coalesce(F.col("n_phrase_hits"), F.lit(0))
    ).withColumn("contaminated", F.col("n_phrase_hits") > 0)


def bm25_scores(
    postings: DataFrame,
    query: str,
    n_docs: int | None = None,
    avg_len: float | None = None,
    k1: float = 1.2,
    b: float = 0.75,
    lowercase: bool = True,
    exact_micro: bool = False,
    doclen: DataFrame | None = None,
    n_buckets: int | None = None,
    bucket_seed: int = 0,
) -> DataFrame:
    """Okapi BM25 ranking of documents against a token ``query`` over a
    postings table (Robertson & Zaragoza, FnTIR'09) — the standard
    exact-retrieval scorer, useful in a data pipeline for
    similar-to-eval retrieval audits and hard-negative mining.

    score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1-b+b*len/avglen))
    with idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)).

    Output: ``doc_id, bm25`` (double, 6dp), matched documents only,
    every value deterministic — corpus stats (N, avg doc length) are
    computed from the postings unless passed in (pass them when the
    index is a saved table and the stats are known — two aggregate
    jobs saved).

    ``exact_micro=True`` instead emits ``doc_id, bm25_micro`` (BIGINT):
    each per-term contribution is HALF-UP rounded to micros BEFORE the
    per-doc sum, making the reduction exact integer addition — the
    repo's micro discipline — so the result is bit-stable under ANY
    aggregation order (a float sum of 2-3 doubles varies in the last
    ulp with accumulation order).  Cross-engine caveat: the per-term
    contribution still contains one ``ln`` (JVM ``Math.log`` vs the
    oracle engine's libm) and one decimal-repr HALF-UP rounding, so a
    contribution landing within an ulp of a .5-micro boundary could in
    principle round apart across engines — unobserved so far, but if a
    hash gate ever flakes here, compute idf from integer inputs via a
    shared rational approximation instead of trusting last-ulp ``ln``
    agreement.

    Scale shape: only the QUERY tokens' postings rows participate —
    against a saved index (:func:`save_postings`) pass ``n_buckets``/
    ``bucket_seed`` and the token filter prunes to the query tokens'
    bucket directories; pass ``doclen`` (:func:`load_doclen`) and
    ``n_docs``/``avg_len`` (:func:`read_postings_meta`) and NOTHING
    rescans the full index — df per token is a tiny aggregate of the
    pruned rows and the final score is one map-side-combined per-doc
    sum over matched docs only.
    """
    terms = sorted(
        {t for t in (query.lower() if lowercase else query).split() if t}
    )
    if not terms:
        raise ValueError("query must contain at least one token")
    if doclen is not None:
        doclen = doclen.select(
            "doc_id", F.col("doc_len").cast("double").alias("__len")
        )
    else:
        doclen = postings.groupBy("doc_id").agg(
            F.sum("tf").cast("double").alias("__len")
        )
    if n_docs is None or avg_len is None:
        stats = doclen.agg(
            F.count(F.lit(1)).alias("n"), F.avg("__len").alias("al")
        ).first()
        if stats["al"] is None:  # empty postings: avg over zero rows is NULL
            raise ValueError(
                "bm25_scores over empty postings: pass n_docs/avg_len "
                "explicitly or supply a non-empty index"
            )
        n_docs = n_docs if n_docs is not None else stats["n"]
        avg_len = avg_len if avg_len is not None else float(stats["al"])
    tok_filter = F.col("token").isin(terms)
    if n_buckets:
        buckets = sorted({token_bucket(t, n_buckets, bucket_seed) for t in terms})
        tok_filter = F.col("tok_bucket").isin(buckets) & tok_filter
    qp = postings.filter(tok_filter).select(
        "token", "doc_id", F.col("tf").cast("double").alias("__tf")
    )
    df_t = qp.groupBy("token").agg(F.count(F.lit(1)).alias("__df"))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("__df") + F.lit(0.5))
        / (F.col("__df") + F.lit(0.5))
    )
    score = (
        idf
        * F.col("__tf")
        * F.lit(k1 + 1.0)
        / (
            F.col("__tf")
            + F.lit(k1)
            * (
                F.lit(1.0 - b)
                + F.lit(b) * F.col("__len") / F.lit(float(avg_len))
            )
        )
    )
    contrib = (
        qp.join(F.broadcast(df_t), "token")
        .join(doclen, "doc_id")
        .select("doc_id", score.alias("__s"))
    )
    if exact_micro:
        return contrib.groupBy("doc_id").agg(
            F.sum(F.round(F.col("__s") * F.lit(1_000_000.0)).cast("bigint"))
            .alias("bm25_micro")
        )
    return contrib.groupBy("doc_id").agg(
        F.round(F.sum("__s"), 6).alias("bm25")
    )
