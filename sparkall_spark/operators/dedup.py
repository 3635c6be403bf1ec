"""Deduplication operators for large-scale document corpora.

Five strategies, all plain DataFrame -> DataFrame (no reference analog;
this is the LLM-data-pipeline extension of SURVEY.md §7.2 step 9):

- :func:`exact_dedup` — hash-groupBy on a key (full text or fingerprint).
- :func:`minhash_dedup_pairs` / :func:`minhash_dedup` — MinHash + LSH:
  shingle -> k-permutation min-hash signature -> band -> bucket join ->
  exact-Jaccard verification.
- :func:`simhash_pairs` — 64-bit SimHash with chunk-banding for
  Hamming-distance candidates.
- :func:`ngram_jaccard_pairs` — exact Jaccard over word n-grams
  (multi-band min-hash blocked; every emitted value is exact).
- :func:`embedding_neardup_pairs` — cosine near-duplicates over an
  embedding column (hyperplane-LSH bucketed candidates + exact
  rescoring; brute force only behind ``exact=True``).

Scale design: every candidate-generation path is a shuffle on a compact
key (band hash / fingerprint / bucket id), never an all-pairs product;
verification only touches candidate pairs.  Expressions are JVM-side
Column ops inside whole-stage codegen, with one documented exception:
dense-vector cell/bucket assignment (``semdedup``'s default, like
``similarity.bucket_ids``) is an Arrow-batched numpy matmul, because an
interpreted higher-order fold costs ~1 ms/row where the batch matmul
costs ~1 µs/row.  Signatures use a splitmix-style integer mixer written
as explicit arithmetic (portable + deterministic, no dependence on a
specific engine hash).
"""

from __future__ import annotations

import threading

from pyspark.sql import Column, DataFrame, Window, functions as F

from sparkall_spark.functions.text import fingerprint, token_set, word_ngrams

# Deterministic universal hashing for minhash permutations: token ->
# bigint via xxhash64, reduced into [0, P) with P = 2^31-1 so the affine
# transform a*h+b stays under 2^63 (Spark 4 runs ANSI mode: silent
# overflow is an error).  Coefficients from a fixed LCG seed.
_P = (1 << 31) - 1

# Refcounted session-conf toggle around eager cache materialization
# (see _minhash_rep_graph): the LOCK guards only the set/restore
# bookkeeping — the materialization jobs themselves run OUTSIDE it, so
# concurrent graph constructions (e.g. word + bigram legs on two
# threads) genuinely overlap; the conf is restored when the LAST
# holder exits.
_COAL_LOCK = threading.Lock()
_COAL_DEPTH = 0
_COAL_PREV = "true"


class _coalescing_suspended:
    """Context manager: spark.sql.adaptive.coalescePartitions.enabled
    = false for the dynamic extent, concurrency-safe via refcount."""

    _KEY = "spark.sql.adaptive.coalescePartitions.enabled"

    def __init__(self, spark):
        self._spark = spark

    def __enter__(self):
        global _COAL_DEPTH, _COAL_PREV
        with _COAL_LOCK:
            if _COAL_DEPTH == 0:
                _COAL_PREV = self._spark.conf.get(self._KEY, "true")
                self._spark.conf.set(self._KEY, "false")
            _COAL_DEPTH += 1
        return self

    def __exit__(self, *exc):
        global _COAL_DEPTH
        with _COAL_LOCK:
            _COAL_DEPTH -= 1
            if _COAL_DEPTH == 0:
                self._spark.conf.set(self._KEY, _COAL_PREV)
        return False


def _coeffs(k: int, seed: int = 42) -> list[tuple[int, int]]:
    out = []
    state = seed
    for _ in range(k):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (state % (_P - 1)) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % _P
        out.append((a, b))
    return out


def _token_hash(tok: Column) -> Column:
    """Portable string->bigint: xxhash64 is Spark-side only but we never
    need to mirror *this* in SQL oracles (pair outputs are verified via
    exact Jaccard), so use the fast JVM builtin."""
    return F.xxhash64(tok)


def minhash_signature_from_hashes(
    hashes: Column, k: int = 64, seed: int = 42
) -> Column:
    """Array of k min-hash values over an array of 64-bit token hashes.

    Single-pass: one aggregate updates all k permutation minima at once
    via nested zip_with — ~10x faster than k independent array_min
    scans at bench scale.
    """
    coeffs = _coeffs(k, seed)
    a_arr = F.array(*[F.lit(a) for a, _ in coeffs])
    b_arr = F.array(*[F.lit(b) for _, b in coeffs])
    reduced = F.transform(hashes, lambda h: F.pmod(h, F.lit(_P)))
    init = F.array_repeat(F.lit(_P).cast("bigint"), k)
    return F.aggregate(
        reduced,
        init,
        lambda acc, h: F.zip_with(
            acc,
            F.zip_with(a_arr, b_arr, lambda a, b: F.pmod(a * h + b, F.lit(_P))),
            lambda x, y: F.least(x, y),
        ),
    )


def minhash_signature(shingles: Column, k: int = 64, seed: int = 42) -> Column:
    """Array of k min-hash values over a (distinct) shingle array."""
    return minhash_signature_from_hashes(
        F.transform(shingles, _token_hash), k, seed
    )


def _sig_sql(src: str, k: int, seed: int) -> str:
    """The minhash_signature_from_hashes expression rendered as ONE SQL
    string over column ``src`` — identical formula/values, but built in
    a single py4j call instead of hundreds of Column-API round trips
    (k=64 builds two 64-literal arrays; the Column-tree construction
    alone costs ~1s of driver time per invocation)."""
    coeffs = _coeffs(k, seed)
    a = ",".join(str(a) for a, _ in coeffs)
    b = ",".join(str(b) for _, b in coeffs)
    return (
        f"aggregate(transform({src}, h -> pmod(h, {_P})), "
        f"array_repeat(cast({_P} as bigint), {k}), "
        f"(acc, h) -> zip_with(acc, zip_with(array({a}), array({b}), "
        f"(a, b) -> pmod(a * h + b, {_P})), (x, y) -> least(x, y)))"
    )


def _band_hashes_sql(sig: str, bands: int, rows: int) -> str:
    """Per-band hash array as one SQL string: hash(slice(sig, ...)) per
    band, matching F.hash/F.slice semantics exactly."""
    parts = ", ".join(
        f"hash(slice({sig}, {i * rows + 1}, {rows}))" for i in range(bands)
    )
    return f"array({parts})"


# Persisted intermediates registered by the dedup/cluster builders; a
# long-lived session can release them once results are consumed.
# Registry shared with the graph operators (operators/_cache.py); the
# driver-entry harness releases between entries.
from sparkall_spark.operators._cache import (  # noqa: E402
    persist_tracked as _persist,
    release_caches,
)


def exact_dedup(
    df: DataFrame,
    key_cols: list[str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    use_fingerprint: bool = True,
) -> DataFrame:
    """Keep one row (min id) per duplicate group.

    With ``use_fingerprint`` the group key is the 64-bit-ish rolling
    hash of the normalized text instead of the full string — at 100 TB
    you shuffle 8-byte keys, not documents.  One shuffle total
    (window over the key), no join-back.
    """
    if key_cols is None:
        key = fingerprint(text_col).alias("__key")
        df = df.withColumn("__key", key) if use_fingerprint else df.withColumn(
            "__key", F.col(text_col)
        )
        key_names = ["__key"]
    else:
        key_names = key_cols
    w = Window.partitionBy(*key_names).orderBy(F.col(id_col).asc())
    out = (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return out.drop("__key") if key_cols is None else out


def exact_dedup_incremental(
    new_docs: DataFrame,
    seen_fingerprints: DataFrame | None,
    id_col: str = "doc_id",
    text_col: str = "text",
    fingerprint_col: str = "fingerprint",
    broadcast_seen: bool = False,
    keep_fingerprint_col: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Dedup an incoming BATCH against an already-ingested corpus — the
    shape a 100 TB pipeline actually runs day to day (full re-dedup of
    the historical corpus per ingest is a non-starter).

    ``seen_fingerprints`` is the persisted fingerprint ledger: one
    BIGINT ``fingerprint_col`` row per previously-kept document (write
    it bucketed on the fingerprint via ``sinks.write_bucketed`` and the
    anti-join below plans with zero Exchange on the ledger side).
    ``None`` means a cold start.

    Returns ``(kept, ledger_delta)``: ``kept`` is the batch minus
    within-batch duplicates (min id per fingerprint, exactly
    :func:`exact_dedup`) minus anything already in the ledger;
    ``ledger_delta`` is the fingerprint set to APPEND to the ledger
    (one row per kept doc).  Deterministic: re-running an ingest
    yields the same kept set, and replaying an already-applied batch
    yields an empty one (idempotent ingest).

    ``keep_fingerprint_col=True`` leaves the computed fingerprint on
    ``kept`` (named ``fingerprint_col``) so a caller that must write
    BOTH the documents and the ledger delta can persist ONE plan and
    derive the two writes from it — deriving them from separate lazy
    plans recomputes the dedup per write and, if the input is not a
    stable snapshot, can record a fingerprint whose document was never
    appended (a permanent false-duplicate).  ``delta`` is then a plain
    projection of ``kept``.

    Scale: one 8-byte-key window shuffle for the batch dedup + one
    anti-join against the ledger — shuffle-on-key by default (ledger is
    corpus-sized); ``broadcast_seen=True`` for small ledgers.
    """
    keyed = new_docs.withColumn("__fp", fingerprint(text_col))
    w = Window.partitionBy("__fp").orderBy(F.col(id_col).asc())
    batch_kept = (
        keyed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if seen_fingerprints is not None:
        ledger = seen_fingerprints.select(
            F.col(fingerprint_col).alias("__seen_fp")
        )
        if broadcast_seen:
            ledger = F.broadcast(ledger)
        batch_kept = batch_kept.join(
            ledger, batch_kept["__fp"] == ledger["__seen_fp"], "left_anti"
        )
    delta = batch_kept.select(F.col("__fp").alias(fingerprint_col))
    if keep_fingerprint_col:
        if fingerprint_col in new_docs.columns:
            raise ValueError(
                f"keep_fingerprint_col=True would shadow existing column "
                f"{fingerprint_col!r} on the batch"
            )
        kept = batch_kept.withColumnRenamed("__fp", fingerprint_col)
        return kept, kept.select(fingerprint_col)
    return batch_kept.drop("__fp"), delta


def _with_shingles(
    df: DataFrame, id_col: str, text_col: str, ngram: int
) -> DataFrame:
    # Shingling is the corpus-wide CPU-heavy map step; a small input
    # (one parquet row group -> one scan partition) would run it
    # serially.  Repartition ONLY when the scan is under-parallel.
    # The under-parallelism check is `df.inputFiles()` — logical-plan
    # file listing only, NO physical planning (`.rdd.getNumPartitions()`
    # would force planning of the whole upstream plan per operator call,
    # r6 VERDICT "What's wrong" #3).  File COUNT alone over-fires on
    # few-large-file layouts (8 x 5 GB parquet splits into hundreds of
    # scan partitions by maxPartitionBytes — forcing a full corpus
    # shuffle there would be the expensive mistake), so when the count
    # is small enough to matter, the estimate is refined with the
    # actual file SIZES (a handful of driver FS stats).  At real scale
    # inputs carry thousands of files and this is a no-op.  Non-file
    # inputs (joins over views, in-memory relations) report no files
    # and are left untouched — callers with an under-parallel complex
    # upstream should `.repartition()` before calling.
    par = df.sparkSession.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    threshold = max(2, par // 2)
    if 0 < len(files) < threshold:
        est = _estimated_scan_splits(df.sparkSession, files)
        if est < threshold:
            df = df.repartition(par)
    sh = word_ngrams(text_col, ngram) if ngram > 1 else token_set(text_col)
    return df.select(F.col(id_col).alias("__id"), sh.alias("__sh")).filter(
        F.size("__sh") > 0
    )


def _byte_string_as_bytes(raw: str) -> int:
    """Spark byte-string conf value -> bytes, honoring binary suffixes
    the way the JVM's ``JavaUtils.byteStringAsBytes`` does ('128m',
    '1g', '134217728b', bare digits).  The pre-r8 digit-stripping parse
    turned '128m' into 128 BYTES, inflating the split estimate ~10^6x
    and silently skipping the under-parallelism repartition (r7 ADVICE
    item 1)."""
    s = raw.strip().lower()
    units = {
        "b": 1,
        "k": 1 << 10,
        "kb": 1 << 10,
        "m": 1 << 20,
        "mb": 1 << 20,
        "g": 1 << 30,
        "gb": 1 << 30,
        "t": 1 << 40,
        "tb": 1 << 40,
        "p": 1 << 50,
        "pb": 1 << 50,
    }
    num = s.rstrip("bkmgtp")
    suffix = s[len(num):]
    return int(num) * units.get(suffix, 1)


def _estimated_scan_splits(spark, files: list[str]) -> int:
    """Splits the scan will produce for these files, from sizes and
    ``spark.sql.files.maxPartitionBytes`` (splittable formats get
    ``ceil(size/maxPartitionBytes)`` each).  Driver-side FS stats only
    — called when the file COUNT is already small, so this is a
    handful of metadata calls.  On any failure, returns the file count
    (the conservative pre-r7 behavior: small count -> repartition)."""
    try:
        raw = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
        mpb = _byte_string_as_bytes(str(raw))
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        total = 0
        for f in files:
            p = jvm.org.apache.hadoop.fs.Path(f)
            size = p.getFileSystem(hconf).getFileStatus(p).getLen()
            total += max(1, -(-int(size) // mpb))
        return total
    except Exception:
        return len(files)


def jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))


def _prefix_len(n: Column, threshold: float) -> Column:
    """PPJoin/AllPairs prefix length for Jaccard ``threshold`` (Bayardo
    et al., Scaling Up All Pairs Similarity Search, WWW'07; Xiao et
    al., Efficient Similarity Joins for Near Duplicate Detection,
    WWW'08): J(A,B) >= t forces |A∩B| >= ceil(t*|A|), and any pair
    with overlap >= o must share an element within the first
    ``|A| - o + 1`` elements of BOTH sets under one global total
    order — here the ascending 64-bit token-hash order that ``__shh``
    already carries (any total order is correct; hash order costs no
    frequency-counting pass).  Using each side's own o = ceil(t*n)
    yields prefixes at least as long as the pairwise bound, so the
    filter stays a necessary condition (zero false negatives)."""
    return (n - F.ceil(F.lit(float(threshold)) * n) + 1).cast("int")


def _first_match_band(
    bands: int, a: str = "x.__bhs", b: str = "y.__bhs"
) -> Column:
    """1-based index of the first band where the two band-hash arrays
    agree, as an UNROLLED when-chain of scalar comparisons — pure
    whole-stage-codegen, no per-row array allocation (the
    zip_with+array_position form allocates two arrays per collision,
    the dominant cost of the broadcast path on dense collision
    streams).  Pairs colliding in k bands are emitted from exactly one
    (`this == band+1`), replacing a distinct shuffle of the entire
    collision stream."""
    out = None
    for i in range(1, bands + 1):
        hit = F.element_at(F.col(a), i) == F.element_at(F.col(b), i)
        out = F.when(hit, i) if out is None else out.when(hit, i)
    return out.otherwise(bands + 1)


def _skew_salted_sides(
    probe_slim: DataFrame,
    build_slim: DataFrame,
    slice_rows: int,
) -> tuple[DataFrame, DataFrame]:
    """Two-sided adaptive skew salting for the banded candidate
    self-join (the r7->r8 fix for the e03 hot-bucket storms).

    LSH band buckets are skewed BY CONSTRUCTION on near-clique corpora:
    a bucket holding B mutually-similar representatives contributes
    O(B^2) collision probes, and a hash partitioning on ``(band, bh)``
    lands all of them on ONE task (measured at sf0.1: 125 of 4,804
    buckets hold 68% of the banded rows, the hottest holds 1,701 reps
    = 2.9M probes, and the watchdog caught 4/32 threads grinding the
    pinned shuffle-hash probe for 40s on loaded machines).  AQE's skew
    split cannot help even when enabled — it splits by shuffle BYTES,
    and a 1,701-row bucket is tiny on disk; the blowup is the join
    OUTPUT, invisible to byte statistics.

    The classic blocked self-join decomposition, sized per bucket:
    buckets with more than ``slice_rows`` rows get a salt factor
    ``nb = ceil(count / slice_rows)``; an x-side row carries
    ``__si = hash(fp) % nb`` and replicates over ``__sj in [0, nb)``,
    a y-side row carries ``__sj = hash(fp) % nb`` and replicates over
    ``__si in [0, nb)``.  With ``(__si, __sj)`` appended to the join
    key, a pair (a, b) meets exactly once — at ``(h(a), h(b))`` — and
    per-key probe work is bounded by ~``slice_rows^2`` whatever the
    bucket size, so no clique can serialize onto one task.  Cold
    buckets (the overwhelming majority) keep ``nb = 1`` = a single
    un-replicated row per side: the salting costs nothing where there
    is no skew.  Extra shuffled rows are bounded by
    ``sum_b count_b^2 / slice_rows`` — the same quantity as the
    collision-probe work divided by the slice, i.e. proportional to
    the work being re-balanced, never to the corpus.

    The hot-bucket table is one count over the (cached-signature-
    derived, O(reps*bands)-row) banded table and is broadcast; its
    row count is ``#buckets with > slice_rows rows`` <=
    ``banded_rows / slice_rows`` — metadata-scale for any real corpus
    (raise ``slice_rows`` if an adversarial corpus ever makes it fat).
    """
    hot = (
        build_slim.groupBy("band", "bh")
        .agg(F.count(F.lit(1)).alias("__bc"))
        .filter(F.col("__bc") > slice_rows)
        .select(
            "band",
            "bh",
            F.ceil(F.col("__bc") / F.lit(slice_rows)).cast("int").alias("__nb"),
        )
    )
    hb = F.broadcast(hot)
    salt = F.pmod(F.xxhash64("__fp"), F.col("__nb")).cast("int")
    rng = F.sequence(F.lit(0), F.col("__nb") - 1)
    probe2 = (
        probe_slim.join(hb, ["band", "bh"], "left")
        .withColumn("__nb", F.coalesce(F.col("__nb"), F.lit(1)))
        .withColumn("__si", salt)
        .withColumn("__sj", F.explode(rng))
        .drop("__nb")
    )
    build2 = (
        build_slim.join(hb, ["band", "bh"], "left")
        .withColumn("__nb", F.coalesce(F.col("__nb"), F.lit(1)))
        .withColumn("__sj", salt)
        .withColumn("__si", F.explode(rng))
        .drop("__nb")
    )
    return probe2, build2


def _minhash_rep_graph(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ngram: int,
    num_hashes: int,
    bands: int,
    threshold: float,
    seed: int,
    est_prefilter: bool | str,
    broadcast_reps: bool | None,
    broadcast_rep_limit: int,
    candidate_strategy: str | None = None,
    salt_slice_rows: int = 256,
) -> tuple[DataFrame, DataFrame, bool]:
    """Shared minhash-LSH core: returns (ids, rep_pairs, broadcast,
    broadcast_members) where ``ids``
    maps member ``__id`` -> set fingerprint ``__fp`` and ``rep_pairs``
    holds qualifying (fp_a, fp_b, jaccard) representative pairs (exact
    jaccard, id-distinct shingle sets only, no intra-clique pairs).

    Two physical strategies for CANDIDATE GENERATION, chosen by
    representative count (an AQE-style size-based decision at the
    operator level), overridable via ``candidate_strategy``
    ("broadcast" | "shuffle" | None=derive from the rep gate):

    - **broadcast** (reps <= broadcast_rep_limit): the per-band
      candidate join, set attachment and exact verification all run
      against broadcast rep tables in ONE stage — no shuffle of the
      multi-million-row raw candidate set at all; the only exchanges
      are the tiny banded self-join input and the verified output.
      A colliding pair is emitted from its FIRST matching band only
      (no distinct shuffle, no duplicate verification).  Right when
      band buckets are small — the collision stream stays thin.
    - **shuffle**: the banded table (O(reps*bands) rows carrying the
      16-int band-hash array + the PPJoin prefix) is shuffled into a
      pinned shuffle_hash self-join, and every collision is resolved
      MAP-SIDE inside the probe: the prefix filter kills pairs whose
      hash-order prefixes are disjoint (:func:`_prefix_len`), and the
      first-matching-band predicate (:func:`_first_match_band`,
      unrolled scalar when-chain — no per-collision array allocation)
      emits each surviving pair exactly once, so the O(collisions)
      candidate stream is never shuffled at all.  (r6 shuffled the
      collision stream to a ``.distinct()`` — 18.6M 16-byte pairs on
      the clique fixture, its single largest stage; r7 replaces it
      with the map-side emission, measured 1.07s -> 0.68s steady for
      the candidate stage, and the banded input it shuffles instead
      is always <= the collision count.)  The 100 TB path, and ALSO
      the right plan for clique-heavy corpora at any scale: a band
      bucket holding B mutually-similar sets yields an O(B^2)-per-band
      collision stream that the broadcast path pays per-collision
      array work on, while here each collision costs a handful of
      scalar comparisons.  **Skew contract (r8)**: this path pins
      shuffle_hash and callers typically pin AQE off, so nothing at
      runtime re-splits a hot ``(band, bh)`` bucket — and clique-heavy
      corpora produce them by construction (the r7 regression: one
      1,701-rep bucket serialized ~2.9M probes onto one task and
      stormed 40s on loaded machines).  The plan is therefore salted
      STATICALLY: :func:`_skew_salted_sides` appends a two-sided
      per-bucket salt to the join key, bounding per-task probe work at
      ~``salt_slice_rows**2`` for ANY bucket size.  Do not drop the
      salt when re-planning this join; AQE skew-split is NOT a
      substitute (it splits partitions by shuffle BYTES, and hot LSH
      buckets are byte-tiny — the blowup is join OUTPUT, invisible to
      byte statistics).

    The rep-attachment joins (verification arrays, member expansion)
    are gated SEPARATELY by the rep/member counts — a shuffle-generated
    candidate stream still gets broadcast attachment when the rep
    table is small.  (Catalyst canonicalization already reuses the
    broadcast exchanges for the a/b sides of the attachment and
    member-map joins — verified in the executed plan, 3 builds for 5
    broadcast join sites.)
    """
    rows = num_hashes // bands
    base = _with_shingles(df, id_col, text_col, ngram)

    # Cluster identical shingle SETS first (web-scale corpora contain
    # huge exact-duplicate cliques; pushing them through LSH multiplies
    # the quadratic bucket join by the band count).  Shingle arrays are
    # sorted+distinct, so a single hash is a set fingerprint.
    # persist: `ids` and `reps` feed multiple joins — without a cache
    # Spark re-runs the tokenize+hash subtree once per reference
    # (release via release_caches() in long-lived sessions)
    keyed = _persist(
        base.withColumn("__fp", F.xxhash64(F.concat_ws("\x01", "__sh")))
    )
    ids = keyed.select("__id", "__fp")

    # LSH runs over one representative per distinct set — bucket skew
    # from cliques is gone by construction.  __shh: the shingle set as
    # sorted 64-bit hashes — verification jaccard over int arrays is
    # several times cheaper than over strings and equal in value
    # (collision odds ~ |set|^2 / 2^64).
    reps = _persist(
        keyed.groupBy("__fp")
        .agg(F.min("__id").alias("__rid"), F.first("__sh").alias("__sh"))
        .withColumn("__shh", F.array_sort(F.transform("__sh", _token_hash)))
        .withColumn("__n", F.size("__shh"))
        .select("__fp", "__shh", "__n")
    )
    if broadcast_reps is None:
        # One aggregate job yields BOTH size signals (keyed is persisted
        # and needed below anyway): the rep count gates the candidate
        # join strategy, the member count gates the member-map broadcast
        # in the expansion join (members >> reps in clique-heavy
        # corpora, so the rep decision must not be reused there).
        c = keyed.agg(
            F.count(F.lit(1)).alias("m"), F.count_distinct("__fp").alias("r")
        ).first()
        broadcast_reps = c["r"] <= broadcast_rep_limit
        broadcast_members = c["m"] <= broadcast_rep_limit
    else:
        # Pinned by the caller: True asserts the corpus is small enough
        # to broadcast BOTH maps (skipping the blocking count job is the
        # point of pinning); clique-heavy corpora should pass None and
        # let the counted gate decide.
        broadcast_members = broadcast_reps
    cand_broadcast = (
        broadcast_reps
        if candidate_strategy is None
        else candidate_strategy == "broadcast"
    )

    # r13: the estimate prefilter's comparison column.  The estimate
    # needs |{i : sig_a[i] == sig_b[i]}| per candidate; the r8-r12 form
    # computed it with zip_with+filter, but higher-order functions are
    # CodegenFallback — every candidate paid an interpreted, boxed
    # evaluation, and the r13 bench storm capture caught exactly that
    # frame (ArrayFilter.nullSafeEval) grinding a straggler task while
    # 27/32 executor threads sat parked.  Tagging each component with
    # its position ONCE per rep (xxhash64(component, i) — no ANSI
    # overflow, 2^-64 cross-position collision odds) turns the per-
    # candidate positional count into array_intersect over the tagged
    # arrays — whole-stage-codegen'd, primitive, allocation-light.  A
    # tag collision can only OVERcount matches, i.e. only ADD a
    # candidate to exact verification — the emitted pair set is decided
    # by the exact jaccard, so values are unchanged by construction.
    tag_cols = (
        [F.expr("transform(__sig, (x, i) -> xxhash64(x, i))").alias("__sigt")]
        if est_prefilter and est_prefilter != "hof" and not cand_broadcast
        else []
    )
    sig = _persist(
        reps.withColumn(
            # single-SQL-string construction (_sig_sql): same values as
            # minhash_signature_from_hashes, ~1s less driver time per call
            "__sig", F.expr(_sig_sql("__shh", num_hashes, seed))
        )
        .withColumn(
            # per-band hashes as an array: banding explodes it, and the
            # broadcast path uses it to emit each colliding pair from
            # its FIRST matching band only (exact dedup without a
            # distinct shuffle)
            "__bhs",
            F.expr(_band_hashes_sql("__sig", bands, rows)),
        )
        .withColumn(
            # PPJoin prefix: the first (1-t)*n+1 elements of the
            # hash-ordered shingle set (see _prefix_len) — a pair can
            # reach Jaccard >= t only if the prefixes share a token,
            # so band collisions failing arrays_overlap on these die
            # inside the candidate join, before any verification.
            "__pfx",
            F.slice(
                "__shh",
                F.lit(1),
                F.greatest(F.lit(1), _prefix_len(F.col("__n"), threshold)),
            )
            if 0.0 < threshold < 1.0
            else F.col("__shh"),
        )
        .select("__fp", "__sig", "__bhs", "__n", "__shh", "__pfx", *tag_cols)
    )
    # Materialize the shared cache chain NOW (sig's lineage covers keyed
    # and reps, so one small job fills all three).  The downstream plan
    # consumes these subtrees from SEVERAL concurrent jobs — broadcast
    # exchanges (rep attachment, member maps, banded build side) each
    # run as their own driver-side job, and racing jobs recompute a
    # lazily-cached subtree redundantly before its blocks land
    # (observed: the two-leg e03 union spent ~7-10s/pass recomputing
    # tokenize+hash+groupBy across 6+ broadcast jobs; one eager count
    # makes every consumer a cache read).  The job is rep-table-sized:
    # metadata relative to the corpus at any scale.
    #
    # AQE partition-coalescing is suspended for the materialization:
    # it sizes partitions by SHUFFLE BYTES, and the rep table's bytes
    # are tiny while the signature computation downstream of the
    # exchange is the CPU-heavy part — coalescing cached the relation
    # as ONE partition and serialized all 64xN minhash evaluations into
    # a single task (measured 6-10s/pass at sf0.1; 32-way it is <0.5s).
    # Toggling the conf costs nothing at scale (the exchange keeps its
    # configured partition count; no extra shuffle is introduced).
    # Refcounted toggle (set/restore under a lock, the JOB outside it):
    # two graphs materializing concurrently overlap their counts and
    # cannot interleave set/restore into a stuck session conf.
    with _coalescing_suspended(df.sparkSession):
        sig.count()
    # length-filter bucket (set-similarity length filtering, as in
    # AllPairs/PPJoin): j >= t forces min(|A|,|B|)/max >= t, i.e.
    # |ln n_a - ln n_b| <= ln(1/t) — with buckets of that width,
    # qualifying pairs sit in the same or adjacent buckets.  Putting the
    # bucket INTO the join key (probe side explodes to {-1,0,+1}) means
    # size-incompatible band collisions never materialize at all.
    import math

    width = math.log(1.0 / threshold) if 0.0 < threshold < 1.0 else None
    sb = (
        F.floor(F.log(F.col("__n").cast("double")) / F.lit(width))
        if width is not None
        else F.lit(0)
    )
    banded = sig.select(
        "__fp",
        "__bhs",
        "__n",
        "__shh",
        "__pfx",
        sb.alias("__sb"),
        F.posexplode("__bhs").alias("band", "bh"),
    )
    probe = banded.select(
        "*", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("__d")
    ).withColumn("__pb", F.col("__sb") + F.col("__d"))

    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).cast("double")
    union = F.col("n_a") + F.col("n_b") - inter
    jaccard_col = F.round(
        F.when(union > 0, inter / union).otherwise(F.lit(0.0)), 6
    )
    rep_a = reps.select(
        F.col("__fp").alias("fp_a"), F.col("__shh").alias("sh_a"), F.col("__n").alias("n_a")
    )
    rep_b = reps.select(
        F.col("__fp").alias("fp_b"), F.col("__shh").alias("sh_b"), F.col("__n").alias("n_b")
    )

    if cand_broadcast:
        # NO probe rebalance (r7): the r6 repartition here predated the
        # coalescing-suspended eager materialization above — with it,
        # the cached `sig` keeps the full `spark.sql.shuffle.partitions`
        # fan-out of the reps groupBy (hash-spread on __fp, so balanced),
        # and posexplode preserves partitioning.  The repartition was
        # re-shuffling the 48x-exploded probe WITH its signature/shingle
        # arrays — 76 MB write+read on the sf0.1 bigram leg, ~0.6 s of
        # pure overhead (measured WITH 2.4-2.8 s vs WITHOUT 2.0 s).
        #
        # Two SMALL broadcast builds instead of one fat one (the build
        # side is collected to the driver and shipped to every executor,
        # so its bytes are first-run latency): (1) the slim banded table
        # — just (fp, band, bh, size bucket, n) — drives candidate
        # generation; (2) the per-rep signature/set table attaches the
        # y side's band hashes and hashed shingles once per candidate.
        # The x side carries its own arrays through the stage (no join).
        #
        # first-matching-band filter: a colliding pair is kept iff no
        # earlier band also matches — every pair appears EXACTLY once,
        # so no distinct shuffle and no duplicate verification.
        first_match = F.array_position(
            F.zip_with("__bhs", "__bhs_b", lambda a, b: a == b), True
        )
        # size-ratio necessary condition, checked during the join probe
        # BEFORE any array work: j >= t implies min(|A|,|B|)/max >= t
        size_ok = (
            F.col("x.__n") * F.lit(1.0) >= F.lit(threshold) * F.col("y.__n")
        ) & (F.col("y.__n") * F.lit(1.0) >= F.lit(threshold) * F.col("x.__n"))
        build_slim = banded.select(
            "__fp", "band", "bh", "__sb", "__n", "__pfx"
        )
        sig_b = sig.select(
            F.col("__fp").alias("fp_b"),
            F.col("__bhs").alias("__bhs_b"),
            F.col("__shh").alias("__shh_b"),
        )
        pair_inter = F.size(
            F.array_intersect(F.col("__shh"), F.col("__shh_b"))
        ).cast("double")
        pair_union = F.col("n_a") + F.col("n_b") - pair_inter
        rep_pairs = (
            probe.alias("x")
            .join(
                F.broadcast(build_slim.alias("y")),
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.bh") == F.col("y.bh"))
                & (F.col("x.__pb") == F.col("y.__sb"))
                & (F.col("x.__fp") < F.col("y.__fp"))
                & size_ok
                # PPJoin prefix filter (see _prefix_len): collisions
                # whose hash-order prefixes are disjoint cannot reach
                # the threshold — dropped before the sig_b attach.
                & F.arrays_overlap(F.col("x.__pfx"), F.col("y.__pfx")),
            )
            .select(
                F.col("x.__fp").alias("fp_a"),
                F.col("y.__fp").alias("fp_b"),
                F.col("x.band").alias("band"),
                F.col("x.__bhs").alias("__bhs"),
                F.col("x.__shh").alias("__shh"),
                F.col("x.__n").alias("n_a"),
                F.col("y.__n").alias("n_b"),
            )
            .join(F.broadcast(sig_b), "fp_b")
            .filter(first_match == F.col("band") + 1)
            .withColumn(
                "jaccard",
                F.round(
                    F.when(pair_union > 0, pair_inter / pair_union).otherwise(
                        F.lit(0.0)
                    ),
                    6,
                ),
            )
            .filter(F.col("jaccard") >= threshold)
            .select("fp_a", "fp_b", "jaccard")
        )
        return ids, rep_pairs, True, broadcast_members

    # Shuffled banded rows carry the 16-int band-hash array and the
    # short prefix (~(1-t)*n hashes) so BOTH dedup and the PPJoin
    # filter run map-side inside the join probe: a colliding pair is
    # emitted from its first matching band only (unrolled when-chain,
    # no per-collision array allocation and NO distinct shuffle of the
    # collision stream — r6 shuffled the O(collisions) 16-byte pair
    # stream to a distinct, which at 18.6M collisions on the clique
    # fixture was the single largest stage; the banded input here is
    # O(reps*bands) rows, always <= the collision count that the old
    # path shuffled, so this is the better 100 TB shape whenever the
    # shuffle strategy is the right choice at all).
    probe_slim = probe.select(
        "__fp", "band", "bh", "__n", "__pb", "__bhs", "__pfx"
    )
    build_slim = banded.select(
        "__fp", "band", "bh", "__n", "__sb", "__bhs", "__pfx"
    )
    # Skew immunity (r8): pinning shuffle_hash + AQE-off removes every
    # runtime skew mitigation, and LSH band buckets ARE skewed on
    # clique-heavy corpora — so the skew handling must be in the plan
    # itself.  Two-sided adaptive salting bounds per-task probe work at
    # ~salt_slice_rows^2 per join key regardless of bucket size (see
    # :func:`_skew_salted_sides`); salt_slice_rows=0 disables.
    if salt_slice_rows > 0:
        probe_slim, build_slim = _skew_salted_sides(
            probe_slim, build_slim, salt_slice_rows
        )
    size_ok = (
        F.col("x.__n") * F.lit(1.0) >= F.lit(threshold) * F.col("y.__n")
    ) & (F.col("y.__n") * F.lit(1.0) >= F.lit(threshold) * F.col("x.__n"))
    salt_ok = (
        (F.col("x.__si") == F.col("y.__si"))
        & (F.col("x.__sj") == F.col("y.__sj"))
        if salt_slice_rows > 0
        else F.lit(True)
    )
    cand = (
        probe_slim.alias("x")
        .join(
            # shuffle_hash pinned: makes the band join's PHYSICAL plan
            # scale-invariant (statistics would flip it between
            # broadcast and sort-merge across scales, defeating
            # warmup-compiled codegen and nondeterminizing run times)
            # and is the right shape anyway — narrow keys, hash
            # buckets, no sort of the collision stream.
            build_slim.alias("y").hint("shuffle_hash"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bh") == F.col("y.bh"))
            & salt_ok
            & (F.col("x.__pb") == F.col("y.__sb"))
            & (F.col("x.__fp") < F.col("y.__fp"))
            & size_ok
            # exactly-once emission: keep the collision only in the
            # first band whose hashes agree (replaces .distinct()).
            # Ordered BEFORE the prefix filter: this is a bounded
            # scalar when-chain that kills ~(bands-1)/bands of the
            # collision stream, while arrays_overlap builds a hash set
            # per evaluation (jstack'd as the Long-boxing/OpenHashSet
            # hot frames when it ran first) — And short-circuits, so
            # the allocating conjunct must see the deduped stream.
            & (_first_match_band(bands) == F.col("x.band") + 1)
            # PPJoin prefix filter (see _prefix_len): a pair whose
            # hash-order prefixes share no token cannot reach the
            # threshold — dead before the candidate even exists.
            & F.arrays_overlap(F.col("x.__pfx"), F.col("y.__pfx")),
        )
        .select(F.col("x.__fp").alias("fp_a"), F.col("y.__fp").alias("fp_b"))
    )
    if est_prefilter:
        # Signature-estimate prefilter: the matching-component fraction
        # of two minhash signatures is an unbiased jaccard estimate with
        # sigma = sqrt(t(1-t)/k); culling candidates > ~6 sigma below
        # the threshold skips exact verification for pairs that cannot
        # qualify (P[miss | true j >= t] ~ 1e-9 per pair).  Pay this
        # only when shingle sets are much larger than num_hashes (long
        # documents); for short docs the estimate costs as much as the
        # exact intersection.
        sigma = (threshold * (1 - threshold) / num_hashes) ** 0.5
        est_cutoff = max(0.0, threshold - 6 * sigma)
        if est_prefilter == "hof":
            # the r8-r12 form, kept for A/B probes: zip_with + filter.
            # NOT an unrolled element_at sum — unrolling k=64
            # comparisons into one Add tree was measured 10x SLOWER
            # (41s vs 4s word-leg at sf0.1), blowing the codegen method
            # budget.  But HOFs are CodegenFallback: every candidate
            # pays interpreted, boxed evaluation (see the tagged form
            # below — the r13 default).
            est = (
                F.size(
                    F.filter(
                        F.zip_with("sig_a", "sig_b", lambda a, b: a == b),
                        lambda x: x,
                    )
                )
                / F.lit(num_hashes)
            )
            est_col = "__sig"
        else:
            # r13 default: positional match count as set intersection
            # of the position-tagged signatures (tagged once per rep in
            # the persisted sig frame above) — codegen'd end to end,
            # no boxed per-candidate lambda evaluation.  Same estimate
            # value (tag collisions are 2^-64 and can only widen the
            # candidate set; the output is decided by exact verify).
            est = F.size(F.array_intersect("sig_a", "sig_b")) / F.lit(
                num_hashes
            )
            est_col = "__sigt"
        sig_a = sig.select(
            F.col("__fp").alias("fp_a"), F.col(est_col).alias("sig_a")
        )
        sig_b2 = sig.select(
            F.col("__fp").alias("fp_b"), F.col(est_col).alias("sig_b")
        )
        # attachment gate is the REP count, independent of the candidate
        # strategy: a huge rep table must not be broadcast here
        if broadcast_reps:
            sig_a, sig_b2 = F.broadcast(sig_a), F.broadcast(sig_b2)
        cand = (
            cand.join(sig_a, "fp_a")
            .join(sig_b2, "fp_b")
            .filter(est >= est_cutoff)
            .select("fp_a", "fp_b")
        )

    # |A∪B| = |A|+|B|-|A∩B|: sizes cached per rep, only the
    # intersection runs per candidate pair.  Broadcast the rep arrays
    # when the rep table is small — pinning the plan keeps AQE from
    # re-deciding the join strategy per run on the unknown-cardinality
    # candidate stream (measured swings of 1.5s..52s on the SAME work
    # when left to runtime stats).
    if broadcast_reps:
        rep_a, rep_b = F.broadcast(rep_a), F.broadcast(rep_b)
    rep_pairs = (
        cand.join(rep_a, "fp_a")
        .join(rep_b, "fp_b")
        .withColumn("jaccard", jaccard_col)
        .filter(F.col("jaccard") >= threshold)
        .select("fp_a", "fp_b", "jaccard")
    )
    return ids, rep_pairs, False, broadcast_members


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 1,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.9,
    seed: int = 42,
    est_prefilter: bool = False,
    broadcast_reps: bool | None = None,
    broadcast_rep_limit: int = 100_000,
    candidate_strategy: str | None = None,
    salt_slice_rows: int = 256,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard >= threshold).

    Pipeline: shingle -> identical-set collapse -> minhash signature ->
    banded candidate join -> exact-Jaccard verify -> member expansion.
    The physical candidate/verification strategy is size-adaptive (see
    :func:`_minhash_rep_graph`); ``broadcast_reps`` forces it.  Output
    columns: ``id_a, id_b, jaccard`` (every value exact).

    .. note:: Construction EAGERLY materializes the cached signature
       table (one rep-table-sized Spark job — metadata relative to the
       corpus) and, for the duration of that job, suspends
       ``spark.sql.adaptive.coalescePartitions.enabled`` on the session
       (AQE sizes partitions by shuffle BYTES; the rep table's bytes
       are tiny while the downstream signature computation is the
       CPU-heavy part, and coalescing serialized it into one task).
       The toggle is session-global: queries planned CONCURRENTLY on
       the same SparkSession during that window are planned with
       coalescing off.  Concurrent ``minhash_dedup_*`` /
       ``ngram_jaccard_*`` constructions themselves are safe (a module
       lock serializes the set/restore), but unrelated threads planning
       other queries can still observe the off state.
    """
    assert num_hashes % bands == 0
    base = _with_shingles(df, id_col, text_col, ngram)
    if threshold > 1.0:
        return base.select(
            F.col("__id").alias("id_a"),
            F.col("__id").alias("id_b"),
            F.lit(1.0).alias("jaccard"),
        ).filter(F.lit(False))

    ids, rep_pairs, bcast, bcast_members = _minhash_rep_graph(
        df, id_col, text_col, ngram, num_hashes, bands, threshold, seed,
        est_prefilter, broadcast_reps, broadcast_rep_limit,
        candidate_strategy, salt_slice_rows,
    )

    # intra-cluster pairs: jaccard exactly 1.0, no verification needed.
    # Build side pinned (broadcast under the member gate, shuffle_hash
    # above it) so the physical plan does not flip with scale —
    # statistics-chosen strategies defeat warmup-compiled codegen.
    intra_build = ids.alias("y")
    intra_build = (
        F.broadcast(intra_build)
        if bcast_members
        else intra_build.hint("shuffle_hash")
    )
    intra = (
        ids.alias("x")
        .join(
            intra_build,
            (F.col("x.__fp") == F.col("y.__fp"))
            & (F.col("x.__id") < F.col("y.__id")),
        )
        .select(
            F.col("x.__id").alias("id_a"),
            F.col("y.__id").alias("id_b"),
            F.lit(1.0).alias("jaccard"),
        )
    )

    # expand qualifying representative pairs to member pairs; members of
    # each cluster share one token set, so the jaccard carries over
    ids_a = ids.select(F.col("__fp").alias("fp_a"), F.col("__id").alias("ida"))
    ids_b = ids.select(F.col("__fp").alias("fp_b"), F.col("__id").alias("idb"))
    # `ids` is MEMBER-level: in clique-heavy corpora it is unbounded
    # relative to reps, so the rep-count decision is NOT reused here —
    # the member gate comes from the same single aggregate job (auto
    # mode) or the caller's pin (see _minhash_rep_graph); above the
    # bound, AQE's runtime size stats pick the join strategy.
    if bcast_members:
        ids_a, ids_b = F.broadcast(ids_a), F.broadcast(ids_b)
    expanded = (
        rep_pairs.join(ids_a, "fp_a")
        .join(ids_b, "fp_b")
        .select(
            F.least("ida", "idb").alias("id_a"),
            F.greatest("ida", "idb").alias("id_b"),
            "jaccard",
        )
    )
    return intra.unionByName(expanded)


def minhash_dedup_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 1,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.9,
    seed: int = 42,
    est_prefilter: bool = False,
    broadcast_reps: bool | None = None,
    broadcast_rep_limit: int = 100_000,
    salt_slice_rows: int = 256,
) -> DataFrame:
    """Transitive near-dup clusters WITHOUT materializing member pairs.

    Connected components run over the *representative* graph (nodes =
    distinct-set fingerprints, edges = qualifying rep pairs) — for
    clique-heavy corpora this is orders of magnitude smaller than the
    member-pair graph ``dedup_clusters(df, minhash_dedup_pairs(df))``
    would traverse (intra-clique pairs are quadratic in clique size and
    contribute nothing to connectivity).  The ``__fp`` membership map
    then assigns every document the minimum member id of its component.
    Output: all ``df`` columns + ``cluster_rep``; rows outside the pair
    graph (including empty documents) are their own singleton cluster.

    Eager-materialization + session-conf note: see
    :func:`minhash_dedup_pairs`.
    """
    from sparkall_spark.operators.graph import connected_components

    assert num_hashes % bands == 0
    ids, rep_pairs, _bcast, _bcast_members = _minhash_rep_graph(
        df, id_col, text_col, ngram, num_hashes, bands, threshold, seed,
        est_prefilter, broadcast_reps, broadcast_rep_limit,
        salt_slice_rows=salt_slice_rows,
    )
    comps = connected_components(rep_pairs, "fp_a", "fp_b").withColumnRenamed(
        "node", "__fp"
    )
    # every member doc -> component id (its own fp when not in the
    # graph: identical-set cliques without external edges still cluster
    # because members share the fp)
    fp_comp = ids.join(comps, "__fp", "left").withColumn(
        "comp", F.coalesce(F.col("comp"), F.col("__fp"))
    )
    rep_ids = fp_comp.groupBy("comp").agg(F.min("__id").alias("cluster_rep"))
    doc_cluster = fp_comp.join(rep_ids, "comp").select(
        F.col("__id").alias(id_col), "cluster_rep"
    )
    return df.join(doc_cluster, id_col, "left").withColumn(
        "cluster_rep", F.coalesce(F.col("cluster_rep"), F.col(id_col))
    )


def minhash_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    **kwargs,
) -> DataFrame:
    """Drop near-duplicates: every doc that matches a lower-id doc goes.

    (Greedy transitive pruning: a row survives iff no *surviving* check
    is needed — we drop any id that appears as id_b, which removes
    whole near-dup clusters except their minimum id.)

    Eager-materialization + session-conf note: see
    :func:`minhash_dedup_pairs`.
    """
    pairs = minhash_dedup_pairs(df, id_col, text_col, **kwargs)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


def minhash_ledger_table(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 1,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
) -> DataFrame:
    """The NEAR-DUP ledger row for every document: what an incremental
    ingest pipeline persists per kept document so later batches can be
    near-dup-checked against the corpus WITHOUT recomputing it (the
    minhash analog of :func:`exact_dedup_incremental`'s fingerprint
    ledger).

    One row per input document (empty documents — no shingles — are
    skipped: they cannot near-dup match anything):

    - ``id_col``: the document id, passed through;
    - ``n_shingles`` INT: distinct-shingle count (size filtering);
    - ``shingle_hashes`` ARRAY<BIGINT>: the sorted 64-bit hashes of the
      distinct shingle set (exact-Jaccard verification);
    - ``band_hashes`` ARRAY<INT>: per-band LSH hashes (candidate
      generation).

    Map-side only — no shuffle, no join; write it partitioned however
    the corpus is partitioned.  The hash columns are engine-internal
    (JVM xxhash64), so a ledger must be produced and consumed by the
    SAME parameters: ``ngram`` / ``num_hashes`` / ``bands`` / ``seed``
    mismatches between the ledger build and
    :func:`minhash_dedup_incremental` silently break candidate
    generation — store the parameters next to the ledger.

    Scale: the ledger is corpus-sized but hash-only — ~8 bytes per
    distinct shingle plus ~4 per band, orders of magnitude smaller than
    the text it summarizes.
    """
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    base = _with_shingles(docs, id_col, text_col, ngram)
    return (
        base.withColumn("__shh", F.array_sort(F.transform("__sh", _token_hash)))
        .withColumn("__sig", F.expr(_sig_sql("__shh", num_hashes, seed)))
        .select(
            F.col("__id").alias(id_col),
            F.size("__shh").cast("int").alias("n_shingles"),
            F.col("__shh").alias("shingle_hashes"),
            F.expr(_band_hashes_sql("__sig", bands, rows)).alias("band_hashes"),
        )
    )


def minhash_dedup_incremental(
    new_docs: DataFrame,
    ledger: DataFrame | None,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 1,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.9,
    seed: int = 42,
    broadcast_reps: bool | None = None,
    candidate_strategy: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """NEAR-duplicate-dedup an incoming batch against an already-
    ingested corpus — the day-to-day shape of a continuous-crawl
    pipeline, where re-running pairwise dedup over the historical 100 TB
    per ingest is a non-starter.  Completes the incremental family:
    :func:`exact_dedup_incremental` catches byte-identical reingests,
    this catches boilerplate-shifted / lightly-edited ones.

    ``ledger`` is the persisted :func:`minhash_ledger_table` of every
    previously KEPT document (``None`` = cold start, within-batch dedup
    only).  Returns ``(kept, ledger_delta)``:

    - ``kept``: the batch rows that survive BOTH checks below, all
      input columns preserved;
    - ``ledger_delta``: the :func:`minhash_ledger_table` rows of the
      kept documents, to APPEND to the ledger — a projection of the
      same plan, not a recompute.

    A batch document is dropped when

    1. it has a verified near-duplicate in the ledger
       (``exact jaccard >= threshold`` against the ledger's shingle
       hashes — LSH banding only *proposes*, the exact verify decides;
       per-true-pair miss odds ``(1-t^r)^b``, ~4e-8 at the defaults), or
    2. a SMALLER-ID corpus-surviving batch document near-duplicates it
       (the dominated rule — deliberately non-recursive, like
       :func:`semdedup`'s greedy min-id keep, so the kept set is a pure
       function of the batch + ledger and a SQL mirror needs no
       recursion; a greedy *sequential* sweep would additionally keep
       documents whose only competitor was itself dropped).

    Idempotent: replaying an already-applied batch finds every document
    at jaccard 1.0 against its own ledger row and keeps nothing —
    except EMPTY documents (no shingles), which carry no ledger row and
    pass through every time; run :func:`exact_dedup_incremental` ahead
    of this (as a real ingest does anyway) to pin those byte-exactly.

    Scale: the ledger is read in ONE pass with ZERO corpus-side
    shuffle — the batch's band table and per-doc signature table are
    both broadcast, candidates are generated and exact-verified inside
    the scan (first-matching-band + size filters prune map-side), and
    only the dropped-id set (bounded by the batch size) shuffles.  The
    batch must therefore be BROADCASTABLE (bands table: ~24 B x bands
    per doc; signature table: ~8 B per distinct shingle per doc) —
    size ingest ticks accordingly (1e4..1e6 documents), or fall back to
    ``minhash_dedup_pairs`` over ``corpus UNION batch`` for a one-shot
    backfill.  The within-batch check reuses the pair machinery at
    batch scale.  ``broadcast_reps`` / ``candidate_strategy`` forward
    to that within-batch pair machinery — ingest batches are bounded,
    so pinning ``broadcast_reps=True`` skips its counted strategy gate
    (one Spark job per ingest tick).

    Eager-materialization + session-conf note: see
    :func:`minhash_dedup_pairs`.
    """
    assert num_hashes % bands == 0
    sigs = _persist(
        minhash_ledger_table(
            new_docs, id_col, text_col, ngram, num_hashes, bands, seed
        )
    )

    survivors = new_docs
    if ledger is not None:
        # persisted: the dropped-id set (bounded by the batch) anchors
        # BOTH the within-batch machinery's eager materialization job
        # and the final kept/delta plans — without the cache the
        # one-pass ledger probe would run once per consumer
        vs_ledger = _persist(
            _ledger_dropped_ids(sigs, ledger, id_col, bands, threshold)
        )
        survivors = survivors.join(vs_ledger, id_col, "left_anti")
    # within-batch: dominated rule over the corpus survivors — any doc
    # with a smaller-id verified near-dup goes (pair machinery handles
    # exact-dup cliques via its rep collapse; batch-sized throughout)
    pairs = minhash_dedup_pairs(
        survivors, id_col, text_col, ngram, num_hashes, bands, threshold,
        seed, broadcast_reps=broadcast_reps,
        candidate_strategy=candidate_strategy,
    )
    dominated = pairs.select(F.col("id_b").alias(id_col)).distinct()
    kept = survivors.join(dominated, id_col, "left_anti")
    delta = sigs.join(
        kept.select(id_col), id_col, "left_semi"
    )
    return kept, delta


def _ledger_dropped_ids(
    sigs: DataFrame,
    ledger: DataFrame,
    id_col: str,
    bands: int,
    threshold: float,
) -> DataFrame:
    """Batch ids with a verified near-dup in the ledger — ONE pass over
    the ledger, zero corpus-side shuffle.

    The batch's slim band probe and its per-doc signature table are
    both broadcast; the ledger scan generates candidates (band-hash
    equality + size filter), dedups them (first matching band), and
    exact-verifies jaccard, all map-side.  Only the bounded dropped-id
    set shuffles (the final distinct).
    """
    batch_bands = sigs.select(
        F.col(id_col).alias("__bid"),
        F.col("n_shingles").alias("__bn"),
        F.posexplode("band_hashes").alias("__bband", "__bh"),
    )
    batch_sets = sigs.select(
        F.col(id_col).alias("__bid"),
        F.col("shingle_hashes").alias("__bshh"),
        F.col("band_hashes").alias("__bbhs"),
    )
    led = ledger.select(
        F.col("n_shingles").alias("__ln"),
        F.col("shingle_hashes").alias("__lshh"),
        F.col("band_hashes").alias("__lbhs"),
        F.posexplode("band_hashes").alias("__band", "__lbh"),
    )
    size_ok = (
        F.col("__bn") * F.lit(1.0) >= F.lit(threshold) * F.col("__ln")
    ) & (F.col("__ln") * F.lit(1.0) >= F.lit(threshold) * F.col("__bn"))
    inter = F.size(
        F.array_intersect(F.col("__lshh"), F.col("__bshh"))
    ).cast("double")
    union = F.col("__bn") + F.col("__ln") - inter
    return (
        led.join(
            F.broadcast(batch_bands),
            (F.col("__band") == F.col("__bband"))
            & (F.col("__lbh") == F.col("__bh"))
            & size_ok,
        )
        .join(F.broadcast(batch_sets), "__bid")
        # exactly-once per (ledger doc, batch doc): first matching
        # band only — later-band duplicates die before the verify
        .filter(
            _first_match_band(bands, "__lbhs", "__bbhs")
            == F.col("__band") + 1
        )
        .filter(
            F.when(union > 0, inter / union).otherwise(F.lit(0.0))
            >= threshold
        )
        .select(F.col("__bid").alias(id_col))
        .distinct()
    )


def simhash(hash_array: Column, bits: int = 64) -> Column:
    """SimHash fingerprint from an array of 64-bit token hashes.

    Bit loop is Python-unrolled (shift amounts must be literals for
    JVM-side bitwise ops); each bit's sign-sum is one aggregate over
    the hash array, all inside whole-stage codegen.
    """

    def _bit_sum(i: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, F.lit(1)
        ).otherwise(F.lit(-1))

    fp = F.lit(0).cast("bigint")
    for i in range(bits):
        s = F.aggregate(hash_array, F.lit(0), _bit_sum(i))
        weight = -(1 << 63) if i == 63 else (1 << i)
        fp = fp + F.when(s > 0, F.lit(weight).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return fp


def simhash_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 30,
    portable: bool = True,
) -> DataFrame:
    """Per-document SimHash fingerprints: ``(id, simhash)``.

    ``portable=True`` hashes tokens with the engine-portable rolling
    polynomial (:func:`sparkall_spark.functions.text.token_fingerprints`,
    domain [0, 1e9+7) so 30 bits carry signal) — the whole computation
    is mirrorable in ANSI SQL, which is what makes the driver's
    oracle check possible.  ``portable=False`` uses the faster
    JVM xxhash64 (64-bit) for production banding via
    :func:`simhash_pairs`.
    """
    from sparkall_spark.functions.text import token_fingerprints

    if portable:
        hashes = token_fingerprints(text_col)
    else:
        hashes = F.transform(
            F.split(F.lower(F.col(text_col)), r"\s+"), _token_hash
        )
    return df.select(
        F.col(id_col), simhash(hashes, bits=bits).alias("simhash")
    )


def fingerprint_hamming_pairs(
    df: DataFrame,
    id_col: str,
    fp_col: str,
    max_hamming: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """Candidate pairs whose 64-bit fingerprints (ANY source: SimHash,
    image dHash, audio chroma hash) differ by <= ``max_hamming`` bits.

    Banding: split the fingerprint into ``chunks`` equal-width chunks;
    by pigeonhole any pair within Hamming distance < chunks shares at
    least one exact chunk -> candidates come from an equi-join on
    (chunk_id, chunk_value), never an all-pairs scan.  Full recall
    therefore requires ``max_hamming < chunks`` (enforced).  NULL
    fingerprints are dropped.  Output: ``id_a, id_b, hamming`` with
    id_a < id_b.

    Scale shape: the chunk join shuffles (chunk, value) keys — cold
    chunk values never pair; a value shared by m fingerprints costs
    m² candidate rows, so a degenerate constant fingerprint (e.g. the
    all-zero dHash of blank images) is the skew case — filter such
    sentinel values upstream if the corpus contains them in bulk.
    """
    if not 1 <= chunks <= 64 or 64 % chunks:
        raise ValueError(f"chunks must divide 64, got {chunks}")
    if max_hamming >= chunks:
        raise ValueError(
            f"max_hamming={max_hamming} needs chunks > max_hamming for "
            f"full recall (pigeonhole), got chunks={chunks}"
        )
    width = 64 // chunks
    mask = (1 << width) - 1
    fp = df.filter(F.col(fp_col).isNotNull()).select(
        F.col(id_col).alias("__id"), F.col(fp_col).cast("bigint").alias("__fp")
    )
    chunk_cols = [
        F.struct(
            F.lit(i).alias("chunk"),
            F.shiftright("__fp", i * width).bitwiseAND(F.lit(mask)).alias("cv"),
        )
        for i in range(chunks)
    ]
    chunked = fp.select(
        "__id", "__fp", F.explode(F.array(*chunk_cols)).alias("c")
    ).select("__id", "__fp", F.col("c.chunk").alias("chunk"), F.col("c.cv").alias("cv"))

    cand = (
        chunked.alias("x")
        .join(
            chunked.alias("y"),
            (F.col("x.chunk") == F.col("y.chunk"))
            & (F.col("x.cv") == F.col("y.cv"))
            & (F.col("x.__id") < F.col("y.__id")),
        )
        .select(
            F.col("x.__id").alias("id_a"),
            F.col("y.__id").alias("id_b"),
            F.col("x.__fp").alias("fp_a"),
            F.col("y.__fp").alias("fp_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 1,
    max_hamming: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """Candidate pairs whose 64-bit SimHash differs by <= max_hamming
    bits — text fingerprinting composed over the generic
    :func:`fingerprint_hamming_pairs` band join.  Output: id_a, id_b,
    hamming."""
    base = _with_shingles(df, id_col, text_col, ngram)
    fp = base.withColumn("__h", F.transform("__sh", _token_hash)).withColumn(
        "__fp", simhash(F.col("__h"))
    )
    return fingerprint_hamming_pairs(
        fp, "__id", "__fp", max_hamming=max_hamming, chunks=chunks
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
    est_prefilter: bool = False,
    broadcast_reps: bool | None = None,
    broadcast_rep_limit: int = 100_000,
    candidate_strategy: str | None = None,
    salt_slice_rows: int = 256,
) -> DataFrame:
    """Exact n-gram-Jaccard pairs via multi-band min-hash blocking.

    Round-1 shipped a single-min-hash block: recall was only >=
    threshold *probabilistically* and the join shuffled full shingle
    arrays on both sides.  This is now the multi-band pipeline —
    identical shingle sets collapse exactly first, candidates come
    from ``bands`` banded equi-joins on compact keys, and verification
    computes exact Jaccard over hashed int arrays.  A pair with true
    Jaccard j is missed with probability (1-j^(num_hashes/bands))^bands
    (~5e-8 at j=0.9 with the defaults); every *emitted* jaccard value
    is exact.  Output: ``id_a, id_b, jaccard``.

    Eager-materialization + session-conf note: see
    :func:`minhash_dedup_pairs`.
    """
    return minhash_dedup_pairs(
        df,
        id_col=id_col,
        text_col=text_col,
        ngram=ngram,
        num_hashes=num_hashes,
        bands=bands,
        threshold=threshold,
        seed=seed,
        est_prefilter=est_prefilter,
        broadcast_reps=broadcast_reps,
        broadcast_rep_limit=broadcast_rep_limit,
        candidate_strategy=candidate_strategy,
        salt_slice_rows=salt_slice_rows,
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    left_filter: Column | None = None,
    exact: bool = False,
    dim: int = 64,
    bits: int = 8,
    tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Cosine near-duplicate pairs over an embedding column.

    Default path (100 TB-safe): random-hyperplane LSH bucketing — each
    vector lands in ``tables`` sign-bit buckets; candidate pairs come
    from an equi-join on (table, bucket) with only (id, table, bucket)
    triples in the shuffle, then exact cosine rescoring on the joined-
    back vectors.  Never an all-pairs product: the physical plan is
    hash joins only (asserted in tests/test_plan_shapes.py).  Recall
    for a pair at angle theta is 1-(1-(1-theta/pi)^bits)^tables; raise
    ``tables`` (or lower ``bits``) to push it toward 1.

    ``exact=True`` switches to the brute-force theta join
    (BroadcastNestedLoopJoin, O(N^2)) — the verification baseline for
    small N, never the default.

    ``left_filter`` restricts the *left* side of the pair (pairs keep
    ids with the filtered id as ``id_a``).  Output: ``id_a, id_b,
    cosine`` (rounded 1e-6), id_a < id_b.
    """
    from sparkall_spark.operators.similarity import (
        bucket_ids,
        cosine_similarity,
        dot,
        l2_norm,
    )

    v = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    left = v.filter(left_filter) if left_filter is not None else v

    if exact:
        return (
            left.alias("x")
            .join(v.alias("y"), F.col("x.__id") < F.col("y.__id"))
            .select(
                F.col("x.__id").alias("id_a"),
                F.col("y.__id").alias("id_b"),
                F.round(
                    cosine_similarity(F.col("x.__v"), F.col("y.__v")), 6
                ).alias("cosine"),
            )
            .filter(F.col("cosine") >= threshold)
        )

    def banded(d: DataFrame) -> DataFrame:
        return d.select(
            "__id",
            F.posexplode(bucket_ids(F.col("__v"), dim, bits, tables, seed)).alias(
                "tbl", "bkt"
            ),
        )

    cand = (
        banded(left)
        .alias("x")
        .join(
            banded(v).alias("y"),
            (F.col("x.tbl") == F.col("y.tbl"))
            & (F.col("x.bkt") == F.col("y.bkt"))
            & (F.col("x.__id") < F.col("y.__id")),
        )
        .select(F.col("x.__id").alias("id_a"), F.col("y.__id").alias("id_b"))
        .distinct()
    )
    # join candidates back to the vectors (norms precomputed once per
    # row, not once per pair); only candidate pairs pay the O(dim) dot
    vn = v.withColumn("__n", l2_norm(F.col("__v")))
    denom = F.col("__na") * F.col("__nb")
    return (
        cand.join(
            vn.select(
                F.col("__id").alias("id_a"),
                F.col("__v").alias("__va"),
                F.col("__n").alias("__na"),
            ),
            "id_a",
        )
        .join(
            vn.select(
                F.col("__id").alias("id_b"),
                F.col("__v").alias("__vb"),
                F.col("__n").alias("__nb"),
            ),
            "id_b",
        )
        .withColumn(
            "cosine",
            F.round(
                F.when(
                    denom > 0, dot(F.col("__va"), F.col("__vb")) / denom
                ).otherwise(F.lit(0.0)),
                6,
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def semdedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    centroids=None,
    n_cells: int = 16,
    sample_size: int = 2048,
    iters: int = 5,
    seed: int = 42,
    assign: str = "arrow",
    max_cell_size: int | None = None,
    oversize: str = "salt",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster
    embeddings with k-means, then prune near-duplicates WITHIN each
    cluster only.

    Unlike :func:`embedding_neardup_pairs` (LSH candidates, aims for
    full recall), this is the deliberately lossy cluster-local variant:
    cross-cluster near-dups are out of scope by design, which is what
    bounds the pair search at web scale.  The keep rule is deterministic
    greedy min-id: a row is dropped iff some SAME-CELL row with a
    smaller id is within ``threshold`` cosine (6dp-rounded, so a SQL
    mirror agrees bit-for-bit).

    Scale design: identical vectors collapse to their min-id
    representative FIRST (one groupBy on the vector value) — this is
    semantics-preserving (every non-min member has an identical
    smaller-id same-cell neighbor at cosine 1.0 >= threshold, so it is
    dropped by definition; a rep is dropped iff some smaller-id rep
    qualifies, because members share their rep's vector exactly) and
    makes exact-duplicate cliques linear instead of quadratic, the same
    collapse the minhash pipeline does.  Cell assignment is a map-only
    pass against literal centroids (``nearest_cells_expr``); the
    remaining shuffles are the equi-join on ``cell`` and one distinct
    over dropped ids.  Per-cell work on the collapsed set is
    O(|cell|^2) pairs, so ``n_cells`` must grow with the corpus (the
    paper uses ~50k clusters for LAION-scale; cells a few thousand wide
    keep the quadratic term flat).  Centroid training itself is a
    bounded driver-side sample (metadata-scale) — or pass ``centroids``
    for a fixed, fully deterministic codebook.

    ``max_cell_size`` guards the quadratic term against a pathological
    cell (a semantic cluster tighter than ``n_cells`` can split): cells
    above the cap are sub-split by a deterministic id-hash salt into
    ~``max_cell_size`` slices, deduped within each salt, then ONE
    cross-salt pass runs over the within-salt SURVIVORS (whose pair
    count collapses precisely when the cell is pathological — a tight
    near-dup cluster keeps ~1 survivor per salt).  Within-salt work is
    |cell|·max_cell_size instead of |cell|², i.e. near-linear on a
    one-cluster corpus.  The two-phase rule is a documented superset of
    the exact survivors: a drop is missed only when ALL its smaller-id
    witnesses were themselves dropped in other salts — still
    deterministic, and strictly more conservative (keeps more).
    ``oversize="error"`` instead refuses to run when any cell exceeds
    the cap (one metadata-scale aggregate).

    Returns the SURVIVING rows: ``(id_col, cell)``.  Requires
    ``threshold <= 1.0`` (identical copies must count as duplicates).
    """
    import numpy as np

    from sparkall_spark.operators.similarity import (
        assign_cells,
        l2_norm,
        nearest_cells_expr,
        train_centroids,
    )

    if threshold > 1.0:
        raise ValueError("semdedup threshold must be <= 1.0")
    if oversize not in ("salt", "error"):
        raise ValueError(f"oversize must be 'salt' or 'error', got {oversize!r}")
    v = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    ).withColumn("__n", l2_norm(F.col("__v")))
    # identical-vector collapse: exact-duplicate groups keep only their
    # min id for the pair search (see docstring for the equivalence).
    # Zero-norm vectors are EXCLUDED from the collapse: the module's
    # cosine definition scores them 0.0 against everything — including
    # an identical zero vector — so the documented pair rule
    # (cosine >= threshold) keeps duplicate zero embeddings; collapsing
    # them would dedup rows the pair rule never would (ADVICE r4).
    nz = v.filter(F.col("__n") > 0)
    zz = v.filter(F.col("__n") <= 0)
    nz = nz.groupBy("__v", "__n").agg(F.min("__id").alias("__id"))
    v = nz.select("__id", "__v", "__n").unionByName(zz.select("__id", "__v", "__n"))
    if centroids is not None:
        cents = np.asarray(centroids, dtype=float)
    else:
        sample = np.array(
            [r["__v"] for r in v.select("__v").limit(sample_size).collect()]
        )
        if sample.size == 0:
            # empty input: train_centroids would crash on an empty
            # sample (ADVICE r4) — nothing to dedup, return empty
            return df.select(
                F.col(id_col), F.lit(0).cast("int").alias("cell")
            ).limit(0)
        cents = train_centroids(sample, n_cells, iters, seed)

    # Cell assignment: Arrow-batched matmul by default (assign_cells —
    # the interpreted higher-order fold of nearest_cells_expr costs
    # ~1 ms/row; the batched matmul is ~1 µs/row with identical
    # rounding/tie semantics); assign="column" keeps the pure-Column
    # expression for UDF-free plans.  Persisted because the plan reads
    # `cells` three times (both pair sides + the anti join); tracked in
    # the shared cache registry (release_caches()).
    if assign == "column":
        cell_col = F.element_at(nearest_cells_expr(F.col("__v"), cents, 1), 1)
    elif assign == "arrow":
        cell_col = assign_cells(F.col("__v"), cents)
    else:
        raise ValueError(f"assign must be 'arrow' or 'column', got {assign!r}")
    cells = _persist(v.withColumn("cell", cell_col))

    denom = F.col("__na") * F.col("__nb")
    cos = F.round(
        F.when(
            denom > 0,
            F.aggregate(
                F.zip_with(F.col("__va"), F.col("__vb"), lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / denom,
        ).otherwise(F.lit(0.0)),
        6,
    )

    def _dropped_ids(src, join_keys, cross_salt=False):
        """Ids dropped by the pairwise min-id rule among rows sharing
        ``join_keys``; ``cross_salt`` restricts to pairs in DIFFERENT
        salts (within-salt survivor pairs can never qualify — any
        qualifying one would already have dropped its larger id)."""
        extra_a = [F.col("__salt").alias("__sa")] if cross_salt else []
        extra_b = [F.col("__salt").alias("__sb")] if cross_salt else []
        aa = src.select(
            F.col("__id").alias("__ida"),
            F.col("__v").alias("__va"),
            F.col("__n").alias("__na"),
            *join_keys,
            *extra_a,
        )
        bb = src.select(
            F.col("__id").alias("__idb"),
            F.col("__v").alias("__vb"),
            F.col("__n").alias("__nb"),
            *join_keys,
            *extra_b,
        )
        pairs = aa.join(bb, list(join_keys)).filter(F.col("__ida") < F.col("__idb"))
        if cross_salt:
            pairs = pairs.filter(F.col("__sa") != F.col("__sb"))
        return (
            pairs.filter(cos >= F.lit(threshold))
            .select(F.col("__idb").alias("__id"))
            .distinct()
        )

    if max_cell_size is not None:
        sizes = cells.groupBy("cell").agg(F.count("*").alias("__csz"))
        if oversize == "error":
            biggest = sizes.agg(F.max("__csz")).collect()[0][0] or 0
            if biggest > max_cell_size:
                raise ValueError(
                    f"semdedup cell of {biggest} rows exceeds "
                    f"max_cell_size={max_cell_size}; raise n_cells (the "
                    "per-cell pair search is O(|cell|^2)) or use "
                    "oversize='salt'"
                )
        else:
            # sizes has n_cells rows — broadcast the join, then salt
            # each oversized cell into ceil(size/cap) deterministic
            # id-hash slices
            n_salts = F.greatest(
                F.lit(1),
                F.ceil(F.col("__csz") / F.lit(max_cell_size)).cast("int"),
            )
            salted = cells.join(F.broadcast(sizes), "cell").withColumn(
                "__salt", F.pmod(F.xxhash64(F.col("__id")), n_salts).cast("int")
            )
            d1 = _dropped_ids(salted, ["cell", "__salt"])
            s1 = _persist(salted.join(d1, "__id", "left_anti"))
            d2 = _dropped_ids(s1, ["cell"], cross_salt=True)
            return s1.join(d2, "__id", "left_anti").select(
                F.col("__id").alias(id_col), "cell"
            )

    dropped = _dropped_ids(cells, ["cell"])
    return (
        cells.join(dropped, "__id", "left_anti")
        .select(F.col("__id").alias(id_col), "cell")
    )


def url_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
) -> DataFrame:
    """URL-level dedup for crawl corpora (r5): keep the min-id document
    per CANONICAL URL (`functions.text.canonical_url`: fragment/default
    port/tracking-param/dup-slash normalization), so recrawls and
    tracking-decorated links collapse before any content-level dedup
    runs.  One 8-byte-key window shuffle (hash of the canonical form),
    like :func:`exact_dedup`."""
    from sparkall_spark.functions.text import canonical_url

    w = Window.partitionBy(
        F.xxhash64(canonical_url(url_col))
    ).orderBy(F.col(id_col).asc())
    return (
        docs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def sentence_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    key: str = "sentence",
) -> DataFrame:
    """Corpus-wide SENTENCE-level exact dedup (the C4/CCNet granularity
    between document-level :func:`exact_dedup` and token-window
    :func:`sparkall_spark.operators.substrings.exact_substring_dedup`):
    every sentence keeps exactly its GLOBALLY FIRST occurrence — ordered
    by (``id_col``, position) — and every later occurrence, in the same
    document or any other, is deleted; each document's text is rebuilt
    from its surviving sentences in original order.

    Returns ``docs`` with ``text_col`` replaced by the rebuilt text
    plus ``n_sentences`` / ``n_kept`` BIGINT counters (a document whose
    every sentence first appeared elsewhere keeps an empty string).

    Scale: sentence splitting is map-side; the first-occurrence winner
    per sentence is ONE ``groupBy(sentence).agg(min(struct(id, pos)))``
    — partial map-side combine makes hot sentences ("Thank you.")
    skew-proof, unlike a rank window partitioned by sentence, which
    would sort every occurrence of the hot key on one task.  Because
    every KEPT occurrence *is* its group's winner, the rebuild reads the
    winners table alone — no join back to the exploded corpus.  The
    rebuild groupBy(id) and the stats join share the id key, so AQE
    plans them on one exchange.

    ``key`` picks the first-occurrence shuffle key:

    - ``"sentence"`` (default): the sentence string itself —
      collision-free and oracle-exact (mirrored by the e01 driver leg).
    - ``"hash"``: ``xxhash64(sentence)`` — the 100 TB form: grouping
      keys are fixed 8-byte values instead of arbitrary-length strings,
      cutting shuffle bytes and comparator cost.  Two DIFFERENT
      sentences colliding in 64 bits would wrongly dedup one of them;
      with ~1e10 distinct sentences the expected number of colliding
      pairs is ~(1e10)^2 / 2^65 ≈ 2.7 — the same birthday-bound
      accepted for the 128-bit-halved doc ids in
      ``pipeline.crawl_to_documents`` (there at 2^-25 odds; here a
      handful of wrongly-dropped sentences in a 100 TB corpus, noise
      relative to the dedup itself).  Winner selection stays
      deterministic even under a collision (min over
      ``struct(id, pos, sentence)``).

    ``id_col`` values must be UNIQUE across ``docs``: the rebuilt text
    is attached with a left join back on ``id_col``, so a duplicated id
    silently duplicates output rows and cross-assigns rebuilt text
    (same contract as ``selection.perplexity_buckets``; run
    :func:`exact_dedup` or assign ``uuid()`` ids first).
    """
    if key not in ("sentence", "hash"):
        raise ValueError(f"key must be 'sentence' or 'hash', got {key!r}")
    from sparkall_spark.functions.text import sentences

    sent_arr = sentences(text_col)
    exploded = docs.select(
        F.col(id_col).alias("__id"), F.posexplode(sent_arr)
    ).toDF("__id", "__pos", "__sent")
    if key == "hash":
        # 8-byte shuffle key; the winning occurrence's sentence rides in
        # the min-struct (3rd field), so the result is deterministic
        # even if two distinct sentences collide in 64 bits.
        winners = exploded.groupBy(
            F.xxhash64("__sent").alias("__k")
        ).agg(F.min(F.struct("__id", "__pos", "__sent")).alias("__f")).select(
            F.col("__f.__id").alias("__id"),
            F.col("__f.__pos").alias("__pos"),
            F.col("__f.__sent").alias("__sent"),
        )
    else:
        winners = exploded.groupBy("__sent").agg(
            F.min(F.struct("__id", "__pos")).alias("__f")
        ).select(
            F.col("__f.__id").alias("__id"),
            F.col("__f.__pos").alias("__pos"),
            "__sent",
        )
    rebuilt = (
        winners.groupBy("__id")
        .agg(
            F.array_sort(F.collect_list(F.struct("__pos", "__sent"))).alias(
                "__ks"
            )
        )
        .select(
            "__id",
            F.concat_ws(
                " ", F.transform("__ks", lambda s: s["__sent"])
            ).alias("__new_text"),
            F.size("__ks").cast("bigint").alias("__n_kept"),
        )
    )
    keyed = docs.withColumn("__ns", F.size(sent_arr).cast("bigint"))
    out = keyed.join(
        rebuilt, keyed[id_col] == rebuilt["__id"], "left"
    )
    return out.select(
        *[
            F.coalesce("__new_text", F.lit("")).alias(c)
            if c == text_col
            else F.col(c)
            for c in docs.columns
        ],
        F.col("__ns").alias("n_sentences"),
        F.coalesce("__n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
    )


# --- incremental SEMANTIC (embedding) dedup ---------------------------------
#
# Completes the incremental-ingest family along the third axis:
# exact_dedup_incremental pins byte-identical reingests,
# minhash_dedup_incremental catches lightly-edited text, and this
# catches PARAPHRASES — same meaning re-crawled through a different
# renderer/translator, invisible to token-overlap methods.  Same
# ledger-probe contract throughout: the corpus is summarized once into
# a compact persisted ledger, each ingest tick reads it in ONE pass
# with zero corpus-side shuffle, and only the bounded dropped-id set
# shuffles.
#
# The similarity metric is the QUANTIZED cosine
# (operators/quantize.quantized_cosine — int8 codes, scales cancel):
# the ledger stores dim bytes per vector instead of 8*dim, and the
# verification arithmetic is integer-exact cross-engine, so the whole
# incremental decision is SQL-mirrorable (the minhash ledger's
# determinism discipline, without minhash's luck of fixture-exact LSH
# recall: here candidate recall at ingest-grade thresholds is
# 1 - ~1e-14 per true pair at the defaults, documented not hidden).


def embedding_ledger_table(
    vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    bits: int = 8,
    tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """The SEMANTIC near-dup ledger row per document: ``id_col`` +
    ``bkts`` (array<bigint>, the per-table sign-LSH bucket encoded
    ``(table << 32) | bucket`` so cross-table values can never
    collide) + ``qvec`` (array<tinyint>, int8 codes — see
    operators/quantize).

    Rows with NULL, wrong-dimension, or all-zero vectors are skipped
    (they cannot near-dup anything under the quantized cosine, whose
    zero-code similarity is defined 0) — like minhash's empty
    documents, such rows pass through every ingest; pin them with
    exact_dedup_incremental upstream.  Map-side only except the Arrow
    bucket matmul; the ledger build/probe parameter coupling caveat of
    :func:`minhash_ledger_table` applies identically (store
    dim/bits/tables/seed next to the ledger).
    """
    from sparkall_spark.operators.quantize import quantize_embeddings
    from sparkall_spark.operators.similarity import bucket_ids

    v = vecs.filter(
        F.col(vec_col).isNotNull() & (F.size(vec_col) == dim)
    ).select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    )
    q = quantize_embeddings(v, "__v", "qvec", "__s").filter(F.col("__s") > 0)
    enc = F.transform(
        bucket_ids(F.col("__v"), dim, bits, tables, seed),
        lambda b, i: F.shiftleft(i.cast("bigint"), 32) + b,
    )
    return q.select(F.col(id_col), enc.alias("bkts"), F.col("qvec"))


def _emb_verified_hits(
    probe: DataFrame,
    ledger_side: DataFrame,
    threshold: float,
) -> DataFrame:
    """(``__bid`` rows of ``probe``) that verify against ``ledger_side``
    at quantized cosine >= threshold.  ``probe`` must be broadcast-
    sized: it is exploded on encoded buckets and broadcast; the ledger
    side streams.  Each (ledger row, probe doc) pair meets EXACTLY
    once — on the smallest shared encoded bucket — so verification
    work is bounded by true candidate count, not candidate*tables."""
    from sparkall_spark.operators.quantize import quantized_cosine

    bprobe = probe.select(
        "__bid", "__bb", "__bq", F.explode("__bb").alias("__k")
    )
    led = ledger_side.select(
        F.col("bkts").alias("__lb"),
        F.col("qvec").alias("__lq"),
        F.explode("bkts").alias("__k"),
    )
    return (
        led.join(F.broadcast(bprobe), "__k")
        .filter(
            F.col("__k")
            == F.array_min(F.array_intersect(F.col("__lb"), F.col("__bb")))
        )
        .filter(
            quantized_cosine(F.col("__lq"), F.col("__bq"))
            >= F.lit(threshold)
        )
        .select("__bid")
        .distinct()
    )


def embedding_dedup_incremental(
    new_vecs: DataFrame,
    ledger: DataFrame | None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
    dim: int = 64,
    bits: int = 8,
    tables: int = 8,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """Semantic-dedup an incoming batch against an already-ingested
    corpus — :func:`minhash_dedup_incremental`'s contract under the
    quantized-cosine metric.  Returns ``(kept, ledger_delta)``; a
    batch document is dropped when

    1. it verifies at quantized cosine >= threshold against any ledger
       row (candidates from shared sign-LSH buckets, verified on int8
       codes — per-true-pair miss odds (1-(1-theta/pi)^bits)^tables,
       ~1e-14 at the defaults for ingest-grade thresholds), or
    2. a smaller-id corpus-surviving batch document verifies against
       it (the non-recursive dominated rule — kept set is a pure
       function of batch + ledger, SQL-mirrorable without recursion).

    Idempotent for ledgered rows (replay verifies at qcos 1.0 against
    its own ledger row); rows that carry no ledger row (null /
    wrong-dim / zero vectors) pass through every time — see
    :func:`embedding_ledger_table`.  Scale shape: ledger read once,
    zero corpus-side shuffle (batch sigs broadcast), only dropped ids
    and the batch-scale pair step shuffle; the batch must be
    broadcastable (dim+8 bytes per doc), the same sizing contract as
    the minhash ingest.
    """
    sigs = _persist(
        embedding_ledger_table(
            new_vecs, id_col, vec_col, dim, bits, tables, seed
        )
    )
    probe = sigs.select(
        F.col(id_col).alias("__bid"),
        F.col("bkts").alias("__bb"),
        F.col("qvec").alias("__bq"),
    )
    survivors = new_vecs
    if ledger is not None:
        dropped = _persist(
            _emb_verified_hits(probe, ledger, threshold).select(
                F.col("__bid").alias(id_col)
            )
        )
        survivors = survivors.join(dropped, id_col, "left_anti")
    # within-batch dominated rule over the corpus survivors: pairs from
    # shared buckets (meet exactly once via the min-shared-bucket
    # filter), id_a < id_b, verified on codes
    from sparkall_spark.operators.quantize import quantized_cosine

    # persisted (r12): ssig feeds BOTH sides of the pair join (the
    # probe rows and the broadcast build) plus, through `kept`, the
    # delta projection — unpersisted, each reference re-ran the
    # semi-join and the batch union upstream.  Batch-bounded by the
    # same broadcastability contract as the minhash ingest.
    ssig = _persist(
        sigs.join(survivors.select(id_col), id_col, "left_semi")
    )
    a = ssig.select(
        F.col(id_col).alias("__ia"),
        F.col("bkts").alias("__ba"),
        F.col("qvec").alias("__qa"),
        F.explode("bkts").alias("__k"),
    )
    b = ssig.select(
        F.col(id_col).alias("__ib"),
        F.col("bkts").alias("__bbk"),
        F.col("qvec").alias("__qb"),
        F.explode("bkts").alias("__k"),
    )
    dominated = (
        a.join(F.broadcast(b), "__k")
        .filter(F.col("__ia") < F.col("__ib"))
        .filter(
            F.col("__k")
            == F.array_min(F.array_intersect(F.col("__ba"), F.col("__bbk")))
        )
        .filter(
            quantized_cosine(F.col("__qa"), F.col("__qb"))
            >= F.lit(threshold)
        )
        .select(F.col("__ib").alias(id_col))
        .distinct()
    )
    kept = survivors.join(dominated, id_col, "left_anti")
    delta = sigs.join(kept.select(id_col), id_col, "left_semi")
    return kept, delta
