"""Deterministic sampling, splitting, and sequence packing for
training-data pipelines (extension; no reference analog).

Everything here is a pure Column-expression transformation with three
properties the 100 TB data-prep flow needs:

- **Deterministic**: membership depends only on (id, seed), never on
  partitioning, task order, or Spark's RNG — reruns, retries, and
  backfills assign every row identically, and train/test splits stay
  stable as the corpus grows (a new document never moves an old one).
- **Engine-portable**: the hash is explicit modular arithmetic (two
  LCG rounds mod the Mersenne prime 2^31-1, same idiom as
  ``functions.text.fingerprint``), so any ANSI-SQL engine reproduces
  the exact assignment — bit-for-bit DuckDB oracles in tests, and
  downstream systems can recompute splits without Spark.
- **Shuffle-shaped for scale**: splits and fraction samples are
  map-only (no shuffle at all); stratified sampling shuffles once on
  the stratum key; sequence packing windows over bounded shards, never
  one global ordering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_M = 2_147_483_647  # 2^31 - 1, prime
_A1, _B1 = 1_103_515_245, 12_345
_A2 = 48_271

#: bucket resolution for weight -> threshold conversion
N_BUCKETS = 1_000_000


def _mix(c: Column, seed: int) -> Column:
    """Two LCG rounds mod 2^31-1 over a bigint id.  All intermediates
    stay < 2^63 ((M-1)*A1 ~ 2.4e18), so the same expression evaluates
    identically on any engine with 64-bit integer arithmetic."""
    h = (F.abs(c.cast("bigint")) + F.lit(seed)) % _M
    h = (h * _A1 + _B1) % _M
    return (h * _A2) % _M


def mix_sql(col_sql: str, seed: int) -> str:
    """ANSI-SQL rendering of :func:`_mix` — the oracle/portability
    contract.  Must stay textually in lockstep with ``_mix``."""
    return (
        f"((((abs(CAST({col_sql} AS BIGINT)) + {seed}) % {_M})"
        f" * {_A1} + {_B1}) % {_M} * {_A2}) % {_M}"
    )


def split_bucket(id_col: Column | str, seed: int = 0) -> Column:
    """Deterministic bucket in [0, N_BUCKETS) for a numeric id."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return _mix(c, seed) % N_BUCKETS


def split_bucket_sql(col_sql: str, seed: int = 0) -> str:
    return f"({mix_sql(col_sql, seed)}) % {N_BUCKETS}"


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    seed: int = 0,
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split (train/val/test/...) by
    deterministic id hash.

    ``weights`` maps split name -> fraction; fractions must sum to 1
    (±1e-9).  Assignment is a map-side expression — no shuffle, no
    sampling pass, and the split column is reproducible anywhere via
    :func:`hash_split_sql`.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    if not weights:
        raise ValueError("at least one split required")
    bucket = split_bucket(id_col, seed)
    expr: Column | None = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        threshold = int(round(acc * N_BUCKETS))
        branch = F.lit(name)
        if expr is None:
            expr = F.when(bucket < threshold, branch)
        else:
            expr = expr.when(bucket < threshold, branch)
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, out)


def hash_split_sql(
    col_sql: str, weights: dict[str, float], seed: int = 0
) -> str:
    """CASE-WHEN rendering of :func:`hash_split` for SQL oracles."""
    bucket = split_bucket_sql(col_sql, seed)
    parts = ["CASE"]
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        threshold = int(round(acc * N_BUCKETS))
        parts.append(f"WHEN ({bucket}) < {threshold} THEN '{name}'")
    parts.append(f"ELSE '{names[-1]}' END")
    return " ".join(parts)


def leakage_free_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    pairs: DataFrame | None = None,
    rep_col: str | None = None,
    seed: int = 0,
    out_col: str = "split",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Cluster-aware train/val/test split: near-duplicate documents
    never straddle a split boundary.

    A plain per-document :func:`hash_split` leaks at evaluation time —
    two near-identical documents land in train and test with
    probability ``2*p_train*p_test`` per pair, so the model is graded
    on (para)phrases of its own training data.  The fix is to hash the
    *cluster representative* instead of the document id: every member
    of a near-dup component co-travels into one split, and singletons
    (the overwhelming majority) behave exactly like ``hash_split`` on
    their own id (their representative IS their id).

    Provide EITHER ``pairs`` (a near-dup pair frame — minhash, simhash,
    embedding-cosine, or perceptual-image pairs all fit), in which case
    transitive components are computed via
    :func:`~sparkall_spark.operators.graph.dedup_clusters`, OR
    ``rep_col`` naming an existing representative column (e.g. the
    ``cluster_rep`` that ``minhash_dedup_clusters`` already attached),
    in which case the split is one map-only expression.

    Scale shape: the pairs path costs the component iteration (one
    shuffle per round over |E|, diameter-bounded) plus one join of
    ``df`` against the node->component map; the rep_col path is
    shuffle-free.  The assignment itself is the same deterministic
    (rep, seed) hash arithmetic as :func:`hash_split` — engine-portable
    via :func:`hash_split_sql` over the representative, stable under
    reruns, and a NEW document can only ever pull its own cluster's
    assignment, never move an existing singleton.

    Determinism caveat (documented, not incidental): the component
    representative is the MINIMUM member id, so ingesting a new
    document with a smaller id than its cluster's current rep re-keys
    that cluster's hash — near-dup clusters are identity groups, and
    any stable group key must move when the group's membership map
    does.  Singletons (no pair edges) are immune.
    """
    if (pairs is None) == (rep_col is None):
        raise ValueError("provide exactly one of pairs= or rep_col=")
    if rep_col is None:
        from sparkall_spark.operators.graph import dedup_clusters

        df = dedup_clusters(df, pairs, id_col=id_col, src=src, dst=dst)
        rep_col = "cluster_rep"
    return hash_split(df, rep_col, weights, seed=seed, out_col=out_col)


def fraction_sample(
    df: DataFrame, id_col: str, fraction: float, seed: int = 0
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows by id hash.  Unlike
    ``DataFrame.sample`` this is stable across reruns/retries and
    composable (disjoint seeds -> independent samples); map-only."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    threshold = int(round(fraction * N_BUCKETS))
    return df.filter(split_bucket(id_col, seed) < threshold)


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    k: int,
    id_col: str,
    seed: int = 0,
    order_col: str | None = None,
    descending: bool = True,
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum.  Default pick is
    deterministic hash order (ties broken by id — total order, so the
    pick is unique); ``order_col`` picks the top-k BY THAT COLUMN
    instead (``descending=True`` keeps the largest — e.g. the k
    highest-``quality`` documents per domain, the crawl-curation
    per-domain cap), id still breaking ties.  ONE shuffle on the
    stratum key; per-stratum state is a running top-k, never a sort of
    the whole corpus (Spark inserts a WindowGroupLimit partial top-k
    BEFORE the exchange, so a hot stratum ships at most
    k x map-partitions rows, not its full population).

    At 100 TB: a hot stratum concentrates on one task only up to the
    window's partition; for pathological single-stratum corpora,
    pre-split the stratum (e.g. salt, take k per salt, re-take k).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if order_col is not None:
        # NULLS LAST both ways (Spark asc defaults to NULLS FIRST,
        # DuckDB to NULLS LAST): a NULL-ordered row must never outrank
        # a real value, and mirrors must agree
        first = (
            F.col(order_col).desc_nulls_last()
            if descending
            else F.col(order_col).asc_nulls_last()
        )
        order = [first, F.col(id_col).asc()]
    else:
        order = [_mix(F.col(id_col), seed).asc(), F.col(id_col).asc()]
    w = Window.partitionBy(stratum_col).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    ctx_len: int,
    n_shards: int,
    seed: int = 0,
) -> DataFrame:
    """GPT-style sequence packing: concatenate documents in a
    deterministic pseudo-random order and cut the stream into
    ``ctx_len``-token training sequences.

    Returns the input plus ``shard`` (which independent stream the doc
    belongs to), ``start_offset`` (the doc's first token's position in
    its shard's stream) and ``seq_id`` (the training sequence its first
    token lands in — documents straddle boundaries, standard
    concat-then-chunk packing).

    Scale design: one window per SHARD (id-hash mod ``n_shards``),
    never a global ordering — each shard's cumulative sum is an
    independent task, so pick n_shards so a shard's rows fit a task
    (e.g. corpus_docs / 10M).  Deterministic: order is (mixed hash,
    id), so reruns pack identically.
    """
    if ctx_len <= 0 or n_shards <= 0:
        raise ValueError("ctx_len and n_shards must be positive")
    mixed = _mix(F.col(id_col), seed)
    shard = mixed % n_shards
    w = (
        Window.partitionBy("shard")
        .orderBy(mixed.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.withColumn("shard", shard).withColumn(
        "start_offset",
        (F.sum(F.col(n_tokens_col)).over(w) - F.col(n_tokens_col)).cast(
            "bigint"
        ),
    )
    return out.withColumn(
        "seq_id", F.floor(F.col("start_offset") / ctx_len).cast("bigint")
    )


def mix_corpus(
    df: DataFrame,
    source_col: str,
    n_tokens_col: str,
    weights: dict[str, float],
    token_budget: int,
    id_col: str,
    seed: int = 0,
) -> DataFrame:
    """Deterministic corpus mixing: sample each source down so the
    result approximates ``token_budget`` tokens split by ``weights``
    (the pretraining mixture-weights step).

    Per source s: keep fraction ``min(1, budget*w_s / tokens_s)`` via
    the stable id-hash (so reruns keep identical rows).  Sources not in
    ``weights`` are dropped.  The only driver-side data is the
    per-source token totals (one aggregate, bounded by #sources);
    membership itself is a map-only expression.  Under-filled sources
    (fewer tokens than their share) are NOT rebalanced onto others —
    deterministic membership is the contract; renormalize weights and
    rerun to redistribute.
    """
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    shares = {s: w / total for s, w in weights.items()}
    stats = {
        r["s"]: r["toks"]
        for r in df.groupBy(F.col(source_col).alias("s"))
        .agg(F.sum(n_tokens_col).alias("toks"))
        .collect()  # bounded by #sources — metadata, not data
    }
    fractions = {
        s: min(1.0, token_budget * share / stats[s])
        for s, share in shares.items()
        if s in stats and stats[s] > 0
    }
    if not fractions:
        raise ValueError("no overlap between weights and sources")
    bucket = split_bucket(id_col, seed)
    frac_col = None
    for s, frac in fractions.items():
        threshold = int(round(frac * N_BUCKETS))
        branch = F.when(F.col(source_col) == s, F.lit(threshold))
        frac_col = branch if frac_col is None else frac_col.when(
            F.col(source_col) == s, F.lit(threshold)
        )
    return df.filter(bucket < frac_col.otherwise(F.lit(0)))


def temperature_weights(
    source_tokens: dict[str, int], alpha: float
) -> dict[str, float]:
    """Temperature-scaled mixture weights from per-source token counts:
    ``w_s ∝ tokens_s ** alpha``, normalized to sum 1 — the alpha-
    sampling rule of the multilingual-pretraining literature (mT5 /
    XLM-R style).  ``alpha=1`` reproduces the natural distribution;
    ``alpha -> 0`` approaches uniform-over-sources (up-weighting small
    sources); values in between trade coverage against duplication of
    the small sources.

    Pure driver-side arithmetic over the per-source totals (metadata,
    bounded by the number of sources) — feed the result straight into
    :func:`mix_corpus`.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    pos = {s: t for s, t in source_tokens.items() if t > 0}
    if not pos:
        raise ValueError("no source has a positive token count")
    raw = {s: float(t) ** alpha for s, t in pos.items()}
    z = sum(raw.values())
    return {s: v / z for s, v in raw.items()}


def temperature_mix(
    df: DataFrame,
    source_col: str,
    n_tokens_col: str,
    alpha: float,
    token_budget: int,
    id_col: str,
    seed: int = 0,
) -> DataFrame:
    """:func:`mix_corpus` with the mixture weights DERIVED from the
    corpus itself by temperature scaling (``tokens_s ** alpha``) —
    one extra per-source aggregate (metadata-scale), then the same
    deterministic id-hash membership: reruns keep identical rows, and
    under-filled sources are not rebalanced (same contract as
    ``mix_corpus``).
    """
    stats = {
        r["s"]: r["toks"]
        for r in df.groupBy(F.col(source_col).alias("s"))
        .agg(F.sum(n_tokens_col).alias("toks"))
        .collect()  # bounded by #sources
    }
    weights = temperature_weights(
        {s: int(t) for s, t in stats.items() if t is not None}, alpha
    )
    return mix_corpus(
        df, source_col, n_tokens_col, weights, token_budget, id_col, seed
    )


#: output schema of pack_bins_bfd
_BFD_SCHEMA = (
    "id bigint, shard int, bin_id bigint, start_offset bigint, "
    "oversize boolean"
)


def pack_bins_bfd(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    ctx_len: int,
    n_shards: int = 64,
    seed: int = 0,
) -> DataFrame:
    """Boundary-respecting sequence packing: best-fit-decreasing bin
    packing per shard — documents NEVER straddle training sequences
    (the alternative to :func:`pack_sequences`' concat-then-chunk,
    for recipes where cross-document attention is masked out and
    straddled fragments are wasted).

    Each shard (deterministic id-hash, the pack_sequences sharding)
    sorts its documents by (tokens desc, id) and places each into the
    fullest bin that still fits, else opens a new bin — the classic
    BFD heuristic (never worse than 11/9·OPT + 2/3 bins, Dósa's tight
    bound), which empirically wastes far less padding than sequential
    next-fit (asserted in tests).  Documents longer than ``ctx_len``
    get a DEDICATED bin flagged ``oversize`` (truncation policy belongs
    to the trainer, not the packer).

    Returns (id, shard, bin_id, start_offset, oversize) — ``bin_id``
    numbers bins per shard in creation order, ``start_offset`` is the
    document's first token within its bin.  Bin packing is inherently
    sequential, so the per-shard loop is the legitimate
    ``applyInPandas`` escape hatch: ONE shuffle on shard, per-task work
    bounded by shard size (pick ``n_shards`` ~ corpus_docs / 1e6), and
    the placement is a pure function of the shard's (tokens, id) set —
    layout-independent and rerun-stable.
    """
    import bisect

    import pandas as pd

    if ctx_len <= 0 or n_shards <= 0:
        raise ValueError("ctx_len and n_shards must be positive")

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["__n", "__id"], ascending=[False, True], kind="mergesort"
        )
        shard = int(pdf["__shard"].iloc[0])
        rems: list[int] = []  # sorted remaining capacities
        rem_bin: list[int] = []  # bin id aligned with rems
        fills: dict[int, int] = {}  # bin id -> used tokens
        next_bin = 0
        out = []
        for _id, n in zip(pdf["__id"], pdf["__n"]):
            n = int(n)
            if n > ctx_len:
                out.append((int(_id), shard, next_bin, 0, True))
                next_bin += 1  # dedicated, never reused
                continue
            # best fit: the smallest remaining capacity >= n
            i = bisect.bisect_left(rems, n)
            if i < len(rems):
                b = rem_bin.pop(i)
                r = rems.pop(i)
            else:
                b, r = next_bin, ctx_len
                fills[b] = 0
                next_bin += 1
            out.append((int(_id), shard, b, fills[b], False))
            fills[b] += n
            r -= n
            j = bisect.bisect_left(rems, r)
            rems.insert(j, r)
            rem_bin.insert(j, b)
        return pd.DataFrame(
            out, columns=["id", "shard", "bin_id", "start_offset", "oversize"]
        )

    mixed = _mix(F.col(id_col), seed)
    base = df.select(
        F.col(id_col).cast("bigint").alias("__id"),
        F.col(n_tokens_col).cast("bigint").alias("__n"),
        (mixed % n_shards).cast("int").alias("__shard"),
    ).filter(F.col("__n").isNotNull() & (F.col("__n") > 0))
    return base.groupBy("__shard").applyInPandas(_pack, schema=_BFD_SCHEMA)
