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

from pyspark.sql import DataFrame, functions as F

from sparkall_spark.functions.text import tokens


def build_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Positional postings: one row per (token, doc) with the sorted
    0-based ``positions`` array and ``tf`` (= size(positions)).

    Output: ``token, doc_id, positions: array<int>, tf: bigint``.
    Empty/NULL documents contribute no rows.
    """
    txt = F.col(text_col)
    if lowercase:
        txt = F.lower(txt)
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(txt)).alias("pos", "token"),
    )
    return tok.groupBy("token", "doc_id").agg(
        F.array_sort(F.collect_list("pos")).alias("positions"),
        F.count(F.lit(1)).cast("bigint").alias("tf"),
    )


def phrase_search(
    postings: DataFrame,
    phrase: str,
    lowercase: bool = True,
) -> DataFrame:
    """Documents containing the exact token ``phrase``, with every
    0-based start position.

    Output: ``doc_id, match_positions: array<int>, n_matches: bigint``.
    Positional AND-merge: token i of the phrase must occur at
    ``start + i`` — implemented by shifting each token's positions
    back by i and intersecting, so a k-token phrase is k-1 equi-joins
    on doc_id over only the candidate documents.  A single-token
    phrase is a plain lookup.  Raises on an empty phrase.
    """
    terms = [t for t in (phrase.lower() if lowercase else phrase).split() if t]
    if not terms:
        raise ValueError("phrase must contain at least one token")
    out = (
        postings.filter(F.col("token") == terms[0])
        .select("doc_id", F.col("positions").alias("__starts"))
    )
    def _shift_by(i: int):
        # a UNARY lambda on purpose: pyspark's ``transform`` dispatches
        # on lambda arity, so a default-arg second parameter would be
        # silently bound to the ARRAY INDEX instead of the default
        return lambda p: p - F.lit(i)

    for i, term in enumerate(terms[1:], start=1):
        nxt = postings.filter(F.col("token") == term).select(
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


def phrase_decontaminate(
    docs: DataFrame,
    phrases: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "annotate",
) -> DataFrame:
    """Exact-phrase decontamination over a (small) phrase list — the
    "drop every doc containing this eval item verbatim" form: builds
    the postings once, unions the per-phrase hit sets, and annotates
    (``n_phrase_hits``, ``contaminated``) or drops (``clean``).

    For recurring audits, persist :func:`build_postings` output
    (partitioned by token) instead of rebuilding per call.
    """
    if mode not in ("annotate", "clean"):
        raise ValueError(f"mode must be 'annotate' or 'clean', got {mode!r}")
    if not phrases:
        raise ValueError("phrases must be non-empty")
    post = build_postings(docs, id_col=id_col, text_col=text_col)
    hits = None
    for p in phrases:
        h = phrase_search(post, p).select("doc_id", "n_matches")
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

    Scale shape: only the QUERY tokens' postings rows participate
    (partition-pruned on a token-partitioned index); df per token is a
    tiny aggregate of those same rows; doc lengths come from one
    reusable groupBy over the postings (persist it alongside a saved
    index).  The final score is one map-side-combined per-doc sum.
    """
    terms = sorted(
        {t for t in (query.lower() if lowercase else query).split() if t}
    )
    if not terms:
        raise ValueError("query must contain at least one token")
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
    qp = postings.filter(F.col("token").isin(terms)).select(
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
