"""Composed training-data pipeline: the operators of this package wired
into the standard pretraining data-prep flow.

    raw documents
      -> [optional] URL-level dedup (canonical-URL key — recrawls and
         tracking-decorated links collapse before any text is read)
      -> [optional] intra-document paragraph dedup (templated blocks
         repeated within one page)
      -> [optional] boilerplate line removal (cross-doc chrome first,
         CCNet order — it inflates every later signal)
      -> quality scoring (length / diversity / punctuation)
      -> language identification (stopword heuristic)
      -> exact dedup (normalized fingerprint, keep min id)
      -> [optional] near-dedup (MinHash-LSH)
      -> [optional] LM perplexity filter (CCNet-style unigram LM
         trained on a trusted reference corpus)
      -> [optional] NB quality-classifier gate (supervised complement
         of the LM cut, trained on labeled good/bad examples)
      -> [optional] benchmark decontamination (n-gram overlap removal)
      -> [optional] PII redaction (email/phone/IPv4 masking)
      -> partitioned/bucketed write

Every stage is a lazy DataFrame transformation, so the whole pipeline
is ONE Spark plan until the final write — at 100 TB that means one pass
over the corpus for score+langid+fingerprint (all whole-stage-codegen
expressions), one shuffle for the dedup window, and one optional LSH
phase, instead of N materialized intermediate datasets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from sparkall_spark.functions import text as X


def corpus_overlap_gate(
    a: DataFrame,
    b: DataFrame,
    text_col: str = "text",
    b_text_col: str | None = None,
    k: int = 256,
    min_jaccard: float = 0.0,
    min_intersection: float = 0.0,
) -> dict:
    """Decide whether a cross-corpus near-dup / decontamination pass is
    worth SCHEDULING, from two bounded KMV sketches instead of the pass
    itself: sketch both sides' token vocabularies
    (operators/sketches.py), estimate their overlap (Beyer et al.
    SIGMOD'07 §4), and compare against the thresholds.

    Returns ``{"run": bool, "jaccard_est": float, "est_intersection":
    float, "est_union": float}`` — ``run`` is True iff BOTH estimates
    clear their thresholds.  The soundness direction is the useful one:
    a document pair can only reach jaccard >= t if its tokens are
    shared, so a corpus-level vocabulary overlap estimate near zero
    means the expensive pass cannot find anything.  This is a PLANNING
    decision from a k-row estimate (relative error ~1/sqrt(k-2)), so
    it is opt-in where wired (``prepare_documents``'s
    ``decontam_fuzzy_gate_min_jaccard``) and thresholds should sit
    well below the interesting signal, not at it.

    Cost: two sketch jobs (shuffle O(distinct tokens), k rows out) and
    one driver action on a single row — at 100 TB that replaces a
    signature pass over the corpus whenever the answer is "nothing to
    find".
    """
    from sparkall_spark.operators.sketches import (
        kmv_overlap_estimate,
        kmv_sketch,
    )

    def _words(df: DataFrame, col: str) -> DataFrame:
        return df.select(
            F.explode(
                F.filter(F.split(F.lower(F.col(col)), r"\s+"), lambda t: t != "")
            ).alias("__w")
        )

    sa = kmv_sketch(_words(a, text_col), "__w", k=k)
    sb = kmv_sketch(_words(b, b_text_col or text_col), "__w", k=k)
    row = kmv_overlap_estimate(sa, sb, k=k).first()
    jac = float(row["jaccard_est"] or 0.0) if row is not None else 0.0
    inter = float(row["est_intersection"] or 0.0) if row is not None else 0.0
    union = float(row["est_union"] or 0.0) if row is not None else 0.0
    return {
        "run": jac >= min_jaccard and inter >= min_intersection,
        "jaccard_est": jac,
        "est_intersection": inter,
        "est_union": union,
    }


def prepare_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    keep_langs: tuple[str, ...] | None = None,
    near_dedup: bool = False,
    near_dedup_threshold: float = 0.9,
    max_dup_line_ratio: float | None = None,
    max_dup_ngram_ratio: float | None = None,
    redact_pii: bool = False,
    decontam_bench: DataFrame | None = None,
    decontam_n: int = 8,
    decontam_min_hits: int = 1,
    decontam_text_col: str | None = None,
    decontam_prefilter: str = "none",
    boilerplate_min_docs: int | None = None,
    lm_ref: DataFrame | None = None,
    lm_max_perplexity: float = 1e4,
    lm_text_col: str | None = None,
    decontam_fuzzy: bool = False,
    decontam_fuzzy_threshold: float = 0.8,
    decontam_fuzzy_gate_min_jaccard: float | None = None,
    classifier_labeled: DataFrame | None = None,
    classifier_label_col: str = "label",
    classifier_min_prob: float = 0.5,
    classifier_ngram: int = 1,
    classifier_kind: str = "nb",
    classifier_lr_buckets: int = 4096,
    classifier_lr_iters: int = 3,
    url_dedup_col: str | None = None,
    paragraph_dedup: bool = False,
    min_compression_ratio: float | None = None,
    domain_cap_col: str | None = None,
    domain_token_budget: int = 10_000_000,
    max_bullet_ratio: float | None = None,
    max_ellipsis_ratio: float | None = None,
    min_alpha_word_ratio: float | None = None,
    max_symbol_word_ratio: float | None = None,
    gopher_quality: bool = False,
    c4_rules: bool = False,
    split_weights: dict[str, float] | None = None,
    split_seed: int = 0,
    curriculum_bins: int | None = None,
) -> DataFrame:
    """Quality-filter, language-tag, and dedup a document corpus.

    Returns the surviving rows with ``quality`` and ``lang_pred``
    columns added.  Deterministic: the survivor of each duplicate group
    is the minimum id.  The ``max_dup_*`` knobs add Gopher-style
    within-document repetition filters (duplicate line / word-bigram
    fractions) — still Column expressions in the same single pass.

    ``gopher_quality=True`` applies the published Gopher Table A1
    quality thresholds wholesale (functions.text.gopher_quality_keep);
    ``c4_rules=True`` rewrites each document through C4's line rules
    and drops docs failing the C4 document rules (c4_clean_lines /
    c4_keep — the keep predicate is evaluated on the ORIGINAL text,
    then the text column is replaced by the cleaned form, matching the
    paper's order).  Both are map-side Column work in the same pass.

    Closing stages (r9): ``split_weights`` assigns the deterministic
    train/val/test column LAST — after ``near_dedup=True`` a plain
    id-hash split IS leakage-free at the dedup threshold (every
    near-dup group already collapsed to one survivor; use
    ``sampling.leakage_free_split`` directly for corpora that must
    keep near-dup members).  ``curriculum_bins`` attaches the
    ``curriculum_bin`` difficulty bin from the pipeline's own
    ``quality`` score (easy = high quality first; see
    ``ordering.curriculum_order`` for the ordered-write form).
    """
    if url_dedup_col is not None:
        # FIRST and cheapest: recrawls + tracking-decorated links
        # collapse on the canonical-URL key before any text is touched
        from sparkall_spark.operators.dedup import url_dedup

        docs = url_dedup(docs, id_col=id_col, url_col=url_dedup_col)
    if paragraph_dedup:
        # intra-document repeated paragraphs (templated nav/disclaimer
        # blocks) go before scoring for the same reason as boilerplate
        docs = docs.withColumn(text_col, X.dedup_paragraphs(text_col))
    if boilerplate_min_docs is not None:
        # FIRST: cross-document chrome inflates every later signal
        # (quality ratios, dup-line ratios, dedup fingerprints) — CCNet
        # order.  Runs its own gate jobs (documented in the operator).
        from sparkall_spark.operators.boilerplate import (
            remove_boilerplate_lines,
        )

        docs = remove_boilerplate_lines(
            docs, id_col=id_col, text_col=text_col,
            min_docs=boilerplate_min_docs,
        )
    if c4_rules:
        # C4 order: the doc-level rules see the original text; the
        # surviving docs carry the line-cleaned rewrite forward
        docs = docs.filter(X.c4_keep(text_col)).withColumn(
            text_col, X.c4_clean_lines(text_col)
        )
    scored = docs.withColumn("quality", X.quality_score(text_col)).withColumn(
        "lang_pred", X.lang_id(text_col)
    )
    filtered = scored.filter(F.col("quality") >= min_quality)
    if gopher_quality:
        filtered = filtered.filter(X.gopher_quality_keep(text_col))
    if min_compression_ratio is not None:
        # Gopher-style repetitiveness gate: templated/looping text
        # compresses far below prose (functions/text.compression_ratio
        # — the package's one deliberate Arrow-batched Python text fn)
        filtered = filtered.filter(
            X.compression_ratio(text_col) >= min_compression_ratio
        )
    if max_dup_line_ratio is not None:
        filtered = filtered.filter(
            X.duplicate_line_ratio(text_col) <= max_dup_line_ratio
        )
    if max_dup_ngram_ratio is not None:
        filtered = filtered.filter(
            X.duplicate_ngram_ratio(text_col, 2) <= max_dup_ngram_ratio
        )
    # the remaining Gopher rule gates (r5) — all pure Column exprs in
    # the same map-side pass as the ratio filters above
    if max_bullet_ratio is not None:
        filtered = filtered.filter(
            X.bullet_line_ratio(text_col) <= max_bullet_ratio
        )
    if max_ellipsis_ratio is not None:
        filtered = filtered.filter(
            X.ellipsis_line_ratio(text_col) <= max_ellipsis_ratio
        )
    if min_alpha_word_ratio is not None:
        filtered = filtered.filter(
            X.alpha_word_ratio(text_col) >= min_alpha_word_ratio
        )
    if max_symbol_word_ratio is not None:
        filtered = filtered.filter(
            X.symbol_word_ratio(text_col) <= max_symbol_word_ratio
        )
    if keep_langs is not None:
        filtered = filtered.filter(F.col("lang_pred").isin(*keep_langs))

    # exact dedup on the normalized-text fingerprint: shuffle 8-byte
    # keys, keep the minimum id per group
    w = Window.partitionBy(X.fingerprint(text_col)).orderBy(F.col(id_col).asc())
    deduped = (
        filtered.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    if near_dedup:
        from sparkall_spark.operators.dedup import minhash_dedup

        deduped = minhash_dedup(
            deduped, id_col=id_col, text_col=text_col,
            threshold=near_dedup_threshold,
        )
    if lm_ref is not None:
        # CCNet-style LM quality filter AFTER dedup (scoring duplicate
        # copies is wasted work) — train a smoothed unigram LM on the
        # trusted reference corpus, drop documents whose perplexity
        # under it exceeds the cap.  Training runs one metadata-scale
        # totals job; scoring adds one doc-keyed shuffle.
        from sparkall_spark.operators.lm import (
            lm_quality_filter,
            train_unigram_lm,
        )

        model, unk = train_unigram_lm(
            lm_ref, text_col=lm_text_col or text_col
        )
        deduped = lm_quality_filter(
            deduped, model, unk, lm_max_perplexity,
            id_col=id_col, text_col=text_col,
        )
    if classifier_labeled is not None:
        # model-based quality gate AFTER dedup (scoring duplicates is
        # wasted work), alongside the LM filter — the supervised
        # complement of the unsupervised perplexity cut (GPT-3-style
        # "looks like the reference corpus" gating).  Two kinds:
        # "nb" trains in two count aggregations with an exact integer
        # log-odds gate (operators/classifier.py); "lr" trains the
        # logistic-regression classifier (operators/logreg.py — one
        # aggregation per iteration, shuffle-order-invariant weights)
        # and gates on the integer margin >= ln(p/(1-p)) micros, the
        # same threshold-as-integer discipline.
        if classifier_kind == "nb":
            from sparkall_spark.operators.classifier import (
                nb_quality_filter,
                train_nb_classifier,
            )

            model, unk, prior = train_nb_classifier(
                classifier_labeled,
                classifier_label_col,
                text_col=text_col,
                ngram=classifier_ngram,
            )
            deduped = nb_quality_filter(
                deduped, model, unk, prior,
                min_prob=classifier_min_prob,
                id_col=id_col, text_col=text_col, ngram=classifier_ngram,
            )
        elif classifier_kind == "lr":
            import math as _math

            from sparkall_spark.operators.logreg import (
                logreg_score,
                train_logreg,
            )

            if classifier_ngram != 1:
                raise ValueError(
                    "classifier_kind='lr' hashes unigram tokens; "
                    "classifier_ngram must be 1"
                )
            wts, bias = train_logreg(
                classifier_labeled, classifier_label_col,
                id_col=id_col, text_col=text_col,
                n_buckets=classifier_lr_buckets,
                iters=classifier_lr_iters,
            )
            p = min(max(classifier_min_prob, 1e-9), 1 - 1e-9)
            cut = int(round(_math.log(p / (1.0 - p)) * 1_000_000))
            passing = logreg_score(
                deduped, wts, bias, id_col=id_col, text_col=text_col
            ).filter(F.col("margin_micro") >= cut)
            deduped = deduped.join(
                passing.select(F.col(id_col)), id_col, "left_semi"
            )
        else:
            raise ValueError(
                f"classifier_kind must be 'nb' or 'lr', got "
                f"{classifier_kind!r}"
            )
    if decontam_bench is not None:
        # benchmark decontamination AFTER dedup (contamination is a
        # property of the text, so removing dup copies first shrinks the
        # gram expansion) and BEFORE PII masking: eval overlap must be
        # judged on the original text, not the redacted rewrite
        from sparkall_spark.operators.decontam import ngram_decontaminate

        deduped = ngram_decontaminate(
            deduped,
            decontam_bench,
            id_col=id_col,
            text_col=text_col,
            bench_text_col=decontam_text_col,
            n=decontam_n,
            min_hits=decontam_min_hits,
            mode="clean",
            prefilter=decontam_prefilter,
            # bloom prefilter keeps results EXACT (false positives die
            # in the confirm join) while the bench gram set ships as a
            # fixed-size bitmap — the path for eval suites too large to
            # broadcast raw
            broadcast_bench=(decontam_prefilter != "bloom"),
        )
        run_fuzzy = decontam_fuzzy
        if decontam_fuzzy and decontam_fuzzy_gate_min_jaccard is not None:
            # sketch-driven SCHEDULING (r9): the near-dup decontam pass
            # only runs when the KMV vocabulary-overlap estimate says
            # there could be something to find — two k-row sketch jobs
            # instead of a corpus signature pass when the bench and
            # corpus don't share a vocabulary
            run_fuzzy = corpus_overlap_gate(
                deduped,
                decontam_bench,
                text_col=text_col,
                b_text_col=decontam_text_col,
                min_jaccard=decontam_fuzzy_gate_min_jaccard,
            )["run"]
        if run_fuzzy:
            # second pass for lightly-EDITED eval text the exact n-gram
            # overlap misses (operators/decontam.py:minhash_decontaminate)
            from sparkall_spark.operators.decontam import (
                minhash_decontaminate,
            )

            deduped = minhash_decontaminate(
                deduped,
                decontam_bench,
                id_col=id_col,
                text_col=text_col,
                bench_text_col=decontam_text_col,
                threshold=decontam_fuzzy_threshold,
                mode="clean",
            )
    if redact_pii:
        # AFTER dedup on purpose: masking collapses distinct addresses
        # to one token, which would merge genuinely different documents
        # under the dedup fingerprint
        deduped = deduped.withColumn(text_col, X.redact_pii(text_col))
    if domain_cap_col is not None:
        # LAST: the per-domain token budget applies to the corpus that
        # actually survives (capping pre-filter volume would let junk
        # claim budget that cleaning then deletes).  Ordered by the
        # quality column this pass computed, so each domain keeps its
        # best documents (operators/selection.py).
        from sparkall_spark.operators.selection import stratum_token_cap

        deduped = stratum_token_cap(
            deduped.withColumn("__ntok", X.token_count(text_col)),
            stratum_col=domain_cap_col,
            n_tokens_col="__ntok",
            token_budget=domain_token_budget,
            id_col=id_col,
            order_col="quality",
        ).drop("__ntok")
    if curriculum_bins is not None:
        # difficulty bin from the pipeline's own quality score: HIGH
        # quality = easy = bin 0 (descending), thresholds from the
        # deterministic bottom-k quantiles (ordering.curriculum_order's
        # binning, attached as a column — ordering is a write concern)
        from sparkall_spark.operators.ordering import curriculum_bin

        deduped = curriculum_bin(
            deduped, "quality", id_col=id_col, n_bins=curriculum_bins,
            ascending=False,
        )
    if split_weights is not None:
        # LAST of all: splits must see the final surviving id set
        from sparkall_spark.operators.sampling import hash_split

        deduped = hash_split(
            deduped, id_col, split_weights, seed=split_seed
        )
    return deduped


def _read_ledger(spark, path: str) -> DataFrame | None:
    """Read a parquet ledger, treating ONLY a missing path as a cold
    start; a corrupt or unreadable ledger must propagate — swallowing
    it would silently disable cross-batch dedup for the ingest and
    append duplicates."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException as e:
        get_cond = getattr(e, "getCondition", None) or getattr(
            e, "getErrorClass", lambda: None
        )
        cls = get_cond() or ""
        if "PATH_NOT_FOUND" not in cls and "Path does not exist" not in str(e):
            raise
        return None


def ingest_documents(
    spark,
    new_docs: DataFrame,
    corpus_path: str,
    ledger_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_seen: bool = False,
    near_ledger_path: str | None = None,
    near_threshold: float = 0.9,
) -> int:
    """Incremental corpus ingest: dedup ``new_docs`` against the
    fingerprint ledger at ``ledger_path``
    (`operators.dedup.exact_dedup_incremental`), APPEND the survivors
    to the parquet corpus at ``corpus_path``, then append their
    fingerprints to the ledger.  Returns the number of rows ingested.

    ``near_ledger_path`` additionally enables NEAR-dup ingest dedup
    (`operators.dedup.minhash_dedup_incremental`): after the exact
    gate, batch documents with a verified ``>= near_threshold``-jaccard
    neighbor in the minhash ledger (or a smaller-id surviving batch
    neighbor) are dropped, and the kept documents' ledger rows are
    appended there.  The exact gate stays FIRST — it is cheaper and
    pins empty documents, which the near gate passes through by
    design.

    Consistency contract: the ledgers are DERIVED INDEXES of the
    corpus, not independent sources of truth.  Writes happen
    corpus-first, so a failure between the appends can leave corpus
    rows missing from a ledger — a retried ingest would then re-append
    those rows (duplicates in the corpus, never losses; for the near
    ledger, missed future near-dups, never losses).  Repair is
    mechanical: :func:`rebuild_ledger` / :func:`rebuild_near_ledger`
    recompute a ledger from the corpus, and a one-off ``exact_dedup``
    pass removes any duplicate rows.  (Atomic multi-file commits belong
    to a table format; this sink stays plain parquet on purpose.)
    """
    from sparkall_spark.operators.dedup import (
        exact_dedup_incremental,
        minhash_dedup_incremental,
    )

    seen = _read_ledger(spark, ledger_path)
    # Persist ONE plan carrying BOTH the documents and their
    # fingerprints, and derive the appends from it: separate lazy
    # plans would each recompute the dedup + anti-join, and if
    # ``new_docs`` is not a stable snapshot the recomputations can
    # diverge — a fingerprint recorded without its document permanently
    # drops future genuine documents, inverting the "duplicates, never
    # losses" contract documented above.
    kept_fp, _ = exact_dedup_incremental(
        new_docs, seen, id_col=id_col, text_col=text_col,
        broadcast_seen=broadcast_seen, keep_fingerprint_col=True,
    )
    pinned = [kept_fp.persist()]
    kept_fp = pinned[0]
    mh_delta = None
    try:
        kept_fp.count()
        if near_ledger_path is not None:
            near_seen = _read_ledger(spark, near_ledger_path)
            # the minhash signature table inside is persisted (operator
            # cache registry — released by the caller's unit-of-work
            # boundary, e.g. per micro-batch in stream_ingest_documents),
            # so the delta append below derives from the same cached
            # plan as the kept rows — no divergent recompute
            # ingest batches are bounded by contract (see
            # minhash_dedup_incremental's broadcast sizing note), so
            # the within-batch pair machinery's strategy gates are
            # pinned — skipping its counted-gate job per ingest tick
            kept_fp, mh_delta = minhash_dedup_incremental(
                kept_fp, near_seen, id_col=id_col, text_col=text_col,
                threshold=near_threshold, broadcast_reps=True,
                candidate_strategy="broadcast",
            )
            pinned.append(kept_fp.persist())
            # LINEAGE-TRUNCATED, not merely cached: appending to a
            # parquet path INVALIDATES (uncaches) every plan that
            # transitively reads it, and the delta's lineage reads BOTH
            # ledger paths — a persisted-but-lineage-bearing delta
            # consumed after the exact-ledger append recomputes against
            # the just-updated ledger and silently comes back EMPTY
            # (observed: near-ledger rows never recorded, breaking
            # cross-batch near-dedup).  The delta is ledger-rows-of-the-
            # kept-batch small, so the eager local checkpoint is cheap.
            mh_delta = mh_delta.localCheckpoint(eager=True)
        n = kept_fp.count()
        if n:
            # write order: every consumer runs BEFORE the append that
            # would invalidate its lineage — corpus (invalidates no
            # ledger read), exact ledger (kept_fp is never consumed
            # again), near ledger last (the delta is checkpoint-backed,
            # immune).  A crash between the ledger appends leaves the
            # near ledger missing this batch's rows: a replay is still
            # dropped by the EXACT ledger (no duplicates), and future
            # near-dups of these docs slip through until
            # rebuild_near_ledger — missed dedup, never losses.
            kept_fp.drop("fingerprint").write.mode("append").parquet(
                corpus_path
            )
            kept_fp.select("fingerprint").write.mode("append").parquet(
                ledger_path
            )
            if mh_delta is not None:
                mh_delta.write.mode("append").parquet(near_ledger_path)
        return n
    finally:
        for df in pinned:
            df.unpersist()


def rebuild_ledger(
    spark, corpus_path: str, ledger_path: str, text_col: str = "text"
) -> None:
    """Recompute the fingerprint ledger from the corpus (repair path
    for a failed :func:`ingest_documents`; also the migration path for
    a corpus that predates the ledger)."""
    from sparkall_spark.operators.dedup import fingerprint

    corpus = spark.read.parquet(corpus_path)
    (
        corpus.select(fingerprint(text_col).alias("fingerprint"))
        .distinct()
        .write.mode("overwrite")
        .parquet(ledger_path)
    )


def rebuild_near_ledger(
    spark,
    corpus_path: str,
    near_ledger_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    **minhash_params,
) -> None:
    """Recompute the minhash near-dup ledger from the corpus (repair
    path for a failed near-dup :func:`ingest_documents`; also the
    migration path for a corpus that predates near-dup ingest).  Pass
    the SAME ``ngram``/``num_hashes``/``bands``/``seed`` the ingest
    uses — see ``minhash_ledger_table``'s parameter-pinning warning."""
    from sparkall_spark.operators.dedup import minhash_ledger_table

    corpus = spark.read.parquet(corpus_path)
    (
        minhash_ledger_table(
            corpus, id_col=id_col, text_col=text_col, **minhash_params
        )
        .write.mode("overwrite")
        .parquet(near_ledger_path)
    )


def ingest_vectors(
    spark,
    new_vecs: DataFrame,
    corpus_path: str,
    ledger_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
    dim: int = 64,
    bits: int = 8,
    tables: int = 8,
    seed: int = 42,
) -> int:
    """Incremental EMBEDDING-corpus ingest: semantic-dedup ``new_vecs``
    against the persisted embedding ledger
    (`operators.dedup.embedding_dedup_incremental`), APPEND the
    survivors to the parquet corpus, then append their ledger rows.
    Returns the number of rows ingested — :func:`ingest_documents`'s
    contract for the vector modality (paraphrase-level dedup at ingest
    time instead of a periodic full-corpus SemDeDup pass).

    Same consistency contract as the text ingest: the ledger is a
    derived index, writes are corpus-first, so a crash between appends
    means missed FUTURE near-dups, never losses — repair via
    :func:`rebuild_sem_ledger`.  Same lineage rule too: the ledger
    delta is eagerly local-checkpointed BEFORE any append, because
    appending to ``ledger_path`` invalidates every cached plan that
    transitively reads it (the near-ledger lesson, see
    ingest_documents).  Rows without a ledger row (null / wrong-dim /
    zero vectors) are ingested as-is every time — pin them upstream
    with the exact gate if they matter.
    """
    from sparkall_spark.operators.dedup import embedding_dedup_incremental

    seen = _read_ledger(spark, ledger_path)
    kept, delta = embedding_dedup_incremental(
        new_vecs, seen, id_col=id_col, vec_col=vec_col,
        threshold=threshold, dim=dim, bits=bits, tables=tables, seed=seed,
    )
    kept = kept.persist()
    try:
        delta = delta.localCheckpoint(eager=True)
        n = kept.count()
        if n:
            kept.write.mode("append").parquet(corpus_path)
            delta.write.mode("append").parquet(ledger_path)
        return n
    finally:
        kept.unpersist()


def rebuild_sem_ledger(
    spark,
    corpus_path: str,
    ledger_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **lsh_params,
) -> None:
    """Recompute the embedding ledger from the vector corpus (repair /
    migration path for :func:`ingest_vectors`).  Pass the SAME
    dim/bits/tables/seed the ingest uses — the parameter-pinning
    warning of ``embedding_ledger_table`` applies."""
    from sparkall_spark.operators.dedup import embedding_ledger_table

    corpus = spark.read.parquet(corpus_path)
    (
        embedding_ledger_table(
            corpus, id_col=id_col, vec_col=vec_col, **lsh_params
        )
        .write.mode("overwrite")
        .parquet(ledger_path)
    )


def crawl_to_documents(
    spark,
    warc_path: str,
    min_status: int = 200,
    max_status: int = 299,
    html_only: bool = True,
) -> DataFrame:
    """One-call crawl front end: WARC records -> successful HTML
    responses -> markup-stripped text in the standard document schema
    ``(doc_id, url, text)`` — ready for :func:`prepare_documents`.

    ``doc_id`` is a deterministic 128-bit hex id (two independently
    salted xxhash64 of (file, record offset)), stable across reruns and
    partitionings (unlike monotonically_increasing_id).  Width matters:
    a single 64-bit hash has a BIRTHDAY problem at crawl scale — at 1e12
    records the expected number of colliding pairs is n²/2^65 ≈ 27,000,
    and a collision silently merges two distinct documents in every
    id-keyed stage (lm_score groupBy, decontam joins, exact_dedup's
    min-id tie-break).  At 128 bits the same aggregate is ~1.5e-15 —
    negligible.  Constant 32-char width keeps the shuffle key compact
    (vs. carrying the full file path).  The whole thing stays one lazy
    map-only plan on top of the WARC reader.
    """
    from sparkall_spark.sources.warc import read_warc

    recs = read_warc(spark, warc_path).filter(
        F.col("http_status").between(min_status, max_status)
    )
    if html_only:
        recs = recs.filter(
            F.col("content_type").isNull()
            | F.lower(F.col("content_type")).contains("html")
        )
    h1 = F.xxhash64(F.col("file"), F.col("record_offset"))
    h2 = F.xxhash64(F.lit("sparkall.docid.2"), F.col("file"), F.col("record_offset"))
    return recs.select(
        F.lower(
            F.concat(F.lpad(F.hex(h1), 16, "0"), F.lpad(F.hex(h2), 16, "0"))
        ).alias("doc_id"),
        F.col("target_uri").alias("url"),
        X.html_to_text(F.col("body")).alias("text"),
    )


def corpus_report(
    docs: DataFrame,
    text_col: str = "text",
    lang_col: str | None = None,
    approx_distinct: bool = False,
    approx_rsd: float = 0.01,
) -> DataFrame:
    """One-row corpus health summary — the numbers an operator checks
    before and after each pipeline stage: document/token/char volume,
    exact-duplicate rate (distinct normalized fingerprints vs rows),
    mean quality score, and zero-token count.

    ONE aggregate job (count-distinct adds Spark's expand, still a
    single job); nothing row-scale reaches the driver.  Per-language
    volume is a separate ``groupBy(lang_col)`` — pass ``lang_col`` to
    get (report row per language) instead of the global row.

    ``approx_distinct=True`` swaps the exact distinct-fingerprint count
    for Spark's HyperLogLog++ sketch (``approx_count_distinct``,
    relative error ``approx_rsd``): the exact form shuffles every
    distinct 8-byte fingerprint once, which is corpus-scale at 100 TB,
    while the sketch is a fixed-size map-side merge — the right default
    for a monitoring dashboard (the exact form stays the default here
    because the report feeds hash-checked oracles).  ``dup_ratio`` is
    then approximate to the same rsd.

    NULL text counts as an empty document (not a silent duplicate):
    the text is coalesced to "" before fingerprint/token/char metrics,
    so countDistinct doesn't drop the row and n_empty includes it.
    """
    t = F.coalesce(
        F.col(text_col) if isinstance(text_col, str) else text_col,
        F.lit(""),
    )
    aggs = [
        F.count("*").cast("bigint").alias("n_docs"),
        F.coalesce(F.sum(X.token_count(t)), F.lit(0))
        .cast("bigint")
        .alias("total_tokens"),
        F.coalesce(F.sum(X.char_count(t)), F.lit(0))
        .cast("bigint")
        .alias("total_chars"),
        (
            F.approx_count_distinct(X.fingerprint(t), rsd=approx_rsd)
            if approx_distinct
            else F.countDistinct(X.fingerprint(t))
        )
        .cast("bigint")
        .alias("n_distinct"),
        F.round(F.avg(X.quality_score(t)), 6).alias("mean_quality"),
        F.coalesce(
            F.sum(F.when(X.token_count(t) == 0, 1).otherwise(0)),
            F.lit(0),
        )
        .cast("bigint")
        .alias("n_empty"),
    ]
    grouped = (
        docs.groupBy(F.col(lang_col).alias("lang"))
        if lang_col is not None
        else docs.groupBy()
    )
    out = grouped.agg(*aggs)
    return out.withColumn(
        "dup_ratio",
        F.when(
            F.col("n_docs") > 0,
            # clamped at 0: the HLL++ sketch can OVERestimate distincts
            # past n_docs (observed 501/500), which would otherwise
            # print a negative duplicate rate; exact mode never trips
            # the clamp
            F.greatest(
                F.lit(0.0),
                F.round(
                    F.lit(1.0)
                    - F.col("n_distinct").cast("double") / F.col("n_docs"),
                    6,
                ),
            ),
        ).otherwise(F.lit(0.0)),
    )


def filter_report(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    keep_langs: tuple[str, ...] | None = None,
    max_dup_line_ratio: float | None = None,
    max_dup_ngram_ratio: float | None = None,
    min_compression_ratio: float | None = None,
    max_bullet_ratio: float | None = None,
    max_ellipsis_ratio: float | None = None,
    min_alpha_word_ratio: float | None = None,
    max_symbol_word_ratio: float | None = None,
    gopher_quality: bool = False,
    c4_rules: bool = False,
) -> DataFrame:
    """Per-document audit of :func:`prepare_documents`' MAP-SIDE gates:
    every gate becomes a boolean column instead of a silent filter, plus
    the aggregate ``keep`` — the "why was this document dropped" surface
    a production pipeline needs for threshold tuning and drop-rate
    monitoring, at the cost of one map-only pass (no filtering, no
    shuffle).

    Covers exactly the Column-expressible gates, built from the SAME
    ``functions.text`` expressions with the same knob semantics
    (``keep == True`` rows are precisely the rows that would reach
    prepare_documents' dedup stage — asserted in tests).  The join- or
    training-backed stages (dedup, LM, classifier, decontam, domain
    cap) are relational decisions, not per-row predicates — audit those
    from their own outputs.  Gates whose knob is off report ``True``
    (not applied = passed).

    Gate columns are total (never NULL): a NULL text makes every
    signal NULL, and a NULL predicate would DROP the row in
    prepare_documents, so such gates are coalesced to False — the
    report's ``keep``/``NOT keep`` partition covers every input row.
    """
    gates: dict[str, F.Column] = {}
    gates["pass_c4"] = (
        X.c4_keep(text_col) if c4_rules else F.lit(True)
    )
    # prepare_documents' stage order: the C4 keep predicate sees the
    # ORIGINAL text, every later signal sees the line-cleaned rewrite
    sig = X.c4_clean_lines(text_col) if c4_rules else F.col(text_col)
    quality = X.quality_score(sig)
    gates["pass_quality"] = quality >= F.lit(min_quality)
    gates["pass_gopher"] = (
        X.gopher_quality_keep(sig) if gopher_quality else F.lit(True)
    )
    gates["pass_compression"] = (
        X.compression_ratio(sig) >= F.lit(min_compression_ratio)
        if min_compression_ratio is not None
        else F.lit(True)
    )
    gates["pass_dup_lines"] = (
        X.duplicate_line_ratio(sig) <= F.lit(max_dup_line_ratio)
        if max_dup_line_ratio is not None
        else F.lit(True)
    )
    gates["pass_dup_ngrams"] = (
        X.duplicate_ngram_ratio(sig, 2) <= F.lit(max_dup_ngram_ratio)
        if max_dup_ngram_ratio is not None
        else F.lit(True)
    )
    gates["pass_bullets"] = (
        X.bullet_line_ratio(sig) <= F.lit(max_bullet_ratio)
        if max_bullet_ratio is not None
        else F.lit(True)
    )
    gates["pass_ellipsis"] = (
        X.ellipsis_line_ratio(sig) <= F.lit(max_ellipsis_ratio)
        if max_ellipsis_ratio is not None
        else F.lit(True)
    )
    gates["pass_alpha_words"] = (
        X.alpha_word_ratio(sig) >= F.lit(min_alpha_word_ratio)
        if min_alpha_word_ratio is not None
        else F.lit(True)
    )
    gates["pass_symbol_words"] = (
        X.symbol_word_ratio(sig) <= F.lit(max_symbol_word_ratio)
        if max_symbol_word_ratio is not None
        else F.lit(True)
    )
    lang = X.lang_id(sig)
    gates["pass_lang"] = (
        lang.isin(*keep_langs) if keep_langs is not None else F.lit(True)
    )
    # totalize: NULL signals (NULL text) fail like prepare_documents'
    # filters would; keep is the AND of the totalized gates
    gates = {
        name: F.coalesce(g, F.lit(False)) for name, g in gates.items()
    }
    keep = None
    for g in gates.values():
        keep = g if keep is None else (keep & g)
    cols = [F.col(id_col), quality.alias("quality"), lang.alias("lang_pred")]
    cols += [expr.alias(name) for name, expr in gates.items()]
    cols.append(keep.alias("keep"))
    return docs.select(*cols)


def drop_histogram(report: DataFrame) -> DataFrame:
    """Drop-rate telemetry from a :func:`filter_report` frame: one row
    per gate with how many documents fail it (n_failed, fail_rate) —
    the number a threshold-tuning loop actually reads.  One aggregate
    over the report; gates are read from the schema, so new gates show
    up without touching this function."""
    gate_cols = [c for c in report.columns if c.startswith("pass_")] + [
        "keep"
    ]
    n = F.count(F.lit(1))
    # NULL gate values (e.g. NULL text makes every signal NULL) count
    # as failed: a NULL predicate filters the row out downstream, so
    # attributing it as "not failed" would undercount real drops
    aggs = [
        F.sum(
            F.when(F.col(c).isNull() | ~F.col(c), 1).otherwise(0)
        ).alias(c)
        for c in gate_cols
    ]
    row = report.agg(n.alias("__n"), *aggs).first()
    total = row["__n"]
    spark = report.sparkSession
    return spark.createDataFrame(
        [
            (c, int(row[c]), round(row[c] / total, 6) if total else 0.0)
            for c in gate_cols
        ],
        "gate string, n_failed bigint, fail_rate double",
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    old_fp_col: str | None = None,
    new_fp_col: str | None = None,
) -> DataFrame:
    """Snapshot diff between two corpus versions — the nightly ingest
    audit for an evolving 100 TB corpus: which documents were added,
    removed, or rewritten between yesterday's table and today's.

    One row per ``id_col`` whose membership or content changed:
    ``status`` in ``{'added', 'removed', 'changed'}`` with the
    engine-portable content fingerprints (``old_fp``/``new_fp``,
    :func:`~sparkall_spark.functions.text.fingerprint` — lowercased,
    whitespace-collapsed rolling hash, so formatting-only churn does
    not count as change).  Unchanged documents emit nothing, which is
    what keeps the diff output ingest-sized rather than corpus-sized.
    Ids must be unique within each snapshot (dedup first — the
    standard ingest-ledger discipline).  NULL text fingerprints like
    the empty string, so a NULL-text row still diffs by membership.

    ``old_fp_col``/``new_fp_col`` (r11, VERDICT Next #4): name an
    existing fingerprint column on that side and the map-side recompute
    is SKIPPED — at 100 TB the nightly diff should never re-fingerprint
    yesterday's corpus; the exact-dedup ingest ledger already stores
    each kept document's fingerprint, so yesterday's side becomes a
    column projection of the ledger and only the arriving snapshot
    pays the text scan.  The column must hold the SAME fingerprint
    family (:func:`~sparkall_spark.functions.text.fingerprint` over
    NULL-coalesced text) or 'changed' rows are meaningless — mixing
    families is the caller's bug, same contract as every ledger here.
    A NULL in the provided column is coalesced to the NULL-text
    fingerprint (fp of the empty string): the status classifier keys
    on NULL meaning ABSENT FROM THE SNAPSHOT, so a ledger that stored
    NULL for a NULL-text document must not make a present row
    classify as added/removed (review catch).

    Scale shape: map-side fingerprints on both sides, ONE full-outer
    equi-join shuffle on the id, map-side status classify + filter.
    No windows, no driver data.
    """
    from sparkall_spark.functions.text import fingerprint

    fp = lambda: fingerprint(F.coalesce(F.col(text_col), F.lit("")))  # noqa: E731
    # constant-folded fp("") — what the text path produces for NULL text
    null_fp = fingerprint(F.lit(""))
    o = old.select(
        F.col(id_col),
        (
            F.coalesce(F.col(old_fp_col), null_fp) if old_fp_col else fp()
        ).alias("old_fp"),
    )
    n = new.select(
        F.col(id_col),
        (
            F.coalesce(F.col(new_fp_col), null_fp) if new_fp_col else fp()
        ).alias("new_fp"),
    )
    joined = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") != F.col("new_fp"), F.lit("changed"))
    )
    return joined.select(
        id_col, status.alias("status"), "old_fp", "new_fp"
    ).filter(F.col("status").isNotNull())
