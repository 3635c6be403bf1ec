"""Distributed logistic-regression quality classifier — deterministic,
cross-engine-exact training.

The classifier family LLM data pipelines actually deploy (GPT-3's
quality filter, LLaMA's Wikipedia-reference classifier, fastText-style
filters) is logistic regression over hashed token features.  This is
the trainable complement of the fixed-form Naive Bayes in
``operators/classifier.py``: full-batch gradient descent where EVERY
per-iteration reduction is an exact BIGINT sum of per-row
micro-quantized contributions, so training is deterministic under any
partitioning/shuffle order and a DuckDB mirror reproduces the learned
weights bit-for-bit (:func:`logreg_oracle_sql`).

Scale design (the driver holds the model, the cluster holds the data —
the textbook distributed-GD split):

- features are one exploded ``(doc, bucket, count)`` aggregation over
  the corpus, computed ONCE and persisted (released via
  ``operators._cache.release_caches``);
- each iteration is ONE map-side-combined aggregation job over the
  cached features (margins -> per-doc error -> per-bucket gradient);
  the driver collects ``n_buckets`` gradient rows (model-sized — a
  few KB) and folds the update in exact integer arithmetic;
- weights re-enter the plan as a single SQL-string literal array for
  small models (the r6 lesson: literal tables built
  expression-by-expression cost driver planning time; one ``F.expr``
  parse is milliseconds), and as a broadcast ``(bucket, weight)``
  table above ``_LITERAL_WEIGHT_LIMIT`` buckets — at the 1M-bucket
  production sizing an ~8 MB literal would be re-parsed and codegen'd
  per job and hit planner/codegen limits (r7 ADVICE item 5).

Determinism contract (the same discipline as ``operators/lm.py``):
per-row error contributions are computed in double — including the
sigmoid — then HALF-AWAY-FROM-ZERO rounded to BIGINT micros
(``F.round`` == DuckDB ``round`` for doubles), summed exactly, and the
weight update is pure integer arithmetic (``_half_away``), mirrored in
SQL without any floating division.  The only cross-engine float risk
is the accepted last-ulp-of-``exp`` class every micro-logp operator in
this repo already carries.

No counterpart in the reference engine (EIS-Bonn/sparkall has no ML
operators); this extends the beyond-reference training-data surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from sparkall_spark.functions.text import tokens
from sparkall_spark.operators._cache import persist_tracked
from sparkall_spark.operators.features import _P_MOD, _portable_token_hash

MICRO = 1_000_000


def _half_away(num: int, den: int) -> int:
    """Round ``num/den`` (den > 0) half away from zero, in exact
    integer arithmetic — matches ``round()`` on doubles in both Spark
    and DuckDB without ever dividing in floating point."""
    q = (2 * abs(num) + den) // (2 * den)
    return q if num >= 0 else -q


def _features(
    docs: DataFrame, id_col: str, text_col: str, n_buckets: int
) -> DataFrame:
    """(``__id``, ``__b``, ``__cnt``): hashed-token occurrence counts
    per document — the portable rolling hash so SQL mirrors agree."""
    tok = docs.select(
        F.col(id_col).alias("__id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("__tok"),
    )
    return (
        tok.withColumn(
            "__b",
            F.pmod(_portable_token_hash(F.col("__tok")), F.lit(n_buckets))
            .cast("int"),
        )
        .groupBy("__id", "__b")
        .agg(F.count("*").cast("bigint").alias("__cnt"))
    )


def _w_literal(weights: list[int]) -> F.Column:
    """The weight vector as ONE parsed literal array expression."""
    return F.expr(
        "array(" + ",".join(f"{w}L" for w in weights) + ")"
    )


# Above this size the weight vector stops riding along as a literal
# array: an ~8 MB expression at the advertised 1M-bucket production
# sizing would be re-parsed and codegen'd per job and hits planner /
# codegen limits long before that (r7 ADVICE item 5).
_LITERAL_WEIGHT_LIMIT = 4096


def _attach_weight(feats: DataFrame, weights: list[int]) -> DataFrame:
    """``feats`` + ``__wm`` = the per-bucket weight.

    Small models (the common quality-classifier sizing) stay a literal
    array — ``element_at`` costs zero joins and zero shuffles.  Large
    models become a broadcast ``(bucket, weight)`` table: one
    model-sized broadcast per job, a broadcast hash join on the INT
    bucket id, and the expression tree stays constant-size no matter
    how many buckets the model has.  Both paths attach exactly the
    same BIGINT value, so the integer-exact training/scoring contract
    is unchanged."""
    if len(weights) <= _LITERAL_WEIGHT_LIMIT:
        return feats.withColumn(
            "__wm", F.element_at(_w_literal(weights), F.col("__b") + 1)
        )
    spark = feats.sparkSession
    wdf = spark.createDataFrame(
        list(enumerate(weights)), "__b int, __wm bigint"
    )
    # left join + coalesce: every __b in [0, n_buckets) matches by
    # construction (pmod), the guard only keeps NULL-safety local
    return feats.join(F.broadcast(wdf), "__b", "left").withColumn(
        "__wm", F.coalesce("__wm", F.lit(0).cast("bigint"))
    )


def train_logreg(
    docs: DataFrame,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    iters: int = 3,
    lr_den: int = 2,
) -> tuple[list[int], int]:
    """Full-batch GD logistic regression; returns
    ``(weights_micro, bias_micro)`` — ``n_buckets`` BIGINT micro
    weights plus the bias, all exactly reproducible by
    :func:`logreg_oracle_sql`.

    ``label_col`` must be 0/1 (int-castable).  The learning rate is
    ``1/lr_den`` applied to the MEAN gradient (update =
    ``half_away(gradient_sum, lr_den * n_docs)``), so step sizes are
    corpus-size-invariant.  ``iters`` is small by design — the point
    of a quality classifier is separating obvious junk, and each
    iteration is one corpus aggregation; production sizing is larger
    ``n_buckets`` (the model stays a driver-side list: 1M buckets =
    8 MB), not more passes.

    Documents with no tokens still contribute to the bias gradient
    (their margin is the bare bias).
    """
    if iters < 1 or n_buckets < 2 or lr_den < 1:
        raise ValueError("iters >= 1, n_buckets >= 2, lr_den >= 1")
    feats = persist_tracked(_features(docs, id_col, text_col, n_buckets))
    lbl = persist_tracked(
        docs.select(
            F.col(id_col).alias("__id"),
            F.col(label_col).cast("int").alias("__y"),
        )
    )
    # one aggregate validates the label contract AND materializes the
    # cache: a NULL label would otherwise surface as a NULL gradient
    # sum -> TypeError deep in the update fold, far from the cause
    n_docs, n_lbl, lo, hi = lbl.agg(
        F.count(F.lit(1)), F.count("__y"), F.min("__y"), F.max("__y")
    ).first()
    if n_docs == 0:
        raise ValueError("cannot train on an empty corpus")
    if n_lbl != n_docs:
        raise ValueError(
            f"label_col {label_col!r} has {n_docs - n_lbl} NULLs — labels "
            "must be 0/1 for every row (filter or fill first)"
        )
    if lo < 0 or hi > 1:
        raise ValueError(
            f"labels must be 0/1, got range [{lo}, {hi}] in {label_col!r}"
        )
    den = lr_den * n_docs

    w = [0] * n_buckets
    b = 0
    for _ in range(iters):
        margins = (
            _attach_weight(feats, w)
            .groupBy("__id")
            .agg(F.sum(F.col("__cnt") * F.col("__wm")).alias("__m"))
        )
        err = lbl.join(margins, "__id", "left").select(
            "__id",
            (
                F.lit(1.0)
                / (
                    F.lit(1.0)
                    + F.exp(
                        -(F.coalesce("__m", F.lit(0)) + F.lit(b))
                        / F.lit(float(MICRO))
                    )
                )
                - F.col("__y")
            ).alias("__err"),
        )
        # per-row micro-rounded contributions -> exact integer sums
        grads = (
            feats.join(err, "__id")
            .groupBy("__b")
            .agg(
                F.sum(
                    F.round(F.col("__err") * F.col("__cnt") * MICRO)
                    .cast("bigint")
                ).alias("__g")
            )
        )
        g0 = err.agg(
            F.sum(F.round(F.col("__err") * MICRO).cast("bigint"))
        ).first()[0]
        g = {r["__b"]: r["__g"] for r in grads.collect()}
        w = [w[j] - _half_away(g.get(j, 0), den) for j in range(n_buckets)]
        b -= _half_away(int(g0), den)
    return w, b


def logreg_score(
    docs: DataFrame,
    weights_micro: list[int],
    bias_micro: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(id_col, margin_micro)`` per document — the BIGINT decision
    margin (positive = predicted label 1; apply a sigmoid in double
    for probabilities).  Integer-exact, so scores hash-match across
    engines with no float risk at all.  Map-side except the per-doc
    aggregation; the model rides along as one literal array."""
    n_buckets = len(weights_micro)
    feats = _features(docs, id_col, text_col, n_buckets)
    margins = (
        _attach_weight(feats, weights_micro)
        .groupBy("__id")
        .agg(F.sum(F.col("__cnt") * F.col("__wm")).alias("__m"))
    )
    return (
        docs.select(F.col(id_col).alias("__id"))
        .join(margins, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            (F.coalesce("__m", F.lit(0)) + F.lit(bias_micro))
            .cast("bigint")
            .alias("margin_micro"),
        )
    )


def _sql_tok_feats(table: str, n_buckets: int, label_sql: str) -> str:
    """Shared mirror CTEs: features, labels, doc count.

    ``tok``/``feats`` are MATERIALIZED: the per-character portable hash
    is the chain's expensive expression and every unrolled iteration
    references ``feats`` twice — without the hint DuckDB inlines the
    CTE per reference and recomputes the hash ~2*iters times (measured
    5.6x on the 3-iteration chain; values identical)."""
    return f"""
tok AS MATERIALIZED (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                            x -> x <> '')) AS tok
  FROM {table}),
feats AS MATERIALIZED (
  SELECT doc_id,
         CAST(list_reduce(
           list_prepend(0::BIGINT,
             [ascii(c)::BIGINT FOR c IN
                list_filter(string_split(tok, ''), x -> x <> '')]),
           (acc, c) -> (acc * 31 + c) % {_P_MOD}) % {n_buckets} AS INT) AS b,
         count(*)::BIGINT AS cnt
  FROM tok GROUP BY 1, 2),
lbl AS MATERIALIZED (
  SELECT doc_id, CAST({label_sql} AS INT) AS y FROM {table}),
nd AS MATERIALIZED (SELECT count(*)::BIGINT AS n FROM lbl),
buckets AS (SELECT unnest(range({n_buckets}))::INT AS b),
w0 AS (SELECT b, 0::BIGINT AS w FROM buckets),
b0 AS (SELECT 0::BIGINT AS bias)"""


def _sql_iter(i: int, lr_den: int) -> str:
    """One unrolled GD iteration as mirror CTEs (weights w{i-1} ->
    w{i}), arithmetic identical to :func:`train_logreg`: margins join,
    sigmoid error, per-row micro round, exact integer sums, and the
    half-away-from-zero integer update (no float division).

    Every round CTE is MATERIALIZED: ``w{i}``/``b{i}`` are referenced by
    the next round AND (for the final round) by each consuming branch,
    and the bias chain's scalar subqueries reference ``b{i-1}``/``gb{i}``
    /``nd`` several times each — without the hint DuckDB re-inlines the
    whole prior chain per reference and the unrolled 3-round oracle goes
    superlinear (measured ~5 s -> sub-second at sf0.01; outputs are
    64-row/1-row frames, so materialization is free).  Values identical
    — MATERIALIZED is an evaluation hint only."""
    p, c = i - 1, i
    return f"""
m{c} AS MATERIALIZED (
  SELECT l.doc_id, l.y,
         coalesce(s.m, 0) + (SELECT bias FROM b{p}) AS m
  FROM lbl l LEFT JOIN (
    SELECT f.doc_id, sum(f.cnt * w.w)::BIGINT AS m
    FROM feats f JOIN w{p} w USING (b) GROUP BY f.doc_id) s
  USING (doc_id)),
e{c} AS MATERIALIZED (
  SELECT doc_id, 1.0 / (1.0 + exp(-(m::DOUBLE) / 1000000.0)) - y AS err
  FROM m{c}),
g{c} AS MATERIALIZED (
  SELECT f.b, sum(CAST(round(e.err * f.cnt * 1000000) AS BIGINT)) AS g
  FROM feats f JOIN e{c} e USING (doc_id) GROUP BY f.b),
w{c} AS MATERIALIZED (
  SELECT w.b,
         w.w - (CASE WHEN coalesce(g.g, 0) >= 0
                THEN (2 * coalesce(g.g, 0) + {lr_den} * (SELECT n FROM nd))
                     // (2 * {lr_den} * (SELECT n FROM nd))
                ELSE -((2 * -coalesce(g.g, 0) + {lr_den} * (SELECT n FROM nd))
                     // (2 * {lr_den} * (SELECT n FROM nd)))
                END) AS w
  FROM w{p} w LEFT JOIN g{c} g USING (b)),
gb{c} AS MATERIALIZED (
  SELECT sum(CAST(round(err * 1000000) AS BIGINT)) AS g FROM e{c}),
b{c} AS MATERIALIZED (
  SELECT (SELECT bias FROM b{p})
         - (CASE WHEN (SELECT g FROM gb{c}) >= 0
            THEN (2 * (SELECT g FROM gb{c}) + {lr_den} * (SELECT n FROM nd))
                 // (2 * {lr_den} * (SELECT n FROM nd))
            ELSE -((2 * -(SELECT g FROM gb{c}) + {lr_den} * (SELECT n FROM nd))
                 // (2 * {lr_den} * (SELECT n FROM nd)))
            END) AS bias)"""


def logreg_train_chain_sql(
    label_sql: str,
    n_buckets: int = 256,
    iters: int = 3,
    lr_den: int = 2,
    table: str = "documents",
) -> str:
    """The unrolled training chain as a WITH *body* (no ``WITH``
    keyword, no final SELECT) ending in ``w{iters}``/``b{iters}`` —
    share it when one query needs BOTH the learned weights and the
    per-doc scores (the e27 oracle previously embedded the chain twice
    and paid for both)."""
    parts = [_sql_tok_feats(table, n_buckets, label_sql)]
    for i in range(1, iters + 1):
        parts.append(_sql_iter(i, lr_den))
    return ",".join(parts)


def logreg_scores_select_sql(iters: int = 3) -> str:
    """The per-document margin SELECT over an in-scope training chain
    (see :func:`logreg_train_chain_sql`): ``(doc_id, margin_micro)``."""
    return f"""
SELECT l.doc_id,
       (coalesce(s.m, 0) + (SELECT bias FROM b{iters}))::BIGINT
         AS margin_micro
FROM lbl l LEFT JOIN (
  SELECT f.doc_id, sum(f.cnt * w.w)::BIGINT AS m
  FROM feats f JOIN w{iters} w USING (b) GROUP BY f.doc_id) s
USING (doc_id)"""


def logreg_oracle_sql(
    label_sql: str,
    n_buckets: int = 256,
    iters: int = 3,
    lr_den: int = 2,
    table: str = "documents",
) -> str:
    """DuckDB mirror of :func:`train_logreg`: unrolled CTE chain, one
    block per iteration (the k-means-oracle pattern).  Emits one row
    per bucket ``(b, w)`` plus the bias as ``b = -1`` — compare against
    the Spark-trained ``(weights_micro, bias_micro)``.

    Note the half-away-from-zero update uses INTEGER arithmetic on both
    engines (``(2|g| + den) // (2 den)``), so the only float in the
    loop is the sigmoid, whose per-row output is micro-rounded before
    any sum."""
    return (
        "WITH "
        + logreg_train_chain_sql(label_sql, n_buckets, iters, lr_den, table)
        + f"""
SELECT b::BIGINT AS b, CAST(w AS BIGINT) AS w FROM w{iters}
UNION ALL
SELECT -1::BIGINT AS b, CAST(bias AS BIGINT) AS w FROM b{iters}"""
    )


def logreg_scores_oracle_sql(
    label_sql: str,
    n_buckets: int = 256,
    iters: int = 3,
    lr_den: int = 2,
    table: str = "documents",
) -> str:
    """DuckDB mirror of ``train_logreg`` + :func:`logreg_score`: the
    same unrolled training chain, then every document's BIGINT decision
    margin under the final weights — ``(doc_id, margin_micro)``."""
    return (
        "WITH "
        + logreg_train_chain_sql(label_sql, n_buckets, iters, lr_den, table)
        + logreg_scores_select_sql(iters)
    )
