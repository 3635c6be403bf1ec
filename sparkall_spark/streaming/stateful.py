"""Custom stateful streaming operators via applyInPandasWithState.

The built-in windows (streaming/windows.py) cover tumbling/sliding/
session aggregation; this module is the escape hatch for state machines
the built-ins can't express.  Example operator: a per-key running
anomaly detector that keeps (count, mean, M2) Welford state across
micro-batches and emits events whose value deviates more than
``z_threshold`` standard deviations from the running mean.

Works on a streaming DataFrame (true incremental state in the state
store, timeout-driven eviction) and, for testing/backfill, on a batch
DataFrame via an equivalent applyInPandas path — same per-key logic.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ANOMALY_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_id", T.LongType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("zscore", T.DoubleType(), True),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType(), False),
        T.StructField("mean", T.DoubleType(), False),
        T.StructField("m2", T.DoubleType(), False),
    ]
)


def _welford_scan(
    pdf: pd.DataFrame, n: int, mean: float, m2: float, z_threshold: float
) -> tuple[list[dict], int, float, float]:
    """Sequential Welford update + score over one (sorted) pandas frame.

    The state recurrence is inherently order-dependent (each row is
    scored against the running mean/M2 of everything BEFORE it), so
    this stays a per-row loop — but over plain ``zip`` of the column
    arrays, not ``iterrows`` (which materializes a boxed Series per
    row and is the slowest iteration pandas offers).  The float
    arithmetic is operation-for-operation identical to the original
    scan: Python-float adds/divides in the same order, so emissions
    and rounding are bit-identical.
    """
    out = []
    users = pdf["user_id"].to_numpy()
    events = pdf["event_id"].to_numpy()
    values = pdf["value"].to_numpy()
    for uid, eid, v in zip(users, events, values):
        v = None if v is None else float(v)
        if v is None or math.isnan(v):
            continue
        if n >= 5:  # enough history to score
            std = math.sqrt(m2 / (n - 1)) if n > 1 else 0.0
            z = (v - mean) / std if std > 0 else 0.0
            if abs(z) >= z_threshold:
                out.append(
                    {
                        "user_id": int(uid),
                        "event_id": int(eid),
                        "value": v,
                        "zscore": round(z, 6),
                    }
                )
        n += 1
        delta = v - mean
        mean += delta / n
        m2 += delta * (v - mean)
    return out, n, mean, m2


def detect_anomalies_stream(
    events: DataFrame, z_threshold: float = 3.0, timeout_minutes: int = 60
) -> DataFrame:
    """Streaming path: per-user Welford state in the state store.

    Input must be a streaming DataFrame with user_id/event_id/ts/value.
    State is evicted after ``timeout_minutes`` of processing-time
    inactivity, bounding state size on high-cardinality keys.
    """

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(columns=[f.name for f in ANOMALY_SCHEMA.fields])
            return
        n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
        rows: list[dict] = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            new, n, mean, m2 = _welford_scan(pdf, n, mean, m2, z_threshold)
            rows.extend(new)
        state.update((n, mean, m2))
        state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield pd.DataFrame(rows, columns=[f.name for f in ANOMALY_SCHEMA.fields])

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=ANOMALY_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def detect_anomalies_batch(events: DataFrame, z_threshold: float = 3.0) -> DataFrame:
    """Batch twin of the streaming detector (same per-key scan, fresh
    state per run) — used for backfill and for oracle-style testing of
    the streaming logic."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts")
        rows, *_ = _welford_scan(pdf, 0, 0.0, 0.0, z_threshold)
        return pd.DataFrame(rows, columns=[f.name for f in ANOMALY_SCHEMA.fields])

    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(fn, schema=ANOMALY_SCHEMA)
    )


KMV_OUT_SCHEMA = T.StructType(
    [
        T.StructField("group", T.StringType(), False),
        T.StructField("n_kept", T.LongType(), False),
        T.StructField("est_distinct", T.DoubleType(), False),
    ]
)

KMV_STATE_SCHEMA = T.StructType(
    [T.StructField("mins", T.ArrayType(T.LongType()), False)]
)


def kmv_distinct_stream(
    events: DataFrame,
    value_col: str,
    group_col: str,
    k: int = 256,
) -> DataFrame:
    """Streaming distinct-cardinality per group with BOUNDED state: the
    KMV sketch (operators/sketches.py) as an ``applyInPandasWithState``
    operator.  State per key is the k smallest value hashes — k longs,
    whatever the stream's distinct cardinality — and each micro-batch
    emits the group's updated ``est_distinct`` (update semantics).

    Exact-below-k / (k-1)*M/h_(k) above, with THE SAME portable hash
    and estimator arithmetic as the batch sketch, so a streaming
    estimate equals ``kmv_sketch`` over the union of everything the
    stream has seen (asserted in tests) — the mergeability of KMV is
    what makes the incremental form exact, not approximate-on-top-of-
    approximate.

    100 TB story: COUNT(DISTINCT) over an unbounded stream needs
    unbounded state (every seen value); dropDuplicates+count needs a
    watermark to bound it and then forgets.  This keeps k longs per
    group forever and still answers within ~1/sqrt(k-2).
    """
    from sparkall_spark.operators.sketches import _M, _kmv_hash

    # NULL values/groups are dropped BEFORE grouping — matching the
    # batch sketch's isNotNull filter; a NULL hash would otherwise
    # reach pandas as NaN in a float64 column and int(NaN) would sink
    # the whole streaming query on the first dirty row.
    hashed = events.filter(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        F.col(group_col).cast("string").alias("group"),
        _kmv_hash(F.col(value_col).cast("string")).alias("__h"),
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (mins,) = state.get if state.exists else ([],)
        seen = set(mins)
        for pdf in pdfs:
            seen.update(int(h) for h in pdf["__h"])
        mins = sorted(seen)[:k]
        state.update((mins,))
        if len(mins) < k:
            est = float(len(mins))
        else:
            # HALF-UP on the shortest decimal repr — the same rule as
            # Spark's F.round (BigDecimal.valueOf), NOT python round()
            # (banker's half-even on the raw binary double); the
            # batch-equality contract is bit-level.
            import decimal

            est = float(
                decimal.Decimal(
                    repr((k - 1) * float(_M) / float(mins[k - 1]))
                ).quantize(
                    decimal.Decimal("0.0001"), rounding=decimal.ROUND_HALF_UP
                )
            )
        yield pd.DataFrame(
            [{"group": key[0], "n_kept": len(mins), "est_distinct": est}]
        )

    return hashed.groupBy("group").applyInPandasWithState(
        fn,
        outputStructType=KMV_OUT_SCHEMA,
        stateStructType=KMV_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


MG_OUT_SCHEMA = T.StructType(
    [
        T.StructField("group", T.StringType(), False),
        T.StructField("item", T.StringType(), False),
        T.StructField("est", T.LongType(), False),
        T.StructField("err_bound", T.LongType(), False),
        T.StructField("n_rows", T.LongType(), False),
    ]
)

MG_STATE_SCHEMA = T.StructType(
    [
        T.StructField("items", T.ArrayType(T.StringType()), False),
        T.StructField("counts", T.ArrayType(T.LongType()), False),
        T.StructField("n", T.LongType(), False),
        T.StructField("dec", T.LongType(), False),
    ]
)


def heavy_hitters_stream(
    events: DataFrame,
    value_col: str,
    group_col: str,
    k: int = 64,
) -> DataFrame:
    """Streaming frequent-items per group with BOUNDED state: the
    weighted Misra-Gries summary (operators/sketches.py) as an
    ``applyInPandasWithState`` operator.  State per key is at most k
    (item, count) pairs plus two longs — whatever the stream's distinct
    cardinality — and each micro-batch emits the group's updated
    summary rows (update semantics): ``est <= true <= est + err_bound``
    for every item, and nothing with frequency > 2·n_rows/(k+1) is
    ever lost.

    Uses THE SAME fold (`sketches._mg_update`: one vectorized
    ``value_counts`` per batch, one reduce) as the batch summary's
    per-partition pass, so a one-micro-batch stream equals the batch
    summary of the same rows on one partition exactly, and a
    multi-batch stream equals the sequential weighted-MG fold of its
    batches (both asserted in tests).

    100 TB story: exact top-items over an unbounded stream needs
    unbounded state; this keeps k counters per group forever and still
    guarantees every persistent heavy key surfaces — the streaming
    form of "which domains/keys dominate" telemetry.
    """
    from sparkall_spark.operators.sketches import _mg_update

    src = events.filter(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        F.col(group_col).cast("string").alias("group"),
        F.col(value_col).cast("string").alias("__v"),
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        items, counts, n, dec = (
            state.get if state.exists else ([], [], 0, 0)
        )
        st = dict(zip(items, (int(c) for c in counts)))
        for pdf in pdfs:
            vc = pdf["__v"].value_counts()
            dec = _mg_update(st, int(dec), vc.index, vc.to_numpy(), k)
            n = int(n) + int(vc.to_numpy().sum())
        # canonical (count desc, item asc) order: deterministic state
        # and output regardless of dict insertion history
        pairs = sorted(st.items(), key=lambda kv: (-kv[1], kv[0]))
        state.update(
            ([p[0] for p in pairs], [int(p[1]) for p in pairs], n, dec)
        )
        yield pd.DataFrame(
            [
                {
                    "group": key[0],
                    "item": it,
                    "est": int(c),
                    "err_bound": int(dec),
                    "n_rows": int(n),
                }
                for it, c in pairs
            ],
            columns=[f.name for f in MG_OUT_SCHEMA.fields],
        )

    return src.groupBy("group").applyInPandasWithState(
        fn,
        outputStructType=MG_OUT_SCHEMA,
        stateStructType=MG_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


BKQ_OUT_SCHEMA = T.StructType(
    [
        T.StructField("group", T.StringType(), False),
        T.StructField("prob", T.DoubleType(), False),
        T.StructField("quantile_est", T.DoubleType(), False),
        T.StructField("n_sampled", T.LongType(), False),
    ]
)

BKQ_STATE_SCHEMA = T.StructType(
    [
        T.StructField("hs", T.ArrayType(T.LongType()), False),
        T.StructField("vs", T.ArrayType(T.DoubleType()), False),
    ]
)


def sampled_quantiles_stream(
    events: DataFrame,
    value_col: str,
    key_col: str,
    group_col: str,
    probs: list[float],
    k: int = 256,
) -> DataFrame:
    """Streaming quantile estimates per group with BOUNDED state: the
    bottom-k sample (operators/sketches.py:bottomk_sample) as an
    ``applyInPandasWithState`` operator.  State per key is the k
    (hash, value) pairs whose key hash ranks smallest — k structs
    forever, whatever the stream's volume — and each micro-batch emits
    the group's updated quantile estimates (update semantics).

    The k-min closure makes the incremental form EXACT: a streaming
    sample equals ``bottomk_sample`` over everything the stream has
    seen, so the estimates equal the batch ``sampled_quantiles`` output
    bit-for-bit (asserted in tests).  The interpolation replicates
    Spark's ``percentile`` formula operation-for-operation
    (pos=(n-1)p; v_lo*(hi-pos) + v_hi*(pos-lo)) and the 6dp rounding
    uses HALF-UP on the shortest decimal repr — the same bit-level
    parity contract as ``kmv_distinct_stream``.
    """
    import decimal

    from sparkall_spark.operators.sketches import _kmv_hash

    if not probs:
        raise ValueError("probs must be non-empty")
    hashed = events.filter(
        F.col(value_col).isNotNull()
        & F.col(key_col).isNotNull()
        & F.col(group_col).isNotNull()
    ).select(
        F.col(group_col).cast("string").alias("group"),
        _kmv_hash(F.col(key_col).cast("string")).alias("__h"),
        F.col(value_col).cast("double").alias("__v"),
    )

    def _round6(x: float) -> float:
        return float(
            decimal.Decimal(repr(x)).quantize(
                decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
            )
        )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        hs, vs = state.get if state.exists else ([], [])
        pairs = list(zip((int(h) for h in hs), (float(v) for v in vs)))
        for pdf in pdfs:
            pairs.extend(
                (int(h), float(v)) for h, v in zip(pdf["__h"], pdf["__v"])
            )
        pairs.sort()
        pairs = pairs[:k]
        state.update(([h for h, _ in pairs], [v for _, v in pairs]))
        vals = sorted(v for _, v in pairs)
        n = len(vals)
        rows = []
        for p in probs:
            # Spark Percentile formula, operation-for-operation
            pos = (n - 1) * float(p)
            lo, hi = int(math.floor(pos)), int(math.ceil(pos))
            if lo == hi:
                q = vals[lo]
            else:
                q = vals[lo] * (hi - pos) + vals[hi] * (pos - lo)
            rows.append(
                {
                    "group": key[0],
                    "prob": float(p),
                    "quantile_est": _round6(q),
                    "n_sampled": n,
                }
            )
        yield pd.DataFrame(rows, columns=[f.name for f in BKQ_OUT_SCHEMA.fields])

    return hashed.groupBy("group").applyInPandasWithState(
        fn,
        outputStructType=BKQ_OUT_SCHEMA,
        stateStructType=BKQ_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cms_stream(
    events: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Streaming Count-Min sketch: the live counter table (d, bucket,
    cnt) over everything the stream has seen.

    No custom state operator needed — because the CMS key domain is
    BOUNDED (depth * width counters, whatever the item universe), the
    sketch is exactly Spark's own incremental ``groupBy().count()``
    over the bucket tuples: the state store holds at most depth*width
    longs and every micro-batch folds in map-side-combined partials.
    By CMS linearity the running aggregate equals the batch
    ``operators/sketches.cms_sketch`` of the union of all batches
    (asserted in tests), so sketches built online and offline merge
    interchangeably via ``cms_merge``.  Run with ``outputMode("update")``
    (emits changed counters per batch) or ``"complete"``.
    """
    from sparkall_spark.operators.sketches import cms_bucket_array

    v = F.col(value_col).cast("string")
    return (
        events.filter(v.isNotNull())
        .select(
            F.posexplode(cms_bucket_array(v, depth, width)).alias(
                "d", "bucket"
            )
        )
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
