"""Document chunking: sliding token windows over a text column.

The standard pretraining preprocessing step between cleaning/dedup and
tokenizer sharding: split each document into overlapping windows of at
most ``chunk_tokens`` whitespace tokens, advancing by ``stride``
(overlap = chunk_tokens - stride).

100 TB design: pure JVM Column expressions end to end — ``split`` →
``sequence`` of window starts → ``posexplode`` → ``slice`` +
``array_join``.  No UDF, no shuffle (narrow transformation: each
document's chunks are produced where the document lives), no driver
participation; output size is bounded by ceil(n_tokens / stride)
chunks per document.  Composes with the dedup/text operators as a
plain DataFrame→DataFrame stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    stride: int | None = None,
) -> DataFrame:
    """Explode each document into sliding token windows.

    Returns (id_col, chunk_id, chunk_text, n_tokens):
    ``chunk_id`` is the 0-based window index, ``chunk_text`` the
    space-joined window, ``n_tokens`` its true token count (==
    chunk_tokens except possibly the last window).  Empty/whitespace
    documents yield one empty chunk (chunk_id 0, n_tokens 0) so no
    document silently disappears.
    """
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    stride = chunk_tokens if stride is None else stride
    if not 0 < stride <= chunk_tokens:
        raise ValueError("stride must be in (0, chunk_tokens]")

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    # trim('') splits to ['']: normalize to a true empty array
    toks = F.when(
        (F.col(text_col).isNull()) | (F.trim(F.col(text_col)) == ""),
        F.array().cast("array<string>"),
    ).otherwise(toks)
    n = F.size(toks)
    # window starts: 0, stride, 2*stride, ... < n  (>= one window always)
    starts = F.sequence(
        F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride)
    )

    out = (
        df.withColumn("__toks", toks)
        .withColumn("__n", n)
        .select(
            F.col(id_col),
            "__toks",
            "__n",
            F.posexplode(starts).alias("chunk_id", "__start"),
        )
        # slice() is 1-based; windows starting past the end are dropped
        # (sequence's cap already guarantees __start < max(n, 1))
        .withColumn(
            "__win", F.slice("__toks", F.col("__start") + 1, chunk_tokens)
        )
        .select(
            F.col(id_col),
            F.col("chunk_id"),
            F.array_join("__win", " ").alias("chunk_text"),
            F.size("__win").cast("bigint").alias("n_tokens"),
        )
    )
    return out


def _gear_table(seed: int) -> "list[int]":
    """256 deterministic 64-bit gear values from the repo's portable
    LCG (no RNG imports, reproducible everywhere)."""
    vals, h = [], seed or 1
    for _ in range(256):
        # one 64-bit LCG step (Knuth MMIX constants), kept in python ints
        h = (h * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        vals.append(h)
    return vals


def cdc_chunk_payloads(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    avg_size: int = 4096,
    min_size: int | None = None,
    max_size: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Content-defined chunking of BINARY payloads (Gear/FastCDC-style
    rolling hash; Xia et al., USENIX ATC'16): cut where the rolling
    gear hash has ``log2(avg_size)`` low zero bits, yielding chunk
    boundaries that survive insertions/deletions — the property that
    makes byte-level dedup of multimodal blobs work where fixed-size
    blocks would re-shift every boundary downstream of an edit.

    Output: one row per chunk — ``id_col, chunk_idx, offset, length,
    chunk_hash`` (signed 64-bit BLAKE2b of the chunk bytes, computed in
    the same pass, so downstream exact dedup is a plain groupBy on
    ``chunk_hash``).

    Scale shape: ONE Arrow-batched ``mapInPandas`` pass — map-only, no
    shuffle, no join.  The gear scan is vectorized in numpy: h_i
    depends on only the last 64 bytes, so the rolling hash is a sum of
    64 shifted table lookups over the whole buffer (no per-byte
    Python).  Boundaries are deterministic functions of content alone,
    so an insertion re-shifts only the chunks it touches — the CDC
    property fixed-size blocking lacks.
    """
    import hashlib

    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    if avg_size < 64:
        raise ValueError("avg_size must be >= 64")
    min_size = max(1, avg_size // 4) if min_size is None else min_size
    max_size = avg_size * 4 if max_size is None else max_size
    if not (0 < min_size <= avg_size <= max_size):
        raise ValueError("need 0 < min_size <= avg_size <= max_size")
    mask = (1 << max(1, (avg_size).bit_length() - 1)) - 1
    gear = np.array(_gear_table(seed), dtype=np.uint64)

    def _cuts(buf: bytes) -> list[int]:
        n = len(buf)
        b = np.frombuffer(buf, dtype=np.uint8)
        g = gear[b]
        # rolling gear hash h_i = sum_{j<64} gear[b_{i-j}] << j : old
        # bytes shift out of the 64-bit window automatically.  Vector
        # form: 64 shifted adds over the whole array, no python loop.
        h = np.zeros(n, dtype=np.uint64)
        for j in range(min(64, n)):
            h[j:] += g[: n - j] << np.uint64(j)
        content_cuts = [
            int(i) + 1 for i in np.flatnonzero((h & np.uint64(mask)) == 0)
        ]
        out, prev = [0], 0
        for c in content_cuts:
            if c - prev < min_size:
                continue  # too-small chunk: skip this cut point
            while c - prev > max_size:  # fixed fallback cuts
                prev += max_size
                out.append(prev)
            # re-check AFTER forced cuts: a content cut just past a
            # max_size boundary would otherwise emit a sub-min fragment
            if min_size <= c - prev and c < n:
                out.append(c)
                prev = c
        while n - prev > max_size:
            prev += max_size
            out.append(prev)
        return out

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("chunk_idx", T.IntegerType(), False),
            T.StructField("offset", T.LongType(), False),
            T.StructField("length", T.LongType(), False),
            T.StructField("chunk_hash", T.LongType(), False),
        ]
    )

    def _batches(it):
        cols = [id_col, "chunk_idx", "offset", "length", "chunk_hash"]
        for pdf in it:
            rows = []
            for rid, payload in zip(pdf["__cid"], pdf[payload_col]):
                if payload is None:
                    continue
                buf = bytes(payload)
                if not buf:
                    continue
                bounds = _cuts(buf) + [len(buf)]
                for k in range(len(bounds) - 1):
                    o, e = bounds[k], bounds[k + 1]
                    if e <= o:
                        continue
                    dig = hashlib.blake2b(buf[o:e], digest_size=8).digest()
                    rows.append(
                        {
                            id_col: int(rid),
                            "chunk_idx": k,
                            "offset": o,
                            "length": e - o,
                            "chunk_hash": int.from_bytes(
                                dig, "big", signed=True
                            ),
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    src = df.select(
        F.col(id_col).cast("long").alias("__cid"), F.col(payload_col)
    )
    return src.mapInPandas(_batches, schema)
