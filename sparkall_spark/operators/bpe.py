"""Byte-pair-encoding tokenizer: distributed frequency collection,
driver-side merge training, Arrow-batched corpus encoding (extension;
no reference analog — the reference has no tokenizer surface at all).

The heuristic ``functions.text.bpe_token_count`` counts GPT-2-style
pre-tokenizer *segments*; this module learns an actual merge table so
packing budgets and per-doc token counts reflect a real vocabulary
(Sennrich et al. 2016, the standard pretraining tokenizer algorithm).

Scale split, by design:

- **Training** never ships documents to the driver.  The corpus
  contributes ONE distributed word-frequency aggregate, truncated to
  the ``max_words`` most frequent words (TakeOrdered heap top-k — no
  global sort); classic BPE then runs on that (word, freq) table
  driver-side, which is the industry-standard shape (tokenizers are
  trained on frequency tables or bounded samples, not streamed
  corpora — the merge loop is inherently sequential).
- **Encoding** is an Arrow-batched ``mapInPandas`` stage — one of the
  package's few deliberate Python data paths (a rank-greedy merge loop
  is not expressible as Column algebra).  The merge table broadcasts
  via task closure; a capacity-capped per-partition cache collapses the Zipf
  distribution (the few thousand frequent words dominate every batch,
  so amortized cost per token is near a dict lookup).

Determinism: sampling is not used anywhere — the frequency table is
exact, ties in pair counts break lexicographically, and encoding is a
pure function of (text, merges) — so retrained tokenizers and re-run
encodes are bit-identical across partitionings and sessions.

Convention: word-internal BPE over whitespace-split, lowercased words,
each carrying an end-of-word marker ``</w>`` (the original NMT-BPE
formulation) — whitespace itself is never merged, so
``concat(tokens) == word + '</w>'`` is an exact per-word invariant
(pinned in tests).
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from sparkall_spark.functions.text import tokens

EOW = "</w>"


def word_frequency_table(
    docs: DataFrame,
    text_col: str = "text",
    max_words: int = 100_000,
) -> DataFrame:
    """Exact ``(word, freq)`` DataFrame of the ``max_words`` most
    frequent lowercased words — ONE map-side-combined aggregate plus a
    TakeOrdered top-k (ties break by word so truncation is stable).
    The distributed half of BPE training, exposed as a relation so it
    can be consumed lazily (and SQL-mirrored: groupBy+count+order+limit
    is plain ANSI); :func:`word_frequencies` collects it for the
    driver-side merge loop."""
    return (
        docs.select(
            F.explode(tokens(F.lower(F.col(text_col)))).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("word").asc())
        .limit(int(max_words))
    )


def word_frequencies(
    docs: DataFrame,
    text_col: str = "text",
    max_words: int = 100_000,
) -> list[tuple[str, int]]:
    """Exact (word, count) pairs for the ``max_words`` most frequent
    lowercased words (see :func:`word_frequency_table`).  This is the
    only corpus-wide pass training needs."""
    rows = word_frequency_table(docs, text_col, max_words).collect()
    return [(r["word"], r["freq"]) for r in rows]


def train_bpe_merges(
    word_freqs: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Classic BPE on a frequency table: repeatedly merge the most
    frequent adjacent symbol pair (ties lexicographic — deterministic),
    ``n_merges`` times or until no pair repeats.  Pure Python on the
    bounded table; cost is O(n_merges * distinct_words)."""
    vocab: dict[tuple[str, ...], int] = {
        tuple(w) + (EOW,): f for w, f in word_freqs if w
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, freq in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += freq
        if not pairs:
            break
        best_count = max(pairs.values())
        if best_count < 2:
            break
        best = min(p for p, c in pairs.items() if c == best_count)
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, freq in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if (
                    i + 1 < len(sym)
                    and sym[i] == best[0]
                    and sym[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + freq
        vocab = new_vocab
    return merges


def train_bpe(
    docs: DataFrame,
    n_merges: int = 1000,
    text_col: str = "text",
    max_words: int = 100_000,
) -> list[tuple[str, str]]:
    """End-to-end training: distributed frequency table → driver-side
    merge loop.  Returns the ordered merge list (rank = position)."""
    return train_bpe_merges(
        word_frequencies(docs, text_col=text_col, max_words=max_words),
        n_merges,
    )


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    sym = list(word) + [EOW]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    emit_tokens: bool = False,
) -> DataFrame:
    """Encode every document under a trained merge table.

    Output: ``(id_col, n_bpe_tokens)`` (+ ``bpe_tokens`` array when
    ``emit_tokens=True`` — keep it off for corpus-scale counting; the
    array column is ~4x the text).  The id column keeps its ORIGINAL
    type (string crawl ids work; no silent long cast).  Word
    segmentation happens Spark-side with the SAME ``tokens(lower())``
    expression training uses, so train and encode can never disagree
    on what a word is (Java ``\\s``/lower vs Python semantics differ
    on exotic Unicode).  Arrow-batched ``mapInPandas``; the merge dict
    rides the task closure and a capacity-capped per-partition word
    cache makes repeated words (Zipf's law: most of every batch) dict
    lookups.  Empty/NULL text encodes to 0 tokens.
    """
    ranks = {pair: i for i, pair in enumerate(merges)}
    id_type = docs.schema[id_col].dataType
    out_fields = [
        StructField("__id_out", id_type),
        StructField("n_bpe_tokens", LongType()),
    ]
    if emit_tokens:
        out_fields.append(StructField("bpe_tokens", ArrayType(StringType())))
    schema = StructType(out_fields)

    def encode(batches) -> Iterator:
        import pandas as pd

        cache: dict[str, list[str]] = {}

        def enc_word(w: str) -> list[str]:
            got = cache.get(w)
            if got is None:
                if len(cache) >= 500_000:
                    # cap per-partition memory on high-vocabulary
                    # corpora; Zipf means the hot head repopulates in
                    # one batch
                    cache.clear()
                got = cache[w] = _encode_word(w, ranks)
            return got

        for pdf in batches:
            ids, counts, toks = [], [], []
            for did, words in zip(pdf["__id"], pdf["__words"]):
                doc_tokens: list[str] = []
                for w in words if words is not None else ():
                    doc_tokens.extend(enc_word(w))
                ids.append(did)
                counts.append(len(doc_tokens))
                if emit_tokens:
                    toks.append(doc_tokens)
            data = {"__id_out": ids, "n_bpe_tokens": counts}
            if emit_tokens:
                data["bpe_tokens"] = toks
            yield pd.DataFrame(data)

    narrow = docs.select(
        F.col(id_col).alias("__id"),
        tokens(F.lower(F.col(text_col))).alias("__words"),
    )
    encoded = narrow.mapInPandas(encode, schema=schema)
    return encoded.select(
        F.col("__id_out").alias(id_col),
        *(
            ["n_bpe_tokens", "bpe_tokens"]
            if emit_tokens
            else ["n_bpe_tokens"]
        ),
    )
