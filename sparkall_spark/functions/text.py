"""Text-analysis column functions (LLM-data-pipeline extension).

All JVM-side Column expressions — no Python UDFs anywhere (one
documented exception: :func:`compression_ratio`, Arrow-batched because
no JVM zlib Column function exists) — so they stay inside whole-stage
codegen and scale to 100 TB document sets.  Each function returns a
Column usable in select/filter/groupBy.

Design note: everything here must be *mirrorable in ANSI SQL* (the
DuckDB oracle), so hashes are explicit polynomial formulas rather than
engine-specific hash builtins, with a modulus to keep both engines in
non-overflowing bigint range.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

FP_MOD = 1_000_000_007  # keeps acc*31+c within bigint on both engines


def tokens(col: Column | str) -> Column:
    """Non-empty whitespace-separated tokens."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda x: x != "")


def let_bound(bound: Column, body) -> Column:
    """Evaluate ``bound`` ONCE per row and pass it to ``body`` as a
    lambda variable (a Catalyst "let" binding via a single-element
    ``transform``).

    Plain Column references are expression-tree SUBSTITUTION: every use
    site re-evaluates the expression.  A composite like ``word_ngrams``
    that references its token array per output element goes quadratic
    in token count that way (measured ~7s serial for 5,000 short docs).
    Lambda variables, by contrast, are bound values — evaluated once.
    """
    return F.transform(F.array(bound), body)[0]


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def distinct_token_count(col: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(col)))


def char_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c)


def punct_ratio(col: Column | str) -> Column:
    """Punctuation chars / total chars (0.0 for empty strings)."""
    c = F.col(col) if isinstance(col, str) else col
    puncts = F.length(F.regexp_replace(c, r"[^.,;:!?'\"()\[\]-]", ""))
    return F.when(F.length(c) > 0, puncts / F.length(c)).otherwise(F.lit(0.0))


def uppercase_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    uppers = F.length(F.regexp_replace(c, r"[^A-Z]", ""))
    return F.when(F.length(c) > 0, uppers / F.length(c)).otherwise(F.lit(0.0))


def mean_token_length(col: Column | str) -> Column:
    toks = tokens(col)
    return F.when(
        F.size(toks) > 0,
        F.aggregate(toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t))
        / F.size(toks),
    ).otherwise(F.lit(0.0))


# tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic; intentionally small + frozen so results are reproducible
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"],
    "es": ["el", "la", "los", "de", "que", "y", "en", "un", "es", "por"],
}


def stopword_hits(col: Column | str, lang: str) -> Column:
    """How many tokens are stopwords of ``lang``."""
    toks = tokens(F.lower(F.col(col) if isinstance(col, str) else col))
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))


def lang_id(col: Column | str, langs: tuple[str, ...] = ("en", "de", "fr", "es")) -> Column:
    """Argmax of stopword hits; 'und' (undetermined) when all zero.

    Ties break by the order of ``langs`` (first wins), which keeps the
    result deterministic and mirrorable in a SQL CASE chain.
    """
    hits = {lang: stopword_hits(col, lang) for lang in langs}
    best = F.lit("und")
    best_hits = F.lit(-1)
    for lang in langs:
        better = hits[lang] > best_hits
        best = F.when(better, F.lit(lang)).otherwise(best)
        best_hits = F.when(better, hits[lang]).otherwise(best_hits)
    return F.when(best_hits > 0, best).otherwise(F.lit("und"))


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: favors medium-length docs with
    low punctuation noise and a healthy distinct-token ratio."""
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count(c)
    length_ok = F.when((n_tok >= 10) & (n_tok <= 100000), F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    diversity = F.when(
        n_tok > 0, distinct_token_count(c) / n_tok
    ).otherwise(F.lit(0.0))
    punct_ok = F.lit(1.0) - F.least(punct_ratio(c) * 5, F.lit(1.0))
    return F.round((length_ok + diversity + punct_ok) / 3, 6)


# GPT-2-style pre-tokenizer segmentation (contractions, space-prefixed
# letter/digit/punctuation runs, whitespace runs).  Deliberately restricted
# to syntax RE2 also supports (no lookahead) so DuckDB oracles can mirror
# the count with regexp_extract_all on the identical pattern.
BPE_SEGMENT_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count(col: Column | str) -> Column:
    """Subword-ish token count: number of GPT-2 pre-tokenizer segments.

    A cheap JVM-side (regexp_count, no UDF) proxy for BPE token counts —
    the segment count upper-bounds and tracks real BPE vocab counts
    closely enough for length filtering and cost estimation at corpus
    scale."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_SEGMENT_PATTERN))


def duplicate_line_ratio(col: Column | str) -> Column:
    """Fraction of non-empty (trimmed) lines that repeat an earlier line
    — the Gopher-style boilerplate/repetition signal.  0.0 for documents
    with no non-empty lines."""
    ls = _nonempty_lines(col)
    return F.when(
        F.size(ls) > 0,
        F.lit(1.0) - F.size(F.array_distinct(ls)) / F.size(ls),
    ).otherwise(F.lit(0.0))


def duplicate_ngram_ratio(col: Column | str, n: int = 2) -> Column:
    """Fraction of word n-grams that repeat an earlier n-gram (Gopher's
    duplicate-n-gram filter signal).  Total n-grams is ``tokens - n + 1``;
    documents with fewer than ``n`` tokens score 0.0."""
    total = token_count(col) - (n - 1)
    distinct = F.size(word_ngrams(col, n))
    return F.when(
        total > 0, F.lit(1.0) - distinct / total
    ).otherwise(F.lit(0.0))


def _nonempty_lines(col: Column | str) -> Column:
    """Trimmed non-empty lines; splits on ``\\r?\\n`` AND strips any
    remaining trailing ``\\r`` (e.g. ``...\\r\\r\\n``) so no line ever
    carries a carriage return — trim strips spaces only in Spark and
    DuckDB, and Java's ``$`` matches before a final ``\\r`` while RE2's
    does not, so a surviving CR would split the engines."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.transform(
            F.split(c, r"\r?\n"),
            lambda x: F.trim(F.regexp_replace(x, r"\r+$", "")),
        ),
        lambda x: x != "",
    )


def bullet_line_ratio(col: Column | str) -> Column:
    """Fraction of non-empty lines starting with a bullet marker
    (``-``, ``*``, ``•`` or a ``1.``-style ordinal) — Gopher drops docs
    where most lines are bullets (nav menus, scraped lists).  0.0 when
    there are no non-empty lines."""
    ls = _nonempty_lines(col)
    bullets = F.size(
        F.filter(ls, lambda x: x.rlike(r"^(?:[-*•]|\d{1,3}[.)])\s"))
    )
    return F.when(F.size(ls) > 0, bullets / F.size(ls)).otherwise(F.lit(0.0))


def ellipsis_line_ratio(col: Column | str) -> Column:
    """Fraction of non-empty lines ending in an ellipsis (``...`` or
    ``…``) — Gopher's truncated-snippet signal (search-result and
    teaser pages).  0.0 when there are no non-empty lines."""
    ls = _nonempty_lines(col)
    trunc = F.size(
        F.filter(ls, lambda x: x.rlike(r"(?:\.\.\.|…)$"))
    )
    return F.when(F.size(ls) > 0, trunc / F.size(ls)).otherwise(F.lit(0.0))


def alpha_word_ratio(col: Column | str) -> Column:
    """Fraction of whitespace tokens containing at least one ASCII
    letter — Gopher requires ~80%+ (drops number/symbol soup like
    tables and hex dumps).  0.0 for token-less documents."""
    toks = tokens(col)
    alpha = F.size(F.filter(toks, lambda x: x.rlike(r"[A-Za-z]")))
    return F.when(
        F.size(toks) > 0, alpha / F.size(toks)
    ).otherwise(F.lit(0.0))


def symbol_word_ratio(col: Column | str) -> Column:
    """Hash/ellipsis symbols per whitespace token (Gopher caps this at
    ~0.1 — markdown artifacts, templating debris).  0.0 for token-less
    documents."""
    c = F.col(col) if isinstance(col, str) else col
    # count '#' and '…' chars plus literal '...' runs as one symbol each
    hashes = F.length(F.regexp_replace(c, r"[^#…]", ""))
    dots = F.size(F.regexp_extract_all(c, F.lit(r"(\.\.\.)"), 1))
    n = token_count(col)
    return F.when(n > 0, (hashes + dots) / n).otherwise(F.lit(0.0))


def hash_word_ratio(col: Column | str) -> Column:
    """'#' characters per whitespace token — one of Gopher Table A1's
    two per-symbol ratios (each capped at 0.1 SEPARATELY; the combined
    :func:`symbol_word_ratio` is a stricter variant kept as its own
    signal column).  0.0 for token-less documents."""
    c = F.col(col) if isinstance(col, str) else col
    hashes = F.length(F.regexp_replace(c, r"[^#]", ""))
    n = token_count(col)
    return F.when(n > 0, hashes / n).otherwise(F.lit(0.0))


def ellipsis_word_ratio(col: Column | str) -> Column:
    """Ellipses ('…' chars plus literal '...' runs) per whitespace
    token — the other Gopher Table A1 per-symbol ratio.  0.0 for
    token-less documents."""
    c = F.col(col) if isinstance(col, str) else col
    ell = F.length(F.regexp_replace(c, r"[^…]", "")) + F.size(
        F.regexp_extract_all(c, F.lit(r"(\.\.\.)"), 1)
    )
    n = token_count(col)
    return F.when(n > 0, ell / n).otherwise(F.lit(0.0))


# Gopher's stop-word must-contain list (Rae et al. 2021, Table A1:
# "contains at least two of the following English words") — distinct
# from the lang-id STOPWORDS lists, which are a different heuristic.
GOPHER_STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_stop_hits(col: Column | str) -> Column:
    """How many tokens are Gopher must-contain stop words."""
    toks = tokens(F.lower(F.col(col) if isinstance(col, str) else col))
    sw = F.array(*[F.lit(w) for w in GOPHER_STOP_WORDS])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))


def gopher_quality_keep(
    col: Column | str,
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.90,
    max_ellipsis_ratio: float = 0.30,
    min_alpha_ratio: float = 0.80,
    min_stop_hits: int = 2,
) -> Column:
    """Gopher's document QUALITY filter as one boolean Column (Rae et
    al. 2021, Table A1 thresholds as defaults): word count bounds, mean
    word length bounds, symbol-to-word cap, bullet/ellipsis line caps,
    alphabetic-word floor, and the two-stop-words requirement.

    The REPETITION half of the Gopher table (duplicate line/paragraph
    ratios and char fractions, top/duplicate n-gram char fractions) is
    deliberately separate: those signals are expensive array passes that
    pipelines compute once as columns (see the e10 projection) and AND
    together — re-deriving them inside this predicate would double the
    work.  Full Gopher = ``gopher_quality_keep AND`` the repetition
    thresholds over the signal columns."""
    n = token_count(col)
    ml = mean_token_length(col)
    return (
        (n >= F.lit(int(min_words)))
        & (n <= F.lit(int(max_words)))
        & (ml >= F.lit(float(min_mean_word_len)))
        & (ml <= F.lit(float(max_mean_word_len)))
        # Gopher caps the hash ratio and the ellipsis ratio at 0.1 EACH
        # (Table A1: "symbol-to-word ratio greater than 0.1 for either
        # the hash symbol or ellipsis") — not their sum, which would be
        # stricter than the published filter (ADVICE r6).
        & (hash_word_ratio(col) <= F.lit(float(max_symbol_ratio)))
        & (ellipsis_word_ratio(col) <= F.lit(float(max_symbol_ratio)))
        & (bullet_line_ratio(col) <= F.lit(float(max_bullet_ratio)))
        & (ellipsis_line_ratio(col) <= F.lit(float(max_ellipsis_ratio)))
        & (alpha_word_ratio(col) >= F.lit(float(min_alpha_ratio)))
        & (gopher_stop_hits(col) >= F.lit(int(min_stop_hits)))
    )


# C4 line-keep rules (Raffel et al. 2020, §2.2): a line survives iff it
# ends in terminal punctuation (period / ! / ? / end-quote), has at
# least three words, and does not contain the word "javascript".
_C4_LINE_END_RE = "[.!?\"']$"


def c4_kept_lines(col: Column | str) -> Column:
    """The lines of a document that pass C4's line rules."""
    ls = _nonempty_lines(col)
    return F.filter(
        ls,
        lambda ln: ln.rlike(_C4_LINE_END_RE)
        & (F.size(F.filter(F.split(ln, r"\s+"), lambda x: x != "")) >= 3)
        & ~F.lower(ln).contains("javascript"),
    )


def c4_clean_lines(col: Column | str) -> Column:
    """C4 line-level cleaning: the surviving lines re-joined with \\n
    (empty string when nothing survives)."""
    return F.array_join(c4_kept_lines(col), "\n")


def c4_keep(
    col: Column | str,
    *,
    min_sentences: int = 5,
    banned: tuple[str, ...] = ("lorem ipsum", "{"),
) -> Column:
    """C4's document filter: the line-cleaned text must contain at
    least ``min_sentences`` sentence terminators ([.!?] occurrences —
    every kept line ends in one, intra-line sentences also count), and
    the RAW text must contain none of the ``banned`` substrings
    (case-insensitive; paper defaults "lorem ipsum" and "{").  The
    paper's bad-words list is a parameter, not shipped.  C4's
    three-sentence-span dedup is the exact-substring operator's job
    (operators/substrings.py), not this predicate's."""
    c = F.col(col) if isinstance(col, str) else col
    clean = c4_clean_lines(col)
    n_sent = F.size(F.regexp_extract_all(clean, F.lit(r"[.!?]"), 0))
    keep = n_sent >= F.lit(int(min_sentences))
    for b in banned:
        keep = keep & ~F.lower(c).contains(b.lower())
    return keep


# --- DuckDB mirrors of the filter predicates (same pattern as
# html_to_text_sql: the SQL builder lives next to the Column builder so
# the two evolve together) ---------------------------------------------

_LINES_FRAGMENT_SQL = (
    "list_filter(list_transform(regexp_split_to_array({src}, '\\r?\\n'),"
    " x -> trim(regexp_replace(x, '\\r+$', ''))), x -> x <> '')"
)


def c4_kept_lines_sql(src: str) -> str:
    """DuckDB mirror of :func:`c4_kept_lines` over SQL expression
    ``src``."""
    lines = _LINES_FRAGMENT_SQL.format(src=src)
    # tagged dollar-quote ($re$...$re$): the pattern contains both quote
    # characters AND a trailing '$', which a bare $$...$$ would swallow
    return (
        f"list_filter({lines}, ln -> "
        "regexp_matches(ln, $re$[.!?\"']$$re$) AND "
        "len(list_filter(regexp_split_to_array(ln, '\\s+'), x -> x <> '')) >= 3 "
        "AND NOT contains(lower(ln), 'javascript'))"
    )


def c4_clean_lines_sql(src: str) -> str:
    # DuckDB's array_to_string([]) is NULL where Spark's array_join is
    # ''; coalesce only under non-NULL input so NULL text still mirrors
    return (
        f"CASE WHEN {src} IS NULL THEN NULL "
        f"ELSE coalesce(array_to_string({c4_kept_lines_sql(src)}, chr(10)), '') END"
    )


def gopher_stop_hits_sql(src: str) -> str:
    words = ", ".join(f"'{w}'" for w in GOPHER_STOP_WORDS)
    return (
        f"len(list_filter(list_filter(regexp_split_to_array(lower({src}),"
        f" '\\s+'), x -> x <> ''), x -> list_contains([{words}], x)))"
    )


def _nonempty_paragraphs(col: Column | str) -> Column:
    """Trimmed non-empty paragraphs: blocks separated by a blank line
    (``\\n`` + optional whitespace + ``\\n``).  Internal single newlines
    stay inside their paragraph.  Both Java and RE2 resolve
    ``\\n\\s*\\n`` greedily over runs of blank lines, so the split is
    engine-identical."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.transform(F.split(c, r"\n\s*\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )


def _dup_char_fraction(parts: Column) -> Column:
    """Fraction of characters in repeated occurrences of the parts: each
    distinct part's first occurrence is 'original', every further
    occurrence contributes its full length to the numerator."""
    total = F.aggregate(
        parts, F.lit(0).cast("bigint"), lambda a, x: a + F.length(x)
    )
    firsts = F.aggregate(
        F.array_distinct(parts),
        F.lit(0).cast("bigint"),
        lambda a, x: a + F.length(x),
    )
    return F.when(total > 0, (total - firsts) / total).otherwise(F.lit(0.0))


def duplicate_line_char_fraction(col: Column | str) -> Column:
    """Gopher repetition signal: fraction of characters sitting in
    duplicated (non-first occurrence) trimmed non-empty lines — the
    CHAR-fraction companion of :func:`duplicate_line_ratio` (Gopher
    threshold 0.20 vs 0.30 for the count fraction)."""
    return _dup_char_fraction(_nonempty_lines(col))


def duplicate_paragraph_ratio(col: Column | str) -> Column:
    """Fraction of non-empty paragraphs that repeat an earlier paragraph
    (Gopher threshold 0.30).  0.0 for documents with no paragraphs."""
    ps = _nonempty_paragraphs(col)
    return F.when(
        F.size(ps) > 0,
        F.lit(1.0) - F.size(F.array_distinct(ps)) / F.size(ps),
    ).otherwise(F.lit(0.0))


def duplicate_paragraph_char_fraction(col: Column | str) -> Column:
    """Fraction of characters in duplicated paragraphs (Gopher
    threshold 0.20)."""
    return _dup_char_fraction(_nonempty_paragraphs(col))


def all_word_ngrams(toks: Column, n: int) -> Column:
    """Every word n-gram in order (NOT distinct), space-joined; empty
    array when there are fewer than ``n`` tokens."""
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))


def top_ngram_char_fraction(col: Column | str, n: int) -> Column:
    """Gopher repetition signal: fraction of characters contained in the
    most frequently-occurring word ``n``-gram (thresholds: 0.20 for
    n=2, 0.18 for n=3, 0.16 for n=4).

    Characters are counted over lowercase whitespace TOKENS only (the
    gram's inter-token spaces and the document's whitespace are excluded
    from numerator and denominator alike), which keeps the value
    identical across engines regardless of whitespace normalization.
    Ties on the occurrence count break toward the LONGEST tied gram
    (the maximal-coverage reading of the paper's definition), so the
    result is deterministic and SQL-mirrorable.  0.0 when the document
    has fewer than ``n`` tokens.

    Convenience form for small inputs/tests ONLY: it inlines the token
    and gram subtrees, and Spark's higher-order lambdas re-evaluate
    referenced SUBTREES once per element — the per-distinct-gram filter
    re-splits the whole document O(d) times (measured: ~10 CPU-minutes
    for 500 docs x 7 signals).  Corpus runs must precompute the arrays
    as real columns and use :func:`top_ngram_char_fraction_over`, where
    the lambda reads a bound attribute instead."""
    toks = tokens(F.lower(F.col(col) if isinstance(col, str) else col))
    return top_ngram_char_fraction_over(toks, all_word_ngrams(toks, n), n)


def top_ngram_char_fraction_over(toks: Column, grams: Column, n: int) -> Column:
    """Attribute form of :func:`top_ngram_char_fraction`: ``toks`` =
    lowercase whitespace tokens, ``grams`` = ``all_word_ngrams(toks,
    n)`` — BOTH should be precomputed columns (``withColumn``), so each
    lambda element scans a materialized array instead of re-evaluating
    the construction subtree."""
    dg = F.array_distinct(grams)
    # (count, token-chars) per distinct gram; the winner is the LAST
    # element under lexicographic struct ordering — both Spark and
    # DuckDB sort arrays of structs field-by-field, which implements
    # the max-count / longest-tie rule without re-evaluating a
    # loop-invariant max inside a lambda (higher-order lambdas re-run
    # referenced subtrees per element, an O(d^2 m) trap).
    pairs = F.transform(
        dg,
        lambda d: F.struct(
            F.size(F.filter(grams, lambda x: x == d)).alias("c"),
            (F.length(d) - F.lit(n - 1)).alias("l"),
        ),
    )
    top = F.element_at(F.array_sort(pairs), -1)
    denom = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda a, x: a + F.length(x)
    )
    return F.when(
        (F.size(grams) > 0) & (denom > 0), top["c"] * top["l"] / denom
    ).otherwise(F.lit(0.0))


def duplicate_ngram_char_fraction(col: Column | str, n: int) -> Column:
    """Gopher repetition signal: fraction of characters covered by word
    ``n``-grams that occur more than once (thresholds 0.15..0.10 for
    n=5..10).  Overlap-aware: a token position covered by several
    duplicated grams is counted ONCE — the union-of-spans semantics of
    the paper, not the sum-over-grams approximation.

    Characters are counted over lowercase whitespace tokens only (same
    convention as :func:`top_ngram_char_fraction`).  0.0 when the
    document has fewer than ``n`` tokens.

    Convenience form for small inputs/tests ONLY (see the subtree
    re-evaluation warning on :func:`top_ngram_char_fraction`); corpus
    runs use :func:`duplicate_ngram_char_fraction_over`."""
    toks = tokens(F.lower(F.col(col) if isinstance(col, str) else col))
    return duplicate_ngram_char_fraction_over(
        toks, all_word_ngrams(toks, n), n
    )


def duplicate_ngram_char_fraction_over(
    toks: Column, grams: Column, n: int
) -> Column:
    """Attribute form of :func:`duplicate_ngram_char_fraction` over
    precomputed token/gram columns."""
    m = F.size(grams)
    # token positions covered by duplicated grams, as a flattened
    # distinct index set: gram i (occurring >1 times) covers tokens
    # [i, i+n-1].  This shape evaluates the O(m^2) duplicate test ONCE
    # per start position — a per-covered-token `dup` array lookup would
    # re-evaluate the whole dup array per token (HOF lambdas re-run
    # referenced subtrees per element: measured minutes-per-500-docs).
    covered_idx = F.array_distinct(
        F.flatten(
            F.transform(
                F.sequence(F.lit(1), F.greatest(m, F.lit(1))),
                lambda i: F.when(
                    (i <= m)
                    & (
                        F.size(
                            F.filter(
                                grams,
                                lambda x: x == F.element_at(grams, i),
                            )
                        )
                        > 1
                    ),
                    F.sequence(i, i + F.lit(n - 1)),
                ).otherwise(F.array().cast("array<int>")),
            )
        )
    )
    covered_chars = F.aggregate(
        covered_idx,
        F.lit(0).cast("bigint"),
        lambda a, j: a + F.length(F.element_at(toks, j)),
    )
    denom = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda a, x: a + F.length(x)
    )
    return F.when(
        (m > 0) & (denom > 0), covered_chars / denom
    ).otherwise(F.lit(0.0))


def fingerprint(col: Column | str) -> Column:
    """Deterministic rolling polynomial hash of the *normalized* text
    (lowercased, whitespace collapsed): acc = (acc*31 + ascii(char)) % p.

    Engine-portable (no xxhash/murmur): the same formula runs in any
    ANSI-SQL engine, which is what makes cross-engine dedup joins and
    oracle checks possible.
    """
    c = F.col(col) if isinstance(col, str) else col
    norm = F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")
    chars = F.split(norm, "")
    return F.aggregate(
        F.filter(chars, lambda x: x != ""),
        F.lit(0).cast("bigint"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % FP_MOD,
    )


def token_fingerprints(col: Column | str) -> Column:
    """Per-token rolling polynomial hashes of the lowercased tokens:
    for each token, acc = (acc*31 + ascii(char)) % p over its chars.

    The per-token analog of :func:`fingerprint` — engine-portable, so
    operators built on it (e.g. the oracle-checked SimHash entry) can be
    mirrored in ANSI SQL."""
    toks = tokens(F.lower(F.col(col) if isinstance(col, str) else col))
    return F.transform(
        toks,
        lambda t: F.aggregate(
            F.filter(F.split(t, ""), lambda x: x != ""),
            F.lit(0).cast("bigint"),
            lambda acc, ch: (acc * 31 + F.ascii(ch)) % FP_MOD,
        ),
    )


def char_ngrams(col: Column | str, n: int = 5) -> Column:
    """Distinct character n-grams of the normalized text (shingles).

    Strings shorter than ``n`` yield an empty array (not a truncated
    whole-string shingle): F.sequence(1, 0) would produce the descending
    [1, 0], and substr(0, ...) aliases substr(1, ...), silently inflating
    Jaccard similarity between short documents.
    """
    c = F.col(col) if isinstance(col, str) else col
    norm = F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")
    idx = F.when(
        F.length(norm) >= n, F.sequence(F.lit(1), F.length(norm) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.array_distinct(F.transform(idx, lambda i: norm.substr(i, F.lit(n))))


def word_ngrams(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-grams (joined by single spaces).

    Documents with fewer than ``n`` tokens yield an empty array; an
    unguarded F.sequence(0, size-n) would produce [0, -1] and F.slice
    with start 0 raises INVALID_PARAMETER_VALUE.START at runtime.
    """
    raw = tokens(F.lower(F.col(col) if isinstance(col, str) else col))

    def body(toks: Column) -> Column:
        idx = F.when(
            F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
        ).otherwise(F.array().cast("array<int>"))
        return F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
        )

    # let-bind the token array: referencing `raw` directly would
    # re-split the text once per output n-gram (quadratic in tokens)
    return let_bound(raw, body)


def token_set(col: Column | str) -> Column:
    """Sorted distinct lowercase tokens — the unit set for Jaccard."""
    return F.array_sort(
        F.array_distinct(tokens(F.lower(F.col(col) if isinstance(col, str) else col)))
    )


# --- PII detection / redaction (r4) ---------------------------------------
#
# Pretraining corpora are scrubbed of obvious PII before packing.  These
# are pure Column expressions (regexp_*, zero UDFs) using a regex subset
# that parses identically under Java regex (Spark) and RE2 (DuckDB), so
# tests mirror every pattern cross-engine.  Pattern scope is the
# standard high-precision trio — emails, international-ish phone
# numbers, IPv4 addresses — NOT an anonymization guarantee (that needs
# NER); the operator contract is deterministic masking of the
# unambiguous shapes.

PII_PATTERNS = {
    # local@domain.tld — conservative: requires a dot in the domain
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # +country / (area) / separator-tolerant (space, dash, parens —
    # deliberately NOT '.', which would swallow IPv4 dotted quads)
    "phone": r"\+?[0-9][0-9()\- ]{7,18}[0-9]",
    # IPv4 dotted quad (word-bounded; over-matching octets >255 is fine
    # for redaction purposes)
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def pii_count(col: Column | str, kind: str) -> Column:
    """How many matches of one PII pattern the text contains."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(PII_PATTERNS[kind]), F.lit(0)))


def redact_pii(
    col: Column | str, kinds: tuple[str, ...] = ("email", "phone", "ipv4")
) -> Column:
    """Replace each PII match with its ``[KIND]`` placeholder.

    Email first: an address's domain must not be half-eaten by the
    phone pattern's digit runs.  Deterministic, single projection —
    Catalyst fuses the chained regexp_replace calls into one
    whole-stage-codegen pass over the text.
    """
    c = F.col(col) if isinstance(col, str) else col
    for kind in kinds:
        c = F.regexp_replace(c, PII_PATTERNS[kind], f"[{kind.upper()}]")
    return c


def extract_urls(col: Column | str) -> Column:
    """Distinct http(s) URLs in the text (scheme://host/path...)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_distinct(
        F.regexp_extract_all(
            c, F.lit(r"https?://[A-Za-z0-9.-]+(?:/[^\s]*)?"), F.lit(0)
        )
    )


def url_domains(col: Column | str) -> Column:
    """Distinct lowercase registrable hosts of the text's URLs — the
    unit for domain-level corpus filtering (blocklists, per-domain
    caps).  Column-only: extract -> transform -> distinct."""
    return F.array_distinct(
        F.transform(
            extract_urls(col),
            lambda u: F.lower(
                F.regexp_extract(u, r"https?://([A-Za-z0-9.-]+)", 1)
            ),
        )
    )


def vocabulary(
    df, text_col: str = "text", min_count: int = 1, max_size: int | None = None
):
    """Corpus vocabulary: one row per distinct lowercase token with
    ``count`` (total occurrences) and ``doc_freq`` (documents containing
    it), ordered by count desc, token asc (deterministic ties).

    Two token-keyed aggregations (occurrences; per-doc distinct
    presence) joined on the token — both shuffle vocabulary-sized keys
    with map-side combine, never (token, doc) pairs to the driver;
    ``max_size`` caps the result via TakeOrdered (no full sort
    materialization).
    """
    toks = df.select(
        F.explode(tokens(F.lower(F.col(text_col)))).alias("token")
    )
    # doc_freq needs per-document distinct tokens; recompute from the
    # source row rather than shuffling (token, doc) pairs twice
    per_doc = df.select(
        F.explode(
            F.array_distinct(tokens(F.lower(F.col(text_col))))
        ).alias("token")
    )
    counts = toks.groupBy("token").agg(F.count("*").alias("count"))
    dfreq = per_doc.groupBy("token").agg(F.count("*").alias("doc_freq"))
    out = (
        counts.join(dfreq, "token")
        .filter(F.col("count") >= min_count)
        .orderBy(F.col("count").desc(), F.col("token").asc())
    )
    return out.limit(max_size) if max_size else out


def tfidf_top_terms(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    n_docs: int | None = None,
):
    """Top-``k`` TF-IDF terms per document: ``(id, token, tf, score,
    rank)`` with smoothed IDF ``ln((N+1)/(df+1)) + 1``.

    Two shuffles — (doc, token) term frequencies, then the per-doc
    top-k window — plus a broadcast-joined doc-frequency table (distinct
    tokens are vocabulary-scale, far smaller than the corpus).  Ties
    break by token asc, so results are deterministic and
    oracle-comparable.  ``n_docs`` skips the counting job when the
    caller already knows the corpus size.
    """
    if n_docs is None:
        n_docs = df.count()  # one metadata-scale job
    from pyspark.sql import Window

    tf = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("token"),
        )
        .groupBy("id", "token")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = (
        df.select(
            F.explode(
                F.array_distinct(tokens(F.lower(F.col(text_col))))
            ).alias("token")
        )
        .groupBy("token")
        .agg(F.count("*").alias("doc_freq"))
    )
    idf = F.log((F.lit(float(n_docs)) + 1) / (F.col("doc_freq") + 1)) + 1
    scored = tf.join(F.broadcast(dfreq), "token").withColumn(
        "score", F.round(F.col("tf") * idf, 6)
    )
    w = Window.partitionBy("id").orderBy(
        F.col("score").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("id").alias(id_col), "token", "tf", "score", "rank")
    )


# --- HTML -> text extraction (r4) -----------------------------------------
#
# The step between WARC ingestion (sources/warc.py) and the document
# pipeline.  Pure Column regexp chain — zero UDFs, whole-stage codegen —
# restricted to the Java-regex/RE2-common subset so DuckDB oracles can
# mirror every pattern with regexp_replace(..., 'g').  This is
# readability-lite (main-content detection needs DOM analysis); the
# contract is deterministic, boilerplate-safe markup removal.

_HTML_STRIP = [
    # script/style/head blocks and comments go first: their contents are
    # not text.  (?is) = case-insensitive + dotall in both engines.
    (r"(?is)<script\b[^>]*>.*?</script>", " "),
    (r"(?is)<style\b[^>]*>.*?</style>", " "),
    (r"(?is)<head\b[^>]*>.*?</head>", " "),
    (r"(?s)<!--.*?-->", " "),
    # block-level closers/breaks become newlines so words don't fuse
    (r"(?i)<(?:br|hr)\s*/?>", "\n"),
    (r"(?i)</(?:p|div|li|ul|ol|h[1-6]|tr|table|blockquote|section|article)>", "\n"),
    # every remaining tag vanishes
    (r"(?s)<[^>]*>", " "),
]
# &amp; decodes LAST (standard unescape order): decoding it first
# double-decodes escaped entities — '&amp;lt;div&amp;gt;' renders as the
# literal text '&lt;div&gt;' and must extract as that, not as '<div>'
# (ADVICE r4).  The SQL mirror shares this list, so both engines agree.
_HTML_ENTITIES = [
    ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'"), ("&amp;", "&"),
]


def html_to_text(col: Column | str) -> Column:
    """Markup-stripped text of an HTML column: scripts/styles/comments
    removed, block boundaries become newlines, tags dropped, the common
    named entities decoded, whitespace normalized (runs of spaces/tabs
    collapse; >=3 newlines collapse to a paragraph break; trimmed)."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, rep in _HTML_STRIP:
        c = F.regexp_replace(c, pat, rep)
    for ent, rep in _HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    c = F.regexp_replace(c, r"[ \t\f]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n{3,}", "\n\n")
    # trim() strips spaces only; newlines at the edges need the regex
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def html_to_text_sql(src: str) -> str:
    """The identical chain as one DuckDB SQL expression (test oracles)."""
    out = src
    for pat, rep in _HTML_STRIP:
        # DuckDB regular string literals pass backslashes through
        # verbatim (no escape processing), so the Java-regex pattern
        # text is reused as-is; only quotes need doubling.
        p = pat.replace("'", "''")
        r = rep.replace("\n", "' || chr(10) || '")
        out = f"regexp_replace({out}, '{p}', '{r}', 'g')"
    for ent, rep in _HTML_ENTITIES:
        r = rep.replace("'", "''")
        out = f"replace({out}, '{ent}', '{r}')"
    out = f"regexp_replace({out}, '[ \\t\\f]+', ' ', 'g')"
    out = f"regexp_replace({out}, ' ?\\n ?', chr(10), 'g')"
    out = f"regexp_replace({out}, '\\n{{3,}}', chr(10) || chr(10), 'g')"
    return f"regexp_replace({out}, '^\\s+|\\s+$', '', 'g')"


def canonical_url(col: Column | str) -> Column:
    """Canonical form of a URL column for URL-level dedup (r5):

    - lowercase scheme + host; strip a single trailing ``.`` on host
    - drop the fragment (``#...``)
    - drop default ports (``:80`` for http, ``:443`` for https)
    - drop tracking query params (``utm_*``, ``fbclid``, ``gclid``,
      ``ref``), keeping the rest of the query in original order
    - collapse duplicate slashes in the path; strip one trailing ``/``
      from a non-root path

    Pure Column regexp chain (one codegen pass), mirrored in SQL by
    :func:`canonical_url_sql` — keep both in lockstep.
    """
    raw = F.col(col) if isinstance(col, str) else col
    # lowercase scheme://host[:port] prefix only (path/query keep case);
    # inputs without a scheme://host shape pass through untouched
    head = F.regexp_extract(raw, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    c = F.concat(
        F.lower(head),
        F.regexp_extract(raw, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1),
    )
    c = F.regexp_replace(c, r"#.*$", "")  # fragment
    # RE2-compatible everywhere (the SQL mirror runs on DuckDB/RE2):
    # no lookarounds — trailing context is captured and re-emitted
    c = F.regexp_replace(c, r"^(http://[^/?#]*):80($|[/?].*)", "$1$2")
    c = F.regexp_replace(c, r"^(https://[^/?#]*):443($|[/?].*)", "$1$2")
    c = F.regexp_replace(c, r"^([a-z]+://[^/?#]*?)\.($|[/?].*)", "$1$2")
    # tracking params (leading or mid-query), then dangling separators
    c = F.regexp_replace(
        c, r"([?&])(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)=[^&#]*", "$1"
    )
    c = F.regexp_replace(c, r"\?&+", "?")
    c = F.regexp_replace(c, r"&&+", "&")
    c = F.regexp_replace(c, r"[?&]$", "")
    # path cleanup: duplicate slashes (never the scheme's, guarded by
    # the preceding char), then one trailing slash before query/end
    c = F.regexp_replace(c, r"([^:/])//+", "$1/")
    c = F.regexp_replace(c, r"^([a-z]+:/[^?#]+?)/(\?.*)?$", "$1$2")
    return F.when(head != "", c).otherwise(raw)


def canonical_url_sql(src: str) -> str:
    """DuckDB mirror of :func:`canonical_url` (same RE2-compatible
    replacement chain — keep in lockstep)."""
    head = f"regexp_extract({src}, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1)"
    c = (
        f"concat(lower({head}),"
        f" regexp_extract({src},"
        f" '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$', 1))"
    )
    steps = [
        (r"#.*$", ""),
        (r"^(http://[^/?#]*):80($|[/?].*)", r"\1\2"),
        (r"^(https://[^/?#]*):443($|[/?].*)", r"\1\2"),
        (r"^([a-z]+://[^/?#]*?)\.($|[/?].*)", r"\1\2"),
        (r"([?&])(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)=[^&#]*", r"\1"),
        (r"\?&+", "?"),
        (r"&&+", "&"),
        (r"[?&]$", ""),
        (r"([^:/])//+", r"\1/"),
        (r"^([a-z]+:/[^?#]+?)/(\?.*)?$", r"\1\2"),
    ]
    for pat, rep in steps:
        p = pat.replace("'", "''")
        c = f"regexp_replace({c}, '{p}', '{rep}', 'g')"
    return f"CASE WHEN {head} <> '' THEN {c} ELSE {src} END"


def dedup_paragraphs(col: Column | str, sep: str = "\n\n") -> Column:
    """Remove repeated paragraphs WITHIN a document, keeping each
    paragraph's first occurrence and original order (r5) — the
    intra-document counterpart of cross-document boilerplate removal
    (templated pages repeat nav blocks / disclaimers several times in
    one page).  Matching is exact on the trimmed paragraph text.

    Column-only: split -> fold carrying (seen-set, kept-list) ->
    rejoin.  O(p²) comparisons per document in the worst case (p =
    paragraph count — tens, not thousands); no shuffle, no UDF.
    """
    c = F.col(col) if isinstance(col, str) else col
    paras = F.split(c, F.lit(sep).cast("string"))
    kept = F.aggregate(
        paras,
        F.array().cast("array<string>"),
        lambda acc, p: F.when(
            F.array_contains(F.transform(acc, F.trim), F.trim(p)),
            acc,
        ).otherwise(F.concat(acc, F.array(p))),
    )
    return F.array_join(kept, sep)


def dedup_lines(col: Column | str) -> Column:
    """Remove repeated LINES within a document, keeping first
    occurrence and order — :func:`dedup_paragraphs` at line
    granularity (the transform the Gopher `duplicate_line_*` signals
    measure; this is the corresponding repair)."""
    return dedup_paragraphs(col, "\n")


def compression_ratio(col: Column | str, level: int = 6) -> Column:
    """zlib-compressed size / raw UTF-8 size (r5) — the Gopher-style
    repetitiveness signal: templated or looping text compresses far
    below natural language (~0.3-0.6 for prose; near 0 for repeated
    blocks).  Empty text scores 1.0 (nothing to judge).

    This is the package's one deliberate Python text function: no JVM
    Column zlib exists, so it runs as an Arrow-batched pandas_udf —
    zlib itself is C, the batch amortizes the crossing, and zlib output
    is deterministic for a fixed level, so results are stable across
    engines/reruns (tests pin Spark output against direct ``zlib``
    calls byte-for-byte).  Use it as a coarse filter, not in per-row
    hot joins.
    """
    import zlib

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    c = F.col(col) if isinstance(col, str) else col

    def _ratio(texts):  # pd.Series -> pd.Series (hints omitted: the
        # module uses `from __future__ import annotations`, and pyspark
        # can't resolve stringified hints whose names are function-local)
        def one(t):
            if t is None:
                return None
            raw = t.encode("utf-8")
            if not raw:
                return 1.0
            return len(zlib.compress(raw, level)) / len(raw)

        return texts.map(one)

    return pandas_udf(_ratio, DoubleType())(c)


# Sentence splitting: RE2 (DuckDB) has no lookbehind, so instead of
# splitting at `(?<=[.!?])\s+` we EXTRACT maximal runs of
# non-terminators followed by their terminator run (or end-of-text for
# a trailing fragment).  Greedy leftmost matching resolves identically
# in Java regex and RE2, so the segmentation is engine-exact.
_SENTENCE_RE = r"[^.!?]+(?:[.!?]+|$)"


def sentences(col: Column | str) -> Column:
    """Trimmed non-empty sentence segments of a document: maximal
    ``[^.!?]+`` runs with their trailing terminator punctuation kept
    attached.  Whitespace between sentences lands at the head of the
    next segment and is trimmed away.  Empty text -> empty array."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.transform(
            F.regexp_extract_all(c, F.lit(_SENTENCE_RE), F.lit(0)),
            lambda x: F.trim(x),
        ),
        lambda x: x != "",
    )


# --- Unicode normalization ---------------------------------------------------
#
# Spark has no built-in Unicode normalizer, and byte-level dedup is
# wrong without one: "café" arrives both precomposed (U+00E9) and
# decomposed (e + U+0301) from different renderers, and every
# fingerprint/shingle/minhash key in this repo would treat them as
# different documents.  unicodedata implements the same Unicode
# standard algorithm DuckDB's nfc_normalize does, which is what makes
# the cross-engine oracle possible.  Arrow-batched pandas UDFs — the
# legitimate escape hatch (no Column expression can express UAX#15),
# run them ONCE to normalize a dedup key, not per comparison.


def unicode_normalize(col: Column | str, form: str = "NFC") -> Column:
    """Unicode-normalize a string column (UAX#15 NFC/NFD/NFKC/NFKD).
    NULLs pass through."""
    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")

    @pandas_udf("string")
    def _norm(s):
        return s.str.normalize(form)

    c = F.col(col) if isinstance(col, str) else col
    return _norm(c)


def strip_accents(col: Column | str) -> Column:
    """Remove combining marks: NFD -> drop category-Mn characters ->
    NFC recompose.  Matches DuckDB ``strip_accents`` on canonically
    decomposable text (both follow utf8proc stripmark semantics for
    Mn marks; compatibility characters like ligatures are left alone
    by BOTH — use NFKC first if those should fold too).  NULLs pass
    through."""
    import unicodedata

    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _strip(s):
        def f(x):
            if x is None:
                return None
            d = unicodedata.normalize("NFD", x)
            return unicodedata.normalize(
                "NFC",
                "".join(ch for ch in d if unicodedata.category(ch) != "Mn"),
            )

        return s.map(f, na_action="ignore")

    c = F.col(col) if isinstance(col, str) else col
    return _strip(c)


def syllable_counts(col: Column | str) -> Column:
    """Per-token heuristic syllable counts: vowel-group runs
    (``[aeiouy]+``) per lowercased token, floored at 1 — the standard
    readability-formula approximation (exact syllabification needs a
    pronunciation dictionary; every published Flesch implementation
    uses a vowel-run heuristic of this family).  Engine-portable:
    the same regex extraction runs in any ANSI engine."""
    toks = tokens(F.lower(F.col(col) if isinstance(col, str) else col))
    return F.transform(
        toks,
        lambda t: F.greatest(
            F.lit(1),
            F.size(F.regexp_extract_all(t, F.lit(r"[aeiouy]+"), F.lit(0))),
        ),
    )


def flesch_reading_ease(col: Column | str) -> Column:
    """Flesch reading ease (Flesch 1948; the readability gate
    education-quality corpus filters apply):

        206.835 - 1.015 * (words / sentences)
                - 84.6  * (syllables / words)

    over :func:`tokens`, :func:`sentences` and
    :func:`syllable_counts`.  Higher = easier; ~90 is grade-school
    prose, <30 is academic.  Documents with no words score NULL;
    sentence count floors at 1 (terminator-less text is one
    sentence).  All counts are exact integers, so the score is one
    fixed sequence of exact-input double ops — 6dp-rounded, it
    mirrors in SQL (:func:`flesch_sql`)."""
    c = F.col(col) if isinstance(col, str) else col
    n_words = F.size(tokens(c)).cast("double")
    n_sent = F.greatest(F.lit(1), F.size(sentences(c))).cast("double")
    n_syll = F.aggregate(
        syllable_counts(c), F.lit(0).cast("bigint"), lambda a, x: a + x
    ).cast("double")
    score = (
        F.lit(206.835)
        - F.lit(1.015) * (n_words / n_sent)
        - F.lit(84.6) * (n_syll / n_words)
    )
    return F.when(n_words > 0, F.round(score, 6))


def flesch_sql(text_sql: str) -> str:
    """DuckDB mirror of :func:`flesch_reading_ease` — same token /
    sentence / vowel-run extractions, same operation order, same 6dp
    round."""
    toks = (f"list_filter(regexp_split_to_array({text_sql}, '\\s+'),"
            f" x -> x <> '')")
    sents = (f"list_filter(list_transform("
             f"regexp_extract_all({text_sql}, '[^.!?]+(?:[.!?]+|$)'),"
             f" x -> trim(x)), x -> x <> '')")
    syll = (
        f"list_sum(list_transform("
        f"list_filter(regexp_split_to_array(lower({text_sql}), '\\s+'),"
        f" x -> x <> ''),"
        f" t -> greatest(1, len(regexp_extract_all(t, '[aeiouy]+')))))"
    )
    return (
        f"CASE WHEN len({toks}) > 0 THEN round("
        f"206.835"
        f" - 1.015 * (len({toks})::DOUBLE / greatest(1, len({sents}))::DOUBLE)"
        f" - 84.6 * ({syll}::DOUBLE / len({toks})::DOUBLE), 6)"
        f" END"
    )
