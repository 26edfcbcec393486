"""Text-analysis operators for large-scale training-data pipelines.

All pure ``pyspark.sql.functions`` Column expressions (JVM-side, codegen'd,
no UDFs) over a ``text`` column — language-ID (stopword-hit heuristic),
quality scoring (length / punctuation / stopword ratios), token counting
(whitespace + BPE-ish regex), and document fingerprinting (hash-based).

Each is deterministic and DuckDB-oracle-expressible where the arithmetic is
portable (token counts, quality components, fingerprints).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small stopword sets per language for the n-gram/stopword-hit heuristic
STOPWORDS: Dict[str, Sequence[str]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "de": ("der", "die", "und", "das", "ist", "von", "nicht", "mit", "ein", "zu"),
    "fr": ("le", "la", "et", "les", "des", "est", "une", "dans", "que", "pour"),
    "es": ("el", "la", "que", "de", "los", "es", "una", "por", "con", "para"),
}

# BPE-ish token regex: words, numbers, or single non-space symbols
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col: Column) -> Column:
    """Whitespace tokens (lowercased), empties removed."""
    return F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != "")


def whitespace_token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """Count of BPE-ish lexical units via regexp_count (JVM regex)."""
    return F.regexp_count(col, F.lit(TOKEN_REGEX))


def _stopword_ratio_t(toks: Column, lang: str = "en") -> Column:
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    return _stopword_ratio_t(tokens(col), lang)


def punct_ratio(col: Column) -> Column:
    n_punct = F.length(F.regexp_replace(col, r"[^.,;:!?'\"()\[\]{}]", ""))
    return n_punct / F.greatest(F.length(col), F.lit(1))


def _mean_word_length_t(toks: Column) -> Column:
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total / F.greatest(F.size(toks), F.lit(1))


def mean_word_length(col: Column) -> Column:
    return _mean_word_length_t(tokens(col))


def _quality_score_t(col: Column, toks: Column, lang: str = "en") -> Column:
    length_ok = F.least(F.length(col) / F.lit(200.0), F.lit(1.0))
    sw = F.least(_stopword_ratio_t(toks, lang) * 4.0, F.lit(1.0))
    punct_ok = F.lit(1.0) - F.least(punct_ratio(col) * 5.0, F.lit(1.0))
    mwl = _mean_word_length_t(toks)
    mwl_ok = F.when((mwl >= 3) & (mwl <= 10), F.lit(1.0)).otherwise(F.lit(0.3))
    return (length_ok + sw + punct_ok + mwl_ok) / 4.0


def quality_score(col: Column, lang: str = "en") -> Column:
    """Composite quality in [0,1]: favors moderate length, some stopwords,
    sane punctuation density, word lengths 3-10 — the standard cheap filters
    a pretraining pipeline applies before dedup."""
    return _quality_score_t(col, tokens(col), lang)


def _detect_language_t(toks: Column) -> Column:
    n = F.greatest(F.size(toks), F.lit(1))
    scores = []
    for lang, words in STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        score = F.size(F.filter(toks, lambda t: F.array_contains(sw, t))) / n
        scores.append(F.struct(score.alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return F.when(best["score"] > 0.02, best["lang"]).otherwise(F.lit("und"))


def detect_language(col: Column) -> Column:
    """Best stopword-hit language, 'und' (undetermined) when nothing hits."""
    return _detect_language_t(tokens(col))


def fingerprint(col: Column) -> Column:
    """Deterministic 64-bit document fingerprint over normalized text
    (case/whitespace-insensitive) — the exact-dedup key."""
    normalized = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.xxhash64(normalized)


def analyze(
    df: DataFrame, text_col: str = "text", *, lang: str = "en"
) -> DataFrame:
    """One pass adding all text-analysis columns.  The token array is
    materialized in its own projection first and every signal reads it as
    a column — the fused single-expression form re-derived it per signal
    (interpreted-projection CSE does not fully cover HOF subtrees;
    measured −28% at sf0.1, see dedup._gram_frame for the lambda-body
    worst case)."""
    c = F.col(text_col)
    staged = df.withColumn("__toks", tokens(c))
    t = F.col("__toks")
    return staged.select(
        "*",
        F.size(t).alias("n_tokens_ws"),
        bpe_ish_token_count(c).alias("n_tokens_bpe"),
        _stopword_ratio_t(t, lang).alias("stopword_ratio"),
        punct_ratio(c).alias("punct_ratio"),
        _mean_word_length_t(t).alias("mean_word_len"),
        _quality_score_t(c, t, lang).alias("quality"),
        _detect_language_t(t).alias("lang_detected"),
        fingerprint(c).alias("fingerprint"),
    ).drop("__toks")


def _max_run(arr: Column) -> Column:
    """Longest run of equal adjacent elements in a SORTED string array —
    one O(n) ``aggregate`` pass (JVM HOF, no UDF). 0 for empty arrays."""
    init = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def step(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(arr, init, step, lambda acc: acc["best"])


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_words_per_line: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """C4 line-level cleaning (Raffel et al. 2020 §2.2): keep only lines
    that end in terminal punctuation (. ! ? ") AND contain at least
    ``min_words_per_line`` words; flag (for doc-level drop) any page
    containing "lorem ipsum" or a curly brace, or whose cleaned text has
    fewer than ``min_sentences`` sentences (terminal-punct count — the
    paper's sentence splitter approximated deterministically). The
    paper's bad-words list and its cross-document three-sentence-span
    dedup are intentionally NOT here: the former is a policy list to be
    supplied by the deployment, the latter is the ExactSubstr family
    (``dedup.remove_duplicated_ngrams``) at a different granularity.

    One projection over a staged line array; emits ``c4_text`` (kept
    lines rejoined), exact line/sentence counters, the two content
    flags, and ``keep_doc``. Line filtering is a HOF over the split —
    no explode, no shuffle."""
    c = F.col(text_col)
    staged = df.withColumn(
        "__lines",
        F.filter(F.split(c, r"\n"), lambda l: F.trim(l) != ""),
    )
    lines = F.col("__lines")

    def _line_ok(l):
        r = F.rtrim(l)
        terminal = (
            r.endswith(".") | r.endswith("!") | r.endswith("?")
            | r.endswith('"')
        )
        n_words = F.size(
            F.filter(F.split(F.trim(l), r"\s+"), lambda t: t != "")
        )
        return terminal & (n_words >= min_words_per_line)

    kept = F.filter(lines, _line_ok)
    cleaned = F.array_join(kept, "\n")
    low = F.lower(c)
    has_lorem = low.contains("lorem ipsum")
    has_brace = c.contains("{")
    n_sent = F.coalesce(
        F.regexp_count(cleaned, F.lit(r"[.!?]")), F.lit(0)
    ).cast("long")
    out = staged.select(
        "*",
        cleaned.alias("c4_text"),
        F.size(kept).cast("long").alias("n_lines_kept"),
        (F.size(lines) - F.size(kept)).cast("long").alias("n_lines_dropped"),
        n_sent.alias("n_sentences"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
    ).drop("__lines")
    return out.withColumn(
        "keep_doc",
        ~F.col("has_lorem") & ~F.col("has_brace")
        & (F.col("n_sentences") >= min_sentences),
    )


# Gopher rule constants (Rae et al. 2021, Appendix A1 "Quality filtering")
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
_GOPHER_SYMBOL_RE = r"#|\.\.\.|…"
_GOPHER_BULLET_RE = r"^[•‣▪*-]"


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """The published Gopher quality rule set (Rae et al. 2021, Appendix
    A1) as one projection of integer signals + per-rule flags: word-count
    bounds, mean word length bounds, symbol-to-word ratio (#/ellipsis),
    bullet-started and ellipsis-ended line fractions, alphabetic-word
    fraction, and the ≥2-stopword requirement. Complements
    :func:`quality_filters` (C4-style composite score) with the named
    per-rule surface — and adds the LINE-level signals that need the raw
    text's newline structure, which the token-based pass can't see.

    One scan, two staging projections (token array, non-empty line
    array — the HOF re-inlining rule in docs/PIPELINE.md), every signal
    an exact integer so the flags are engine-stable ratio comparisons of
    integers. The alpha-word test is ``[a-z]`` on lowercased tokens —
    English-centric exactly as the paper's rules are (docstring caveat,
    not a bug). Returns ``df``'s columns + signals + flags +
    ``pass_gopher``."""
    c = F.col(text_col)
    staged = df.withColumn("__toks", tokens(c)).withColumn(
        "__lines",
        F.filter(F.split(c, r"\n"), lambda l: F.trim(l) != ""),
    )
    toks, lines = F.col("__toks"), F.col("__lines")
    n = F.size(toks)
    n_lines = F.size(lines)
    sum_chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)
    )
    n_sym = F.coalesce(
        F.regexp_count(c, F.lit(_GOPHER_SYMBOL_RE)), F.lit(0)
    ).cast("long")
    n_bullet = F.size(
        F.filter(lines, lambda l: F.ltrim(l).rlike(_GOPHER_BULLET_RE))
    )
    n_ellipsis = F.size(F.filter(
        lines,
        lambda l: F.rtrim(l).endswith("...") | F.rtrim(l).endswith("…"),
    ))
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    n_stop = F.size(F.array_intersect(
        F.array_distinct(toks),
        F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
    ))
    nd = F.greatest(n, F.lit(1))
    ld = F.greatest(n_lines, F.lit(1))
    mean_len = sum_chars * F.lit(1.0) / nd
    out = staged.select(
        "*",
        n.cast("long").alias("n_words"),
        sum_chars.alias("sum_word_chars"),
        n_sym.alias("n_symbol_hits"),
        n_lines.cast("long").alias("n_lines"),
        n_bullet.cast("long").alias("n_bullet_lines"),
        n_ellipsis.cast("long").alias("n_ellipsis_lines"),
        n_alpha.cast("long").alias("n_alpha_words"),
        n_stop.cast("long").alias("n_stopword_hits"),
        ((n >= min_words) & (n <= max_words)).alias("pass_word_count"),
        ((mean_len >= min_mean_word_len) & (mean_len <= max_mean_word_len))
        .alias("pass_mean_word_len"),
        (n_sym * F.lit(1.0) / nd <= max_symbol_ratio).alias("pass_symbol"),
        (n_bullet * F.lit(1.0) / ld <= max_bullet_line_frac)
        .alias("pass_bullet"),
        (n_ellipsis * F.lit(1.0) / ld <= max_ellipsis_line_frac)
        .alias("pass_ellipsis"),
        (n_alpha * F.lit(1.0) / nd >= min_alpha_word_frac)
        .alias("pass_alpha"),
        (n_stop >= min_stopword_hits).alias("pass_stopwords"),
    ).drop("__toks", "__lines")
    return out.withColumn(
        "pass_gopher",
        F.col("pass_word_count") & F.col("pass_mean_word_len")
        & F.col("pass_symbol") & F.col("pass_bullet")
        & F.col("pass_ellipsis") & F.col("pass_alpha")
        & F.col("pass_stopwords"),
    )


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher/C4-style repetition signals per document, all JVM-side:
    token totals, distinct tokens, and the top token / top bigram
    occurrence counts (via sort + longest-equal-run, O(n log n) per doc,
    no per-doc group-by shuffle). Downstream filters derive fractions
    (e.g. ``top_token_count / n_tokens``) to drop boilerplate docs.

    The token array is materialized in its own projection first: the
    bigram lambda reads it with ``element_at``, and an expression-tree
    token array there would be re-tokenized once per bigram position
    (HOF lambda bodies are interpreted, never CSE'd — the O(n²)
    re-inlining trap documented at dedup._gram_frame)."""
    staged = df.withColumn("__toks", tokens(F.col(text_col)))
    toks = F.col("__toks")
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return staged.select(
        "*",
        n.alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        _max_run(F.array_sort(toks)).alias("top_token_count"),
        _max_run(F.array_sort(bigrams)).alias("top_bigram_count"),
    ).drop("__toks")


def quality_filters(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_tokens: int = 30,
    lang: str = "en",
    max_top_token_frac: float = 0.12,
    min_quality: float = 0.5,
) -> DataFrame:
    """The composed C4/Gopher-style cleaning pass, one scan (a token-array
    staging projection + one signal projection, pipelined): boolean
    columns ``pass_len`` / ``pass_lang`` / ``pass_rep`` / ``pass_quality``
    and their conjunction ``pass_all``. Each signal reuses the oracled
    building blocks above; quality is compared after the same 4-dp
    floor-rounding ``quality_docs`` pins (raw double ULPs differ across
    engines), repetition as an exact integer ratio."""
    c = F.col(text_col)
    staged = df.withColumn("__toks", tokens(c))
    toks = F.col("__toks")
    n = F.size(toks)
    q4 = F.floor(_quality_score_t(c, toks, lang) * 10000 + 0.5) / 10000
    top = _max_run(F.array_sort(toks))
    return staged.select(
        "*",
        (n >= min_tokens).alias("pass_len"),
        (_detect_language_t(toks) == lang).alias("pass_lang"),
        (top * F.lit(1.0) / F.greatest(n, F.lit(1)) <= max_top_token_frac)
        .alias("pass_rep"),
        (q4 >= min_quality).alias("pass_quality"),
    ).drop("__toks").withColumn(
        "pass_all",
        F.col("pass_len") & F.col("pass_lang") & F.col("pass_rep")
        & F.col("pass_quality"),
    )


def clean_corpus(df: DataFrame, text_col: str = "text", **kw) -> DataFrame:
    """Docs surviving every quality filter (original columns only)."""
    flagged = quality_filters(df, text_col, **kw)
    return flagged.filter("pass_all").drop(
        "pass_len", "pass_lang", "pass_rep", "pass_quality", "pass_all"
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    *,
    chunk_tokens: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Split documents into fixed-token-budget chunks with overlap — the
    long-document splitting step before packing/training. Whitespace
    tokens; chunk *i* covers tokens ``[i*stride, i*stride + chunk_tokens)``
    with ``stride = chunk_tokens - overlap``; the final chunk is the
    remainder (may be shorter). Pure ``posexplode`` over a per-row chunk
    index sequence — no shuffle, no UDF; at scale this is a flatMap the
    scan pipeline absorbs. Output adds ``chunk_id``, ``chunk_text``,
    ``chunk_n_tokens``; empty/whitespace-only docs yield zero chunks."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    # ceil((n - overlap) / stride) chunks for n > 0; the last chunk starts
    # strictly inside the doc (any tail shorter than overlap is absorbed)
    n_chunks = (F.floor((n - F.lit(overlap + 1)) / stride) + 1).cast("int")
    n_chunks = F.greatest(n_chunks, F.lit(1))  # short docs: one chunk
    # empty docs: empty sequence -> posexplode drops the row (sequence with
    # stop < start would count DOWN, hence the explicit when-guard)
    idx = F.when(n > 0, F.sequence(F.lit(1), n_chunks)).otherwise(
        F.array().cast("array<int>")
    )
    # tokenize once per input row and carry the array through the explode
    # (same pipelined stage — never materialized to a shuffle)
    exploded = df.withColumn("__toks", toks).select(
        "*", F.posexplode(idx).alias("__i", "__c")
    ).drop("__c")
    piece = F.slice(F.col("__toks"), F.col("__i") * stride + 1, chunk_tokens)
    return (
        exploded.withColumn("chunk_id", F.col("__i"))
        .withColumn("chunk_text", F.array_join(piece, " "))
        .withColumn("chunk_n_tokens", F.size(piece))
        .drop("__i", "__toks")
    )


# PII patterns, chosen for identical match semantics under Java regex
# (Spark JVM regexp_count/regexp_replace) and RE2 (the DuckDB oracle):
# no lookaround, no backreferences, alternation-free quantifiers — for
# these, leftmost-first (Java) and leftmost-longest (RE2) coincide.
# Dict order is the redaction order (emails first: their local parts may
# contain digit runs the narrower patterns could otherwise clip).
PII_PATTERNS: Dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}


def pii_count(col: Column, kind: str) -> Column:
    """Non-overlapping match count of one PII kind (JVM regexp_count)."""
    return F.regexp_count(col, F.lit(PII_PATTERNS[kind]))


def redact_pii(col: Column) -> Column:
    """Replace every PII match with its ``[KIND]`` token — a chain of four
    JVM regexp_replace calls in one codegen'd projection, no Python."""
    out = col
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"[{kind.upper()}]")
    return out


def pii_scan(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One projection adding per-kind PII counts, a total, and the redacted
    text — the standard pre-training privacy filter pass. All JVM regex in
    a single codegen'd stage; at 100 TB this is a pure map with pushed-down
    column pruning (only ``text_col`` plus whatever the caller selects)."""
    c = F.col(text_col)
    counts = [pii_count(c, k).alias(f"n_{k}") for k in PII_PATTERNS]
    total = sum((pii_count(c, k) for k in PII_PATTERNS), F.lit(0))
    return df.select(
        "*", *counts, total.alias("n_pii"), redact_pii(c).alias("redacted")
    )


def normalize_unicode(
    df: DataFrame,
    text_col: str = "text",
    *,
    form: str = "NFC",
    lowercase: bool = False,
    collapse_whitespace: bool = False,
    out_col: Optional[str] = None,
) -> DataFrame:
    """Unicode-normalize a text column (CCNet/Dolma-style cleanup:
    composed accents, compatibility ligatures/width forms under NFKC) via
    ``mapInPandas`` — Arrow batches in, vectorized ``unicodedata`` per
    batch, never per-row Python through py4j.  Optional lowercasing and
    whitespace collapse (any ``\\s+`` run → one space, trimmed) run in
    the same pass.  Output replaces ``text_col`` unless ``out_col`` is
    given; all other columns pass through untouched.

    The JVM has no Unicode normalizer exposed as a Column function, so
    this is one of the package's three sanctioned Python surfaces
    (multimodal decode, t-digest partials, and this) — Arrow-batched by
    contract.  Nulls pass through as nulls.  ``form`` NFC is the
    DuckDB-oracle-able choice (``nfc_normalize`` is bit-identical to
    Python's NFC — pinned in tests); NFKC/NFD/NFKD are supported for
    pipelines without the oracle constraint."""
    import re as _re
    import unicodedata

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    target = out_col or text_col
    fields = [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
    if target not in df.columns:
        fields.append(f"`{target}` string")
    schema = ", ".join(fields)
    ws = _re.compile(r"\s+")

    def run(batches):
        for pdf in batches:
            def norm(s):
                if s is None:
                    return None
                s = unicodedata.normalize(form, s)
                if lowercase:
                    s = s.lower()
                if collapse_whitespace:
                    s = ws.sub(" ", s).strip()
                return s

            pdf = pdf.copy()
            pdf[target] = pdf[text_col].map(norm)
            yield pdf

    return df.mapInPandas(run, schema=schema)
