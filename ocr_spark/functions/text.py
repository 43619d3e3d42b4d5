"""Text-analysis column expressions — the scalar-function layer (SURVEY.md
§2.8) re-expressed as pure Catalyst expressions.

Everything here returns a :class:`pyspark.sql.Column` built only from
``pyspark.sql.functions`` — JVM-side, whole-stage-codegen'd, zero Python in
the hot path.  Each function has an exactly-equivalent ANSI-SQL formulation
used by the DuckDB oracles in ``__spark_entry__.py``; keeping the two in
lockstep is a design constraint (md5 hex, ``translate`` char set, ``\\s+``
split semantics all verified identical across engines).

Reference semantics mirrored (citations into /root/reference/):

* punctuation strip set + lowercase   — server/src/utils/export.py:494, 521-526
* whitespace tokenizer + stopwords    — server/src/elastic_search.py:19-36
* text cleanup (trim)                 — server/src/utils/text.py:4-18
* deterministic content fingerprint   — server/src/utils/file.py:233-237
  (reference seeds ``random`` with the path; we use md5 of normalized
  content — stable hashing, the SURVEY.md §2.8 F10 mapping)

Scale note: these are all narrow per-row expressions — no shuffle, linear
scaling, and Parquet column pruning applies (only ``text`` is read).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The reference's punctuation strip set, export.py:494.
PUNCT_CHARS = "«»“”.,;:!?()[]{}\"'"

# Stopword lists for the stopword-hit language-ID heuristic.  Small, frozen,
# and duplicated verbatim in the DuckDB oracle SQL (IN-lists) — determinism
# matters more than linguistic coverage here.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "los", "se", "por"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une", "du", "que"),
    "de": ("der", "die", "und", "das", "von", "zu", "den", "mit", "ist", "ein"),
    "pt": ("o", "a", "de", "que", "e", "do", "da", "em", "um", "para"),
}

# ES-analyzer analog stopword set (elastic_search.py:19-36 uses the built-in
# English+Portuguese filters; we freeze a deterministic union subset).
STOPWORDS = tuple(sorted(set(LANG_STOPWORDS["en"]) | set(LANG_STOPWORDS["pt"])))

# BPE-ish token pattern: letter runs | digit runs | single non-space symbol.
# POSIX classes only so Java (Spark) and DuckDB regex engines agree.
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n]"


def tokens(text: Column) -> Column:
    """Whitespace tokens of trimmed text (elastic_search.py:19-29 analyzer
    tokenizer).  ``split(trim(x), '\\s+')`` — identical in DuckDB as
    ``regexp_split_to_array(trim(x), '\\s+')``."""
    return F.split(F.trim(text), r"\s+")


def normalize_word(word: Column) -> Column:
    """Index normalization (export.py:494, 521-526): strip the punctuation
    set, lowercase.  DuckDB: ``lower(translate(w, PUNCT, ''))``."""
    return F.lower(F.translate(word, PUNCT_CHARS, ""))


def norm_tokens(text: Column) -> Column:
    """Normalized non-empty tokens, order preserved."""
    return F.filter(
        F.transform(tokens(text), normalize_word), lambda w: w != ""
    )


def doc_fingerprint(text: Column) -> Column:
    """Deterministic content fingerprint: md5 of the space-joined normalized
    tokens (stable-hash replacement for file.py:233-237's seeded UUID).
    DuckDB: ``md5(array_to_string(norm_tokens, ' '))``."""
    return F.md5(F.array_join(norm_tokens(text), " ").cast("binary"))


def count_in(toks: Column, words: tuple[str, ...]) -> Column:
    """Count (with multiplicity) of tokens in a frozen word list.
    DuckDB: ``len(list_filter(toks, t -> t IN (...)))``."""
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def stopword_count(toks: Column) -> Column:
    return count_in(toks, STOPWORDS)


def lang_scores(toks: Column) -> dict[str, Column]:
    """Per-language stopword-hit scores (the language-ID scoring stage)."""
    return {lang: count_in(toks, ws) for lang, ws in LANG_STOPWORDS.items()}


def lang_pred(toks: Column) -> Column:
    """argmax language with lexicographic tie-break (deterministic).  Built
    as a CASE chain over the frozen lang order so Spark and the SQL oracle
    agree bit-for-bit."""
    scores = lang_scores(toks)
    langs = sorted(LANG_STOPWORDS)  # de, en, es, fr, pt
    best = scores[langs[0]]
    pred = F.lit(langs[0])
    for lang in langs[1:]:
        is_better = scores[lang] > best
        pred = F.when(is_better, F.lit(lang)).otherwise(pred)
        best = F.when(is_better, scores[lang]).otherwise(best)
    return pred


# Explicit accent-fold map (F13 term normalizer analog,
# server/src/elastic_search.py:30-36 lowercase+asciifolding).  An explicit
# translate table — NOT a library NFKD — so the DuckDB oracle can apply the
# byte-identical mapping.
ACCENT_SRC = "áàâãäéèêëíìîïóòôõöúùûüçñýÁÀÂÃÄÉÈÊËÍÌÎÏÓÒÔÕÖÚÙÛÜÇÑÝ"
ACCENT_DST = "aaaaaeeeeiiiiooooouuuucnyAAAAAEEEEIIIIOOOOOUUUUCNY"


def asciifold(c: Column) -> Column:
    return F.translate(c, ACCENT_SRC, ACCENT_DST)


def analyzer_tokens(text: Column) -> Column:
    """The full ES text-analyzer semantics (elastic_search.py:19-36):
    whitespace tokenize → lowercase → asciifold → drop EN/PT stopwords →
    drop empties.  Stopwords are matched AFTER folding (ES normalizer
    order)."""
    folded = F.transform(
        tokens(text), lambda t: asciifold(F.lower(t))
    )
    return F.filter(
        folded, lambda t: (t != "") & ~t.isin(*STOPWORDS)
    )


def filename_tokens(name: Column) -> Column:
    """The ES *filename* analyzer (elastic_search.py:14-18): an ES
    ``pattern`` analyzer — split on ``\\W|_``, lowercase, drop empty
    tokens.  Distinct from the text analyzer: no stopword filter, no
    asciifolding, and underscores/punctuation are the separators."""
    return F.filter(
        F.split(F.lower(name), r"\W|_"), lambda t: t != ""
    )


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count via regex matches (letter runs / digit runs /
    single symbols).  DuckDB: ``len(regexp_extract_all(text, RE))``."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_RE))


def ngrams(toks: Column, n: int) -> Column:
    """Raw (non-distinct, in-order) word n-grams of a token array; empty
    when the doc has < n tokens.  Same slice+arrays_zip single-pass build
    as shingles (see its docstring for why NOT an indexed transform).
    DuckDB (1-indexed): ``list_transform(range(1, len(t)-n+2), i ->
    t[i] || ' ' || ... || t[i+n-1])``."""
    win = F.size(toks) - (n - 1)
    zipped = F.arrays_zip(*[F.slice(toks, k + 1, win) for k in range(n)])
    gram = lambda s: F.concat_ws(" ", *[s[str(k)] for k in range(n)])
    return F.when(
        F.size(toks) >= n,
        F.transform(zipped, gram),
    ).otherwise(F.array().cast("array<string>"))


def shingles(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram (shingle) set of a token array — the unit of the
    MinHash/Jaccard dedup family.  Empty array when the doc has < n tokens.
    DuckDB (1-indexed): ``list_distinct(list_transform(range(1, len(t)-n+2),
    i -> t[i] || ' ' || ... || t[i+n-1]))``.

    Implementation detail that matters at scale: built from ``slice`` +
    ``arrays_zip`` (one linear pass), NOT ``transform(sequence(...),
    i -> element_at(toks, i+k))``.  The indexed form is O(tokens²) whenever
    Catalyst inlines the token expression into each element lookup — which
    predicate pushdown does do (e.g. InferFiltersFromGenerate pushes a
    ``size(shingles) > 0`` filter below the projection with full
    substitution; measured 100× slowdown at sf0.1)."""
    win = F.size(toks) - (n - 1)
    zipped = F.arrays_zip(*[F.slice(toks, k + 1, win) for k in range(n)])
    gram = lambda s: F.concat_ws(" ", *[s[str(k)] for k in range(n)])
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(F.transform(zipped, gram)),
    ).otherwise(F.array().cast("array<string>"))


#: Mersenne prime 2^31 - 1 — the MinHash permutation modulus.  Kept below
#: 2^31 so every product in the mixing arithmetic stays under 2^62 (no
#: bigint overflow in either engine).
MINHASH_PRIME = 2147483647


def minhash_base(shingle_col: Column) -> Column:
    """Per-shingle double-hash basis ``array<struct<h1,h2>>`` — ONE md5 per
    shingle (the round-1 family hashed every shingle k=16 times; measured
    2.2× on candidate generation at sf0.1, and at 100 TB the signature
    stage's CPU is ~k× cheaper).  Kirsch–Mitzenmacher construction: the
    128-bit md5 is split into two independent 60-bit halves, reduced mod
    P / mod P-1; ``h2`` is forced into [1, P-1] so no permutation can
    collapse to a constant.  DuckDB twin uses the same
    ``cast('0x'||substr(md5,...) as bigint)`` conversion as the simhash
    oracle.

    MUST be staged as a named column before ``minhash_signature`` reads
    it: the k consumers reference the basis array k times, and only a
    materialized multi-referenced non-cheap projection stops
    CollapseProject from re-inlining the md5 transform per permutation
    (the HOF staging rule, see ``shingles``)."""
    hexes = F.transform(shingle_col, lambda s: F.md5(s.cast("binary")))

    def pair(m: Column) -> Column:
        h1 = F.conv(F.substring(m, 1, 15), 16, 10).cast("bigint") % MINHASH_PRIME
        h2 = (
            F.conv(F.substring(m, 17, 15), 16, 10).cast("bigint")
            % (MINHASH_PRIME - 1)
            + 1
        )
        return F.struct(h1.alias("h1"), h2.alias("h2"))

    return F.transform(hexes, pair)


def minhash_signature(base_col: Column, k: int = 16) -> Column:
    """k-permutation MinHash signature over a staged ``minhash_base``
    column: ``sig[i] = min((h1 + i·h2) mod P)`` — pure integer mixing, no
    re-hashing.  Identical arithmetic in the DuckDB oracle, so the gate is
    exact.  Null-safe: empty basis → array of nulls."""
    return F.array(
        *[
            F.array_min(
                F.transform(
                    base_col,
                    lambda x: (x["h1"] + F.lit(i) * x["h2"]) % MINHASH_PRIME,
                )
            ).alias(f"mh{i}")
            for i in range(k)
        ]
    )
