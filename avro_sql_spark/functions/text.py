"""Text-analysis column functions for large-scale training-data pipelines.

Everything here is built from JVM-side ``pyspark.sql.functions`` — no
Python UDFs — so the expressions stay inside whole-stage codegen and cost
one scan at 100 TB. Each function returns a ``Column`` usable in any
select/filter; the matching DuckDB-oracle SQL lives in
``__spark_entry__.py`` (same arithmetic, so results hash-match).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# token pattern: words | numbers | single non-space symbol (BPE-ish
# pre-tokenization, RE2-compatible so DuckDB computes the same counts)
TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

# tiny deterministic stopword inventories for the language heuristic
_LANG_MARKERS = {
    "en": [" the ", " and ", " of "],
    "fr": [" le ", " la ", " et "],
    "de": [" der ", " und ", " die "],
    "es": [" el ", " los ", " y "],
}
EN_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def whitespace_token_count(text: Column) -> Column:
    """Number of single-space-separated tokens (cheap length proxy)."""
    return F.size(F.split(text, " "))


def regex_token_count(text: Column) -> Column:
    """BPE-ish pre-token count via regexp_count (JVM regex, one pass)."""
    return F.regexp_count(text, F.lit(TOKEN_PATTERN))


def _occurrences(text: Column, needle: str) -> Column:
    return (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit("")))) / len(needle)


def lang_id(text: Column) -> Column:
    """Marker-word language heuristic: count marker hits per language over
    the lowercased text, pick the max via a CASE cascade (fixed precedence
    en>fr>de>es on ties; 'unknown' when nothing matches). The DuckDB
    oracle mirrors the same greatest() + CASE, so labels hash-match."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    scores = {
        lang: sum([_occurrences(padded, m) for m in markers[1:]], _occurrences(padded, markers[0]))
        for lang, markers in _LANG_MARKERS.items()
    }
    mx = F.greatest(*scores.values())
    expr = F.when(mx <= 0, F.lit("unknown"))
    for lang in _LANG_MARKERS:
        expr = expr.when(scores[lang] == mx, F.lit(lang))
    return expr


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars (0 for empty text)."""
    puncts = F.length(text) - F.length(F.regexp_replace(text, r"[.!?,;:]", ""))
    return (puncts / F.nullif(F.length(text), F.lit(0))).cast("double")


def stopword_ratio(text: Column) -> Column:
    """English stopword tokens / whitespace tokens."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    hits = None
    for w in EN_STOPWORDS:
        occ = _occurrences(padded, f" {w} ")
        hits = occ if hits is None else hits + occ
    return (hits / F.nullif(whitespace_token_count(text).cast("double"), F.lit(0))).cast("double")


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]: rewards reasonable length,
    sentence punctuation, and natural stopword density."""
    n_tokens = whitespace_token_count(text).cast("double")
    length_ok = F.when((n_tokens >= 5) & (n_tokens <= 100000), F.lit(1.0)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(text) <= 0.2, F.lit(1.0)).otherwise(F.lit(0.0))
    stop_ok = F.when(stopword_ratio(text) >= 0.05, F.lit(1.0)).otherwise(F.lit(0.0))
    return ((length_ok + punct_ok + stop_ok) / F.lit(3.0)).cast("double")


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text
    (lowercase, trimmed, whitespace-collapsed). Used as the exact-dedup
    key; identical in Spark and DuckDB."""
    normalized = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(normalized.cast("binary"))


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct n-word shingles of the lowercased text as
    ``array<string>`` — the input to MinHash / Jaccard dedup. Pure
    Column expression (split + sequence + transform), no Python."""
    words = F.split(F.lower(text), " ")
    k = F.size(words) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(k - 1, F.lit(-1))),
        lambda i: F.concat_ws(" ", *[F.element_at(words, i + j + 1) for j in range(n)]),
    )
    return F.when(k > 0, F.array_distinct(grams)).otherwise(F.array().cast("array<string>"))
