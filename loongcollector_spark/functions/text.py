"""Text analysis for training-data pipelines: language-ID, quality scoring,
token counting, document fingerprinting.

All pure JVM expressions (split/filter/aggregate on arrays) — they fuse into
the scan stage, so at 100TB these cost one pass over the text column with
full predicate pushdown upstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny marker-word sets for the n-gram/stopword language heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "ist", "das"),
    "es": ("el", "la", "de", "que", "es"),
    "fr": ("le", "la", "et", "est", "les"),
}

EN_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "on", "for", "with", "as", "at", "by", "this",
)


def words(col: Column) -> Column:
    """Whitespace tokenization (the token-count baseline)."""
    return F.filter(F.split(col, r"\s+"), lambda w: w != "")


def token_count(col: Column) -> Column:
    return F.size(words(col))


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish proxy: count word pieces + punctuation via regex splits —
    a deterministic stand-in for a real tokenizer's token count."""
    pieces = F.filter(
        F.split(col, r"(?=[\s\p{Punct}])|(?<=[\s\p{Punct}])"),
        lambda w: F.trim(w) != "",
    )
    return F.size(pieces)


def stopword_ratio(col: Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    ws = words(F.lower(col))
    sw = F.filter(ws, lambda w: w.isin(*stopwords))
    return (F.size(sw) / F.greatest(F.size(ws), F.lit(1))).cast("double")


def punct_ratio(col: Column) -> Column:
    n_punct = F.length(col) - F.length(F.regexp_replace(col, r"[\p{Punct}]", ""))
    return (n_punct / F.greatest(F.length(col), F.lit(1))).cast("double")


def mean_word_length(col: Column) -> Column:
    ws = words(col)
    total = F.aggregate(ws, F.lit(0), lambda acc, w: acc + F.length(w))
    return (total / F.greatest(F.size(ws), F.lit(1))).cast("double")


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + stopword presence +
    low punctuation density (the classic Gopher/C4-style filters, reduced to
    deterministic arithmetic)."""
    n = token_count(col)
    length_ok = F.when((n >= 10) & (n <= 5000), F.lit(1.0)).otherwise(F.lit(0.0))
    sw = stopword_ratio(col)
    sw_ok = F.when((sw > 0.05) & (sw < 0.6), F.lit(1.0)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(col) < 0.2, F.lit(1.0)).otherwise(F.lit(0.0))
    return ((length_ok + sw_ok + punct_ok) / F.lit(3.0)).cast("double")


def lang_id(col: Column) -> Column:
    """Marker-word language heuristic: the language with the most marker hits
    wins; ties broken by fixed language order; no hits -> 'und'."""
    ws = words(F.lower(col))
    best_lang: Column = F.lit("und")
    best_hits: Column = F.lit(0)

    def marker_filter(markers: tuple[str, ...]):
        return lambda w: w.isin(*markers)

    for lang in sorted(LANG_MARKERS):  # deterministic order
        hits = F.size(F.filter(ws, marker_filter(LANG_MARKERS[lang])))
        is_better = hits > best_hits
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(is_better, hits).otherwise(best_hits)
    return best_lang


def fingerprint(col: Column) -> Column:
    """Document fingerprint: hash of whitespace/case-normalized text
    (rolling-hash equivalent for exact near-whitespace dedup)."""
    # collapse BEFORE trim: trim() strips only spaces, so a tab-edged string
    # would otherwise normalize differently from its space-edged twin
    normalized = F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))
    return F.md5(normalized)


def content_hash(col: Column) -> Column:
    """64-bit content hash for digests and shard keys."""
    return F.xxhash64(col)
