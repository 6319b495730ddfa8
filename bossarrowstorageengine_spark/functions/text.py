"""Text-analysis column helpers for the LLM-data-pipeline operators:
tokenization, quality scoring, language-ID heuristic, fingerprinting.

Everything is a Catalyst expression (split / filter / aggregate / md5) so
the operators scale as plain columnar transforms — no Python per row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Marker stopwords per language for the n-gram/marker language-ID heuristic.
#: Deterministic tie order: languages checked in this fixed sequence.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of"),
    "de": ("der", "die", "das"),
    "fr": ("le", "la", "les"),
    "es": ("el", "los", "una"),
    "zh": ("de5", "shi4", "le5"),  # pinyin-ish placeholders for the corpus
}

#: Stopword list for quality scoring (subset of the corpus vocabulary).
STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "to")


def tokens(text: Column) -> Column:
    """Whitespace tokenization — the corpus is space-separated."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish subword proxy: count of maximal runs of letters / digits /
    single non-space symbols (a common pre-tokenizer regex)."""
    return F.size(F.regexp_extract_all(text, F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0)).cast("long")


def marker_count(text_tokens: Column, markers: tuple[str, ...]) -> Column:
    """How many tokens are in the marker set (JVM-side array filter)."""
    return F.size(F.filter(text_tokens, lambda t: t.isin(*markers))).cast("long")


def language_id(text: Column) -> Column:
    """Marker-scoring language-ID: first language (in the fixed LANG_MARKERS
    order) whose marker count equals the overall max; 'und' when no marker
    hits.  First-match-wins makes ties deterministic."""
    toks = tokens(text)
    counts = {lang: marker_count(toks, m) for lang, m in LANG_MARKERS.items()}
    max_cnt = F.greatest(*counts.values())
    expr = F.when(max_cnt == 0, F.lit("und"))
    for lang, cnt in counts.items():
        expr = expr.when(cnt == max_cnt, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def stopword_ratio(text: Column) -> Column:
    toks = tokens(text)
    return (marker_count(toks, STOPWORDS) / F.size(toks)).cast("double")


def distinct_token_ratio(text: Column) -> Column:
    toks = tokens(text)
    return (F.size(F.array_distinct(toks)) / F.size(toks)).cast("double")


def fingerprint_raw(text: Column) -> Column:
    """Content fingerprint: md5 of the normalized (lowercased, trimmed) text."""
    return F.md5(F.lower(F.trim(text)))


def fingerprint_bag(text: Column) -> Column:
    """Order-insensitive fingerprint: md5 over the sorted token bag — equal
    for documents that are permutations of the same words."""
    return F.md5(F.array_join(F.array_sort(tokens(F.lower(F.trim(text)))), " "))
