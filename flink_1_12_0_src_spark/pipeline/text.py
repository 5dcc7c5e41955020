"""Text-analysis operators: tokenization, shingling, language ID, quality
scoring, token statistics. All pure JVM expressions (no Python UDFs)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation marks —
# the shape of a byte-level BPE's initial split (token *counting*, not a real
# merges table).
BPE_ISH_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

# tiny marker lexicons for the n-gram/stopword language heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht"],
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "es": ["el", "los", "de", "y", "es", "un", "una"],
    "fr": ["le", "la", "les", "et", "est", "un", "une"],
}


def tokens(text_col: str | Column) -> Column:
    """Whitespace word tokens of lowercased text."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.lower(c), r"\s+")


def shingles(text_col: str | Column, k: int) -> Column:
    """Word k-gram shingles (array<string>); empty when fewer than k words.
    Linear expansion — safe to explode at any scale."""
    w = tokens(text_col)
    return F.when(
        F.size(w) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(w) - k),
            lambda g: F.array_join(F.slice(w, g + F.lit(1), k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish pre-tokens + distinct ratio."""
    w = tokens(text_col)
    bpe = F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_RE), 0)
    return df.select(
        id_col,
        F.size(w).alias("ws_tokens"),
        F.size(bpe).alias("bpe_tokens"),
        F.size(F.array_distinct(w)).alias("distinct_tokens"),
        F.round(F.size(F.array_distinct(w)) / F.size(w), 6).alias("distinct_ratio"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str, lang_col: str | None = None) -> DataFrame:
    """Heuristic document quality: length / punctuation ratio / stopword ratio /
    mean word length → [0,1] score (the C4/Gopher-rule shape)."""
    t = F.col(text_col)
    w = tokens(text_col)
    n_chars = F.length(t)
    n_words = F.size(w)
    punct = F.size(F.regexp_extract_all(t, F.lit(r"[^a-zA-Z0-9\s]"), 0))
    stop = F.size(F.array_intersect(w, F.array(*[F.lit(x) for x in LANG_MARKERS["en"]])))
    mean_wlen = F.round((n_chars - n_words + 1) / n_words, 6)
    punct_ratio = F.round(punct / n_chars, 6)
    stop_ratio = F.round(stop / n_words, 6)
    score = F.round(
        F.least(n_words / F.lit(50.0), F.lit(1.0)) * 0.4
        + (1 - F.least(punct_ratio * 5, F.lit(1.0))) * 0.3
        + F.least(stop_ratio * 10, F.lit(1.0)) * 0.3,
        6,
    )
    out = [
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        mean_wlen.alias("mean_word_len"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality"),
    ]
    return df.select(*out)


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Marker-word language ID: count distinct lexicon hits per language, take
    the argmax (ties → lexicographic language order; all-zero → 'unknown')."""
    w = tokens(text_col)
    hit_cols = {
        lang: F.size(F.array_intersect(w, F.array(*[F.lit(m) for m in markers])))
        for lang, markers in LANG_MARKERS.items()
    }
    langs = sorted(LANG_MARKERS)  # deterministic tie order
    best = F.greatest(*[hit_cols[lg] for lg in langs])
    pred = F.when(best <= 0, "unknown")
    for lg in langs:  # first language reaching the max wins
        pred = pred.when(hit_cols[lg] == best, lg)
    return df.select(
        id_col,
        *[hit_cols[lg].alias(f"hits_{lg}") for lg in langs],
        pred.alias("predicted_lang"),
    )
