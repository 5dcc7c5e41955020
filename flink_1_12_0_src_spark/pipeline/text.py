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


def chunk_documents(
    df: DataFrame, id_col: str, text_col: str, chunk_tokens: int = 50, overlap: int = 10
) -> DataFrame:
    """Split documents into overlapping token windows — the training-data
    chunking primitive (stride = chunk_tokens - overlap). One explode, linear
    output expansion (≈ 1/stride rows per token) — safe at any corpus scale;
    no shuffle at all (chunking is embarrassingly parallel per document).

    Tokenization is a single-space split (mirrors DuckDB ``string_split(t,' ')``
    token-for-token, including empty tokens on whitespace runs), and empty
    documents emit NO chunks."""
    stride = chunk_tokens - overlap
    w = F.split(F.lower(F.col(text_col)), " ", -1)
    starts = F.sequence(F.lit(0), F.size(w) - 1, F.lit(stride))
    return (
        df.where(F.length(text_col) > 0)
        .select(F.col(id_col), w.alias("w"), F.explode(starts).alias("s"))
        .select(
            id_col,
            (F.col("s") / stride).cast("bigint").alias("chunk_id"),
            F.array_join(F.slice(F.col("w"), F.col("s") + 1, chunk_tokens), " ").alias("chunk"),
            F.size(F.slice(F.col("w"), F.col("s") + 1, chunk_tokens)).alias("n_tokens"),
        )
    )


# PII patterns kept RE2-compatible so any engine can verify the masking.
PII_EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PII_PHONE_RE = r"\+?[0-9][0-9 -]{7,}[0-9]"
PII_SSN_RE = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"


def pii_mask(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """PII scrubbing for training corpora: mask emails / long digit runs
    (phone-like) / SSN-shaped ids, and report per-document match counts.
    Pure JVM regex — no UDFs; masking order (email → ssn → phone) keeps the
    narrower patterns from being eaten by the broader digit-run rule."""
    t = F.col(text_col)
    counts = [
        F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(PII_SSN_RE), 0)).alias("n_ssns"),
        F.size(F.regexp_extract_all(t, F.lit(PII_PHONE_RE), 0)).alias("n_phones"),
    ]
    masked = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>"), PII_SSN_RE, "<ID>"
        ),
        PII_PHONE_RE,
        "<PHONE>",
    )
    return df.select(F.col(id_col), masked.alias("masked_text"), *counts)


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


def tfidf_topk(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """Per-document top-k terms by TF-IDF (tf · ln(N/df)), the classic
    training-corpus keyword/feature extraction step.

    Shape at 100 TB: ONE corpus scan — explode+agg for term frequencies
    (shuffle keyed by (doc, term)); document frequency is then a window count
    over the tf result partitioned by term (tf already has exactly one row
    per doc-term), so no second scan and no self-join; finally a per-doc
    top-k window (WindowGroupLimit-pushed). Scores are rounded to 6dp before
    ranking (term ASC tiebreak) so the ordering is reproducible cross-engine.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col), F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    n_docs = df.count()  # one scalar to the driver; a literal in the plan
    scored = tf.withColumn(
        "df", F.count("*").over(Window.partitionBy("term"))
    ).select(
        id_col,
        "term",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(id_col, F.col("rk").cast("int").alias("rk"), "term", "score")
    )
