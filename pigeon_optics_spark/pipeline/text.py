"""Text analysis operators: quality scoring, token counting, language ID,
document fingerprinting.

All pure ``pyspark.sql.functions`` column expressions — they run inside
whole-stage codegen, scale embarrassingly parallel (no shuffle), and have
exact DuckDB-SQL twins for the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small English stopword list (shared literal with the oracle SQL).
STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
             "for", "on", "with", "as", "at", "by"]

# BPE-ish tokenizer: word pieces, numbers, or single non-space symbols.
# Plain regex (no lookarounds) so Java regex and RE2 agree.
TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def words_col(text: str | Column) -> Column:
    """Whitespace tokens of trimmed text; empty text → empty array."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.trim(c), "\\s+"), lambda w: w != F.lit(""))


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: lengths, ratios, a composite score.

    Ratios are double divisions of exact integer counts — deterministic
    across engines.
    """
    words = words_col(text_col)
    n_words = F.size(words)
    n_stop = F.size(F.filter(words, lambda w: F.lower(w).isin(STOPWORDS)))
    n_punct = F.size(F.filter(F.split(F.col(text_col), ""),
                              lambda ch: ch.rlike("[^A-Za-z0-9\\s]")))
    char_len = F.length(text_col)
    return df.select(
        "*",
        char_len.alias("char_len"),
        n_words.alias("word_count"),
        F.size(F.array_distinct(words)).alias("distinct_words"),
        (n_stop.cast("double") / F.greatest(n_words, F.lit(1))).alias("stopword_ratio"),
        (n_punct.cast("double") / F.greatest(char_len, F.lit(1))).alias("punct_ratio"),
        (char_len.cast("double") / F.greatest(n_words, F.lit(1))).alias("avg_word_len"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite quality heuristic in [0, 1]: length band + stopword presence
    + lexical diversity (the usual pre-training corpus filters)."""
    stats = text_stats(df, text_col)
    length_ok = (F.col("word_count") >= 10) & (F.col("word_count") <= 100000)
    diversity = F.col("distinct_words").cast("double") / F.greatest("word_count", F.lit(1))
    score = (
        length_ok.cast("double") * 0.4
        + F.least(F.col("stopword_ratio") * F.lit(4.0), F.lit(1.0)) * 0.3
        + F.least(diversity * F.lit(2.0), F.lit(1.0)) * 0.3
    )
    return stats.withColumn("quality_score", score)


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """BPE-ish token count via regexp extraction (JVM-side)."""
    return df.withColumn(
        "n_tokens", F.size(F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0)))
    )


# Distinctive stopwords per language for the ID heuristic (shared with oracle).
LANG_MARKERS = {
    "en": ["the", "and", "of", "is"],
    "es": ["el", "la", "de", "que"],
    "de": ["der", "die", "und", "nicht"],
    "fr": ["le", "la", "et", "les"],
}


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram/stopword language-ID heuristic.

    Scores = distinctive-stopword hits per language + a CJK character count
    for zh; prediction = argmax with a fixed tie-break order (en > es > de >
    fr > zh > unknown).  Deterministic; mirrored 1:1 in the oracle SQL.
    """
    words = F.transform(words_col(text_col), lambda w: F.lower(w))
    cols = {}
    for lang, markers in LANG_MARKERS.items():
        cols[f"score_{lang}"] = F.size(F.filter(words, lambda w: w.isin(markers)))
    cols["score_zh"] = F.size(
        F.filter(F.split(F.col(text_col), ""), lambda ch: ch.rlike("[\\u4e00-\\u9fff]"))
    )
    out = df.select("*", *[c.alias(n) for n, c in cols.items()])
    best = F.greatest(*[F.col(n) for n in cols])
    pred = F.when(best <= 0, "unknown")
    for lang in ["en", "es", "de", "fr", "zh"]:
        pred = pred.when(F.col(f"score_{lang}") == best, lang)
    return out.withColumn("predicted_lang", pred)


def fingerprint(df: DataFrame, text_col: str = "text", shingle: int = 8) -> DataFrame:
    """Document fingerprint: min-over-shingles of md5 (MinHash with one hash
    function over rolling character shingles) — a stable content signature
    robust to reordering of large blocks, cheap at 100 TB (no shuffle)."""
    n = F.length(text_col)
    positions = F.sequence(F.lit(1), F.greatest(n - (shingle - 1), F.lit(1)))
    return df.withColumn(
        "fingerprint",
        F.array_min(
            F.transform(positions,
                        lambda i: F.md5(F.col(text_col).substr(i, F.lit(shingle)))))
    )
