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


def deterministic_sample(df: DataFrame, rate: float, key_col: str = "doc_id",
                         salt: str = "po") -> DataFrame:
    """Reproducible corpus subsample: keep rows whose md5(salt||key) falls
    under ``rate`` of the hash space.

    The property that matters for training-data work is that the SAME rows
    are kept on every run, every engine, any partitioning — unlike
    ``df.sample`` (seeded per-partition, so repartitioning changes the
    sample).  Pure filter: no shuffle, pushes to the scan, composes with
    stratification by salting per stratum (``salt=f"{lang}:{snapshot}"``).
    16 hex digits = 64 bits; threshold computed in exact integer space.
    """
    threshold = int(rate * (1 << 60))
    bucket = F.conv(F.substring(F.md5(F.concat(F.lit(salt),
                                               F.col(key_col).cast("string"))),
                                1, 15), 16, 10).cast("long")
    return df.where(bucket < F.lit(threshold))


def tfidf_top_terms(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", top_k: int = 3) -> DataFrame:
    """Top-k characteristic terms per document by tf·idf
    → (doc_id, term, tf, doc_freq, score, rank).

    idf is the RATIONAL variant ``(N + 1) / (doc_freq + 1)`` — a single
    exactly-rounded IEEE division — rather than the usual logarithm:
    ``ln`` is not guaranteed bit-identical across math libraries (JVM
    StrictMath vs DuckDB's libm), and the correctness gate hashes values
    exactly.  Ranking is unaffected (x ↦ ln is monotone), which is what
    top-k consumes.

    Shape: explode → (doc,term) count [map-side combine] → term doc-freq
    [second combine agg] → broadcast-join doc-freqs if small / shuffle
    join otherwise (AQE decides) → per-doc window top-k.  Ties break on
    term ASC so the result is a deterministic set.
    """
    from pyspark.sql import Window

    words = df.select(F.col(id_col).alias("doc_id"),
                      F.explode(words_col(text_col)).alias("term"))
    tf = words.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("doc_freq"))
    n_docs = df.select(F.countDistinct(F.col(id_col)).alias("n")).collect()[0]["n"]
    scored = (tf.join(dfreq, "term")
              .withColumn("score",
                          F.col("tf").cast("double")
                          * (F.lit(float(n_docs + 1))
                             / (F.col("doc_freq") + F.lit(1)).cast("double"))))
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= top_k)
            .select("doc_id", "term", "tf", "doc_freq", "score", "rank"))
