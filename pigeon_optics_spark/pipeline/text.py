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
    15 hex digits = 60 bits (fits a signed 64-bit long on both engines);
    threshold computed in exact integer space against ``1 << 60``.
    """
    threshold = int(rate * (1 << 60))
    bucket = F.conv(F.substring(F.md5(F.concat(F.lit(salt),
                                               F.col(key_col).cast("string"))),
                                1, 15), 16, 10).cast("long")
    return df.where(bucket < F.lit(threshold))


def chunk_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                chunk_words: int = 10, max_docs: int = 2) -> DataFrame:
    """Boilerplate removal at sub-document granularity (the CCNet/RefinedWeb
    line-dedup family, applied to fixed word windows): a *chunk* is
    ``chunk_words`` consecutive whitespace tokens; chunks whose text occurs
    in more than ``max_docs`` distinct documents are dropped corpus-wide,
    and each document is reassembled from its surviving chunks in order.

    → (doc_id, n_chunks, n_kept, clean_len, clean_hash) — the cleaned text
    itself stays distributed; the md5 proves byte-identical reassembly.

    Scale shape: chunking is per-row (codegen); the global frequency is ONE
    groupBy on chunk text (map-side combine collapses within-partition
    repeats — boilerplate is by definition repetitive, so the shuffle
    carries ≪ corpus volume); the keep-join shuffles on chunk text; the
    reassembly is one groupBy on doc_id.  No all-pairs anything — cost is
    linear in corpus size at 100 TB.  Hot chunks (the empty-ish tail bucket)
    are bounded because only (chunk → doc count) crosses the wire, never doc
    lists.
    """
    words = words_col(text_col)
    n_chunks = F.ceil(F.size(words) / F.lit(chunk_words)).cast("int")
    # guard: sequence(0, -1) would generate a DESCENDING range, not empty
    chunks = F.when(n_chunks > 0, F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(
            F.slice(words, i * chunk_words + 1, chunk_words), " "),
    )).otherwise(F.array().cast("array<string>"))
    base = df.select(F.col(id_col).alias("doc_id"), chunks.alias("chunks"))
    exploded = base.select("doc_id", F.posexplode("chunks").alias("idx", "chunk"))
    freq = exploded.groupBy("chunk").agg(
        F.countDistinct("doc_id").alias("n_docs"))
    kept = (exploded.join(freq, "chunk")
            .where(F.col("n_docs") <= max_docs)
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_kept"),
                 F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(F.struct("idx", "chunk"))),
                         lambda s: s.getField("chunk")),
                     " ").alias("clean_text")))
    totals = base.select("doc_id", F.size("chunks").alias("n_chunks"))
    return (totals.join(kept, "doc_id", "left")
            .select("doc_id", "n_chunks",
                    F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
                    F.length(F.coalesce("clean_text", F.lit(""))).alias("clean_len"),
                    F.md5(F.coalesce("clean_text", F.lit(""))).alias("clean_hash")))


def ngram_contamination(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 5,
                        bench_mod: int = 97) -> DataFrame:
    """Benchmark-contamination check: fraction of a document's distinct word
    ``n``-grams that appear in a held-out benchmark set (docs with
    ``doc_id % bench_mod == 0`` stand in for the eval corpus).

    → (doc_id, n_ngrams, n_overlap, overlap_frac) for non-benchmark docs.

    Scale shape: eval sets are small and bounded (thousands of items, not
    corpus-scale), so the benchmark n-gram set broadcasts; the corpus side
    is one scan + per-doc aggregation — contamination checking at 100 TB is
    a broadcast-semi-join, never a shuffle of the corpus.
    """
    words = words_col(text_col)
    # docs shorter than n words contribute no n-grams (sequence(1, 0) would
    # generate a DESCENDING range, hence the explicit guard)
    grams = F.when(F.size(words) >= n, F.array_distinct(F.transform(
        F.sequence(F.lit(1), F.size(words) - (n - 1)),
        lambda i: F.array_join(F.slice(words, i, n), " "),
    ))).otherwise(F.array().cast("array<string>"))
    is_bench = (F.col(id_col) % bench_mod) == 0
    base = df.select(F.col(id_col).alias("doc_id"), grams.alias("grams"),
                     is_bench.alias("is_bench"))
    bench_grams = (base.where("is_bench")
                   .select(F.explode("grams").alias("gram")).distinct()
                   .withColumn("hit", F.lit(1)))
    # ONE pass over corpus grams: n_ngrams rides along the explode_outer
    # (docs with no grams keep their row via the null gram), the broadcast
    # left join marks benchmark hits, and a single per-doc aggregation
    # yields both the total and the overlap — the gram arrays are computed
    # once, not once per derived branch
    doc_grams = (base.where(~F.col("is_bench"))
                 .select("doc_id", F.size("grams").alias("n_ngrams"),
                         F.explode_outer("grams").alias("gram")))
    return (doc_grams.join(F.broadcast(bench_grams), "gram", "left")
            .groupBy("doc_id")
            .agg(F.first("n_ngrams").alias("n_ngrams"),
                 F.count("hit").alias("n_overlap"))
            .select("doc_id", "n_ngrams", "n_overlap",
                    (F.col("n_overlap").cast("double")
                     / F.greatest("n_ngrams", F.lit(1))).alias("overlap_frac")))


def pack_sequences(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", budget: int = 512,
                   shard_size: int = 1000) -> DataFrame:
    """Sequence packing for training: documents are concatenated in id order
    and cut into fixed ``budget``-token windows (the GPT-style pack-then-
    chunk policy — a document may straddle a window boundary).

    → (doc_id, shard, n_tokens, start_offset, first_pack, n_packs) where
    ``start_offset`` is the document's token offset within its shard and
    packs are counted per shard.

    Scale shape: a single global running sum would serialize the corpus
    through one task, so packing is SHARDED — each ``shard_size``-id range
    packs independently (shard = doc_id / shard_size), which is exactly how
    a 100 TB tokenization job runs: per-shard prefix sums, embarrassingly
    parallel, deterministic output regardless of cluster layout.  Window
    spec is (partitionBy shard, orderBy doc_id) — partial aggregation within
    a shard's partition, no global ordering anywhere.
    """
    from pyspark.sql import Window

    toks = F.size(F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0)))
    base = df.select(F.col(id_col).alias("doc_id"),
                     F.floor(F.col(id_col) / shard_size).cast("long").alias("shard"),
                     toks.alias("n_tokens"))
    w = (Window.partitionBy("shard").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum("n_tokens").over(w)
    start = (cum - F.col("n_tokens")).alias("start_offset")
    return base.select(
        "doc_id", "shard", "n_tokens", start,
        F.floor((cum - F.col("n_tokens")) / budget).alias("first_pack"),
        # a zero-token doc occupies no window — without the guard the span
        # formula says 1 mid-window but 0 at window boundaries
        F.when(F.col("n_tokens") == 0, F.lit(0).cast("long")).otherwise(
            F.floor((cum - 1) / budget)
            - F.floor((cum - F.col("n_tokens")) / budget) + 1).alias("n_packs"),
    )


# PII patterns shared verbatim with the oracle SQL — plain character-class
# regexes (no lookarounds, no shorthand classes) so Java regex and RE2 parse
# them identically.
PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
PII_NUMBER_RE = "[0-9][0-9][0-9][0-9][0-9][0-9][0-9]+"


def pii_scrub(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """PII redaction pass: emails → ``<EMAIL>``, 7+-digit runs → ``<NUM>``.

    → (doc_id, n_emails, n_numbers, scrubbed_len, scrubbed_hash).  Pure
    per-row regex work inside whole-stage codegen — no shuffle, linear at
    any scale; the md5 witnesses the exact redacted bytes.
    """
    t = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL_RE), F.lit(0)))
    scrub1 = F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>")
    n_numbers = F.size(F.regexp_extract_all(scrub1, F.lit(PII_NUMBER_RE), F.lit(0)))
    scrub2 = F.regexp_replace(scrub1, PII_NUMBER_RE, "<NUM>")
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_emails.alias("n_emails"),
        n_numbers.alias("n_numbers"),
        F.length(scrub2).alias("scrubbed_len"),
        F.md5(scrub2).alias("scrubbed_hash"),
    )


def bigram_lm_score(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    train_df: DataFrame | None = None) -> DataFrame:
    """Model-based quality scoring: an add-one-smoothed bigram LM trained on
    the corpus itself scores each document by its mean bigram probability
    P(w2|w1) = (c(w1w2)+1) / (c(w1)+V) — the cheap statistical stand-in for
    perplexity filtering (Wenzek et al., CCNet), with rational probabilities
    instead of log space so the result is bit-reproducible across engines
    (ln is not; see tfidf_top_terms).

    → (doc_id, n_bigrams, avg_prob).

    Determinism: the per-doc sum of probabilities is a SEQUENTIAL fold over
    the doc's bigrams in position order (collect sorted → F.aggregate), not
    a shuffle-order SUM — double addition is order-sensitive in the last
    ulp and the oracle must reproduce it exactly.

    Scale shape: two count aggregations (bigram and left-word counts, both
    map-side combined), two joins keyed on words (AQE broadcasts the count
    tables when small), one per-doc aggregation.  The per-doc collect is
    bounded by document length, not corpus size.

    ``train_df`` (default: ``df`` itself) is the corpus the LM counts come
    from — pass a different one to score documents under a model of
    ANOTHER distribution (the DSIR importance-weight building block,
    Xie et al. 2023: weight = p_target(doc) / p_background(doc)).  Unseen
    bigrams/left-words fall back to the add-one floor via left joins
    (c→0), which is exactly what the smoothing is for; with
    ``train_df is df`` every join matches and values are unchanged.
    """
    words = words_col(text_col)
    base = df.select(F.col(id_col).alias("doc_id"), words.alias("ws"))

    def _bigrams(frame):
        b = frame.select(F.col(id_col).alias("doc_id"),
                         words_col(text_col).alias("ws"))
        return b.select(
            "doc_id",
            F.posexplode(F.when(F.size("ws") >= 2, F.transform(
                F.sequence(F.lit(1), F.size("ws") - 1),
                lambda i: F.struct(F.element_at("ws", i).alias("w1"),
                                   F.element_at("ws", i + 1).alias("w2")),
            )).otherwise(F.array().cast(
                "array<struct<w1:string,w2:string>>"))).alias("pos", "bg"),
        ).select("doc_id", "pos", "bg.w1", "bg.w2")

    train = train_df if train_df is not None else df
    tr = _bigrams(train)
    c2 = tr.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = tr.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = (train.select(F.explode(words_col(text_col)).alias("w"))
             .agg(F.countDistinct("w").alias("v")).collect()[0]["v"])
    bi = _bigrams(df)
    scored = (bi.join(c2, ["w1", "w2"], "left").join(c1, "w1", "left")
              .withColumn("prob",
                          (F.coalesce("c2", F.lit(0)) + 1).cast("double")
                          / (F.coalesce("c1", F.lit(0))
                             + F.lit(int(vocab))).cast("double")))
    per_doc = (scored.groupBy("doc_id")
               .agg(F.count("*").alias("n_bigrams"),
                    F.aggregate(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct("pos", "prob"))),
                            lambda s: s.getField("prob")),
                        F.lit(0.0), lambda acc, p: acc + p)
                    .alias("sum_prob")))
    return (base.select("doc_id").join(per_doc, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
                    (F.coalesce("sum_prob", F.lit(0.0))
                     / F.greatest("n_bigrams", F.lit(1)))
                    .alias("avg_prob")))


def stratified_sample(df: DataFrame, rates: dict[str, float],
                      stratum_col: str = "lang", key_col: str = "doc_id",
                      default_rate: float = 0.0, salt: str = "strat") -> DataFrame:
    """Per-stratum deterministic subsample — the corpus-rebalancing pass of
    a training-data mix (downsample the majority language, keep the tail).

    Same md5-threshold keep rule as ``deterministic_sample``, but the salt
    incorporates the stratum and each stratum gets its own rate; strata not
    in ``rates`` fall back to ``default_rate``.  Still a pure filter: no
    shuffle, partition-invariant, reproducible on any engine.

    A NULL stratum COALESCEs to '' for both the hash and the rate lookup
    — previously the NULL poisoned concat/md5 and the row vanished from
    the sample regardless of default_rate, silently biasing the mix
    (review finding).
    """
    stratum = F.coalesce(F.col(stratum_col).cast("string"), F.lit(""))
    bucket = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"), stratum,
                                   F.lit(":"),
                                   F.col(key_col).cast("string"))), 1, 15),
        16, 10).cast("long")
    thresh = F.lit(int(default_rate * (1 << 60)))
    for name, rate in sorted(rates.items()):
        thresh = F.when(stratum == name,
                        F.lit(int(rate * (1 << 60)))).otherwise(thresh)
    return df.where(bucket < thresh)


def exact_k_sample(df: DataFrame, k: int, stratum_col: str = "lang",
                   key_col: str = "doc_id", salt: str = "topk") -> DataFrame:
    """Exactly-k-per-stratum deterministic sample: rank every row within its
    stratum by a salted md5 of its key and keep the ``k`` smallest — the
    "give me exactly 10k docs per language" budgeted-curation op.  The rate
    samplers (:func:`deterministic_sample` / :func:`stratified_sample`) keep
    a FRACTION whose realized count fluctuates; this hits ``min(k, |stratum|)``
    exactly, still fully deterministic and engine-reproducible (md5 hex
    ordering is plain byte order in Spark and DuckDB alike).

    Scale shape: one shuffle on the stratum key; per-stratum ordering is a
    rank-truncated window (Spark inserts a per-partition rank limit before
    the final sort at execution), never a global sort.  Adds ``rk`` (1-based
    rank within the stratum's kept set).
    """
    from pyspark.sql import Window

    tag = F.md5(F.concat(F.lit(salt + ":"), F.col(stratum_col), F.lit(":"),
                         F.col(key_col).cast("string")))
    w = Window.partitionBy(stratum_col).orderBy(tag, F.col(key_col))
    return (df.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= k))


def split_assign(df: DataFrame, key_col: str = "doc_id",
                 val_frac: float = 0.05, test_frac: float = 0.05,
                 salt: str = "split") -> DataFrame:
    """Stable train/val/test assignment by salted md5 threshold — the same
    15-hex-nibble / 2^60 bucket arithmetic as :func:`deterministic_sample`,
    cut into three disjoint, exhaustive ranges.  Membership depends only on
    (salt, key), so re-runs, repartitions, and incremental appends never move
    a document across splits (the leakage-safety property train/eval hygiene
    needs).  Adds a ``split`` column; a pure map-side expression, no shuffle.
    """
    bucket = F.conv(F.substring(F.md5(F.concat(
        F.lit(salt + ":"), F.col(key_col).cast("string"))), 1, 15),
        16, 10).cast("long")
    train_hi = int((1.0 - val_frac - test_frac) * (1 << 60))
    val_hi = int((1.0 - test_frac) * (1 << 60))
    return df.withColumn(
        "split",
        F.when(bucket < train_hi, F.lit("train"))
        .when(bucket < val_hi, F.lit("val"))
        .otherwise(F.lit("test")))


def mix_weights(df: DataFrame, stratum_col: str = "lang",
                text_col: str = "text") -> DataFrame:
    """Training-mix design table: per-stratum doc/token counts, the
    proportional token share, and the temperature-α=0.5 weight numerator
    (sqrt of token count) used for tail-upweighting a multilingual mix.

    Exact-arithmetic contract (the reason this hash-gates cleanly): counts
    are integers; ``share`` is ONE double division of two exact integers
    (correctly rounded, engine-agreed); ``sqrt_tokens`` is IEEE-754 sqrt
    (required correctly rounded everywhere).  The NORMALIZED α-weight —
    sqrt_n / Σ sqrt_n — is deliberately left to the consumer: a sum of
    irrational doubles is fold-order-dependent, the one arithmetic class
    the oracle discipline refuses to hash.

    Scale shape: single groupBy(stratum) with map-side partial aggregation;
    the grand total joins back as a broadcast of a 1-row aggregate.
    """
    toks = F.size(F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE),
                                       F.lit(0)))
    per = df.groupBy(stratum_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(toks.cast("long")).alias("n_tokens"))
    total = per.agg(F.sum("n_tokens").alias("total_tokens"))
    return (per.crossJoin(F.broadcast(total))
            .select(stratum_col, "n_docs", "n_tokens",
                    (F.col("n_tokens").cast("double")
                     / F.col("total_tokens")).alias("share"),
                    F.sqrt(F.col("n_tokens").cast("double"))
                    .alias("sqrt_tokens")))


def line_dedup(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """INTRA-document duplicate-line removal, first occurrence kept — the
    within-doc half of the CCNet line-dedup recipe (:func:`chunk_dedup` is
    the across-docs half).  Repeated nav/footer lines inside one page
    collapse to their first occurrence; document order is otherwise
    preserved.

    → (doc_id, n_lines, n_kept, clean_len, clean_hash); the md5 witnesses
    byte-identical reassembly without shipping the cleaned text.

    Scale shape: entirely map-side — split, ``array_distinct`` (which keeps
    FIRST occurrences in encounter order), join, hash are all per-row
    codegen expressions; zero shuffles, so this costs one corpus scan at
    any scale.
    """
    lines = F.split(F.col(text_col), "\n")
    kept = F.array_distinct(lines)
    clean = F.array_join(kept, "\n")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        F.length(clean).alias("clean_len"),
        F.md5(clean).alias("clean_hash"))


def heavy_hitters(df: DataFrame, min_doc_frac: float = 0.2,
                  text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Corpus heavy-hitter terms by DOCUMENT frequency — the boilerplate /
    stop-phrase detector of a curation pipeline: tokens appearing in at
    least ``min_doc_frac`` of all documents.

    Exact and fully distributed: per-doc distinct tokens (``array_distinct``
    BEFORE the explode, so dedup is map-side), one groupBy(word) with
    partial aggregation, and the corpus totals broadcast back as a 1-row
    aggregate.  ``doc_frac`` is one int/int double division (engine-exact).
    The sketch-based variant (count-min over the same stream) lives in the
    gate, where its estimates are tolerance-checked against this exact
    result.
    """
    toks = F.array_distinct(
        F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0)))
    words = df.select(F.col(id_col), F.explode(toks).alias("word"))
    counts = words.groupBy("word").agg(F.count("*").alias("doc_freq"))
    totals = (df.agg(F.count("*").alias("n_docs"))
              .crossJoin(F.broadcast(words.agg(F.count("*").alias("n_adds")))))
    return (counts.crossJoin(F.broadcast(totals))
            .where(F.col("doc_freq")
                   >= F.lit(min_doc_frac) * F.col("n_docs"))
            .select("word", "doc_freq", "n_docs", "n_adds",
                    (F.col("doc_freq").cast("double") / F.col("n_docs"))
                    .alias("doc_frac")))


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


def gopher_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition/composition quality rules (Rae et al. 2021,
    §A1.1 "repetition removal" + "quality filtering" heuristics), the
    n-gram-repetition subset that is line-structure independent:

    - ``dup_2gram_frac`` / ``dup_3gram_frac`` — fraction of word n-grams
      that are repeats (1 − distinct/total); high values flag boilerplate
      loops and keyword stuffing;
    - ``symbol_word_ratio`` — '#' and ellipsis occurrences per word;
    - ``alpha_word_frac`` — fraction of words containing ≥1 alphabetic
      character;
    - ``gopher_pass`` — the conjunctive keep decision at the paper's
      published thresholds (dup n-gram fractions, symbol ratio 0.1,
      80 % alpha words, 50–100k words relaxed to ≥10 for short corpora).

    All pure ``pyspark.sql.functions`` column expressions — exact integer
    counts and rational divisions, zero shuffle, same whole-stage-codegen
    scale shape as :func:`text_stats`; mirrored 1:1 in the gate's oracle.
    """
    words = words_col(text_col)
    lowered = F.transform(words, lambda w: F.lower(w))
    n_words = F.size(words)

    def ngrams(n: int):
        # positions 0..len-n (empty when len < n)
        idx = F.sequence(
            F.lit(0),
            F.greatest(F.size(lowered) - n, F.lit(-1)))
        return F.when(F.size(lowered) < n, F.array()).otherwise(
            F.transform(idx, lambda i: F.concat_ws(
                " ", *[F.element_at(lowered, (i + k + 1).cast("int"))
                       for k in range(n)])))

    def dup_frac(n: int):
        grams = ngrams(n)
        total = F.size(grams)
        return F.when(total <= 0, F.lit(0.0)).otherwise(
            (total - F.size(F.array_distinct(grams))).cast("double")
            / total)

    n_symbols = (F.size(F.split(F.col(text_col), "#", -1)) - 1
                 + F.size(F.split(F.col(text_col), r"\.\.\.", -1)) - 1)
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    out = df.select(
        "*",
        n_words.alias("n_words"),
        dup_frac(2).alias("dup_2gram_frac"),
        dup_frac(3).alias("dup_3gram_frac"),
        (n_symbols.cast("double") / F.greatest(n_words, F.lit(1)))
        .alias("symbol_word_ratio"),
        (n_alpha.cast("double") / F.greatest(n_words, F.lit(1)))
        .alias("alpha_word_frac"),
    )
    return out.withColumn(
        "gopher_pass",
        (F.col("n_words") >= 10)
        & (F.col("dup_2gram_frac") <= 0.2)
        & (F.col("dup_3gram_frac") <= 0.18)
        & (F.col("symbol_word_ratio") <= 0.1)
        & (F.col("alpha_word_frac") >= 0.8))


def corpus_line_dedup(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      max_doc_freq: int = 10) -> DataFrame:
    """ACROSS-corpus duplicate-line removal — the cross-document half of
    the CCNet line-dedup recipe (Wenzek et al. 2020 §3.1 dedup across
    shards; :func:`line_dedup` is the within-doc half): a line appearing in
    more than ``max_doc_freq`` distinct documents is boilerplate
    (nav bars, cookie banners, license headers) and is removed from EVERY
    document that contains it.

    → (doc_id, n_lines, n_kept, clean_len, clean_hash); the md5 witnesses
    byte-identical reassembly without shipping the cleaned text.

    Scale shape: two key-bounded shuffles — (1) line-digest → distinct-doc
    count with partial aggregation (CCNet hashes each line; we group on the
    line itself, same cardinality); (2) per-doc reassembly groupBy.  The
    frequency side joins back by line — AQE broadcasts it when the
    boilerplate table is small, which at 100 TB it is relative to the
    corpus (boilerplate is heavy-hitter by definition).  No driver
    materialization, no all-pairs anything.
    """
    lines = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("ord", "l"))
    freq = (lines.groupBy("l")
            .agg(F.countDistinct("doc_id").alias("line_df")))
    tot = lines.groupBy("doc_id").agg(F.count("*").alias("n_lines"))
    kept = (lines.join(freq, "l")
            .where(F.col("line_df") <= max_doc_freq)
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_kept"),
                 F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.struct(F.col("ord"), F.col("l")))),
                         lambda s: s["l"]),
                     "\n").alias("clean")))
    return (tot.join(kept, "doc_id", "left")
            .select("doc_id", "n_lines",
                    F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
                    F.coalesce(F.length("clean"), F.lit(0)).alias("clean_len"),
                    F.md5(F.coalesce("clean", F.lit(""))).alias("clean_hash")))


def bm25_topk(df: DataFrame, query_terms: list[str], k1: float = 1.5,
              b: float = 0.75, top_k: int = 20, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """BM25 retrieval: top-k documents for a bag-of-terms query
    → (doc_id, rank, score, dl, n_matched).

    The idf factor is the RATIONAL Robertson form ``(N − df + 0.5) /
    (df + 0.5)`` without the usual ``ln`` — same reasoning as
    :func:`tfidf_top_terms`: ``ln`` is not bit-identical across math
    libraries and the gate hashes values exactly.  (This changes absolute
    scores and, unlike tf-idf's per-term monotone case, can reorder docs
    versus log-BM25 when multiple query terms mix — it is a *documented
    scoring variant*, deterministic and cross-engine exact, not a claim of
    log-BM25 rank parity.)

    Per-term scores land in FIXED per-term columns and the total is the
    written-order sum — double addition is not associative, so a
    ``SUM()`` over a nondeterministic row order could drift an ulp between
    engines.  ``avgdl`` is one exact int/int division collected driver-side
    (a bounded scalar, the same pattern as tf-idf's ``n_docs``).

    Scale shape: one corpus scan → explode filtered TO THE QUERY TERMS
    before the (doc, term) groupBy (the shuffle carries only query-term
    postings, not the vocabulary); the per-term doc-freq table is a
    |query|-row broadcast; ranking is TakeOrdered(top_k), never a global
    sort.
    """
    from pyspark.sql import Window

    # set(): a duplicated query term would get TWO score columns both
    # added into the total, double-counting it relative to any BM25
    terms = sorted(set(query_terms))
    k1, b = float(k1), float(b)
    words = words_col(text_col)
    base = df.select(F.col(id_col).alias("doc_id"),
                     F.size(words).alias("dl"),
                     words.alias("words"))
    tf = (base.select("doc_id", "dl", F.explode("words").alias("term"))
          .where(F.col("term").isin(terms))
          .groupBy("doc_id", "dl", "term").agg(F.count("*").alias("tf")))
    dfreq = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))

    stats = df.agg(F.count("*").alias("n"),
                   F.sum(F.size(words)).alias("total_dl")).collect()[0]
    n_docs, avgdl = int(stats["n"]), int(stats["total_dl"]) / int(stats["n"])

    idf = ((F.lit(float(n_docs)) - F.col("df").cast("double") + F.lit(0.5))
           / (F.col("df").cast("double") + F.lit(0.5)))
    denom = (F.col("tf").cast("double")
             + F.lit(k1) * (F.lit(1.0 - b)
                            + F.lit(b) * (F.col("dl").cast("double")
                                          / F.lit(avgdl))))
    score = idf * (F.col("tf").cast("double") * F.lit(k1 + 1.0)) / denom
    scored = tf.join(F.broadcast(dfreq), "term").withColumn("s", score)

    per_doc = scored.groupBy("doc_id", "dl").agg(
        *[F.max(F.when(F.col("term") == t, F.col("s"))).alias(f"s_{i}")
          for i, t in enumerate(terms)],
        F.count("*").alias("n_matched"))
    total = F.lit(0.0)
    for i in range(len(terms)):
        total = total + F.coalesce(F.col(f"s_{i}"), F.lit(0.0))
    ranked = (per_doc.withColumn("score", total)
              .orderBy(F.desc("score"), F.asc("doc_id")).limit(top_k))
    # row_number window is bounded: input is the top_k TakeOrdered rows
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (ranked.withColumn("rank", F.row_number().over(w))
            .select("doc_id", "rank", "score", "dl", "n_matched"))


def inverted_index(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", min_df: int = 1) -> DataFrame:
    """Inverted-index build — the retrieval-side artifact a corpus pipeline
    materializes once so query-time BM25/boolean search never rescans text:
    one row per vocabulary term with its document frequency, total term
    frequency, posting span, and an md5 witness of the full posting list
    ``doc:tf,doc:tf,...`` ordered by doc id (the digest proves
    byte-identical postings without shipping them through the gate).

    → (term, doc_freq, total_tf, first_doc, last_doc, postings_md5).

    Scale shape: explode → (term, doc) count with map-side combine → one
    groupBy(term) whose collect_list is bounded per term by that term's
    document frequency — at 100 TB you shard hot terms by doc-range into
    posting SEGMENTS (term, shard) before this agg; the per-term segment
    list is what real indexes store anyway.  No driver materialization.
    """
    words = df.select(F.col(id_col).alias("doc_id"),
                      F.explode(words_col(text_col)).alias("term"))
    tf = words.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    return (tf.groupBy("term")
            .agg(F.count("*").alias("doc_freq"),
                 F.sum("tf").alias("total_tf"),
                 F.min("doc_id").alias("first_doc"),
                 F.max("doc_id").alias("last_doc"),
                 F.md5(F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.struct("doc_id", "tf"))),
                         lambda s: F.concat(s["doc_id"].cast("string"),
                                            F.lit(":"),
                                            s["tf"].cast("string"))),
                     ",")).alias("postings_md5"))
            .where(F.col("doc_freq") >= min_df))


def bpe_pair_counts(df: DataFrame, top_k: int = 30,
                    text_col: str = "text") -> DataFrame:
    """One BPE-training count step (Sennrich et al. 2016): corpus-wide
    frequencies of ADJACENT SYMBOL PAIRS inside words — the argmax of this
    table is the pair a byte-pair-encoding tokenizer merges next, and at
    100 TB this count is exactly the map-reduce a distributed tokenizer
    trainer runs per merge round.

    → (pair, n) top-``top_k`` by count, ties on pair ASC.  Symbols here are
    single characters (round 0 of BPE); later rounds re-run the same count
    over re-segmented words, so the operator shape is the loop body.

    Scale shape: per-row explode of words then in-word adjacent pairs
    (codegen expressions), ONE groupBy(pair) with map-side combine — pair
    cardinality is tiny (alphabet²-bounded), so the shuffle is trivially
    small regardless of corpus size; top-k is TakeOrdered, not a sort.
    """
    words = df.select(F.explode(words_col(text_col)).alias("w"))
    pairs = words.select(F.explode(F.transform(
        F.sequence(F.lit(1), F.greatest(F.length("w") - 1, F.lit(1))),
        lambda i: F.col("w").substr(i, F.lit(2)))).alias("pair"))
    return (pairs.where(F.length("pair") == 2)
            .groupBy("pair").agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), F.asc("pair")).limit(top_k))


def dup_window_stats(df: DataFrame, window_tokens: int = 10,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Exact-substring duplication statistics at fixed token granularity —
    the measurable core of exact-substring dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): for every
    document, how many of its ``window_tokens``-token sliding windows also
    occur verbatim in ANOTHER document.  High ``dup_frac`` docs are the
    removal candidates of the suffix-array method; this windowed variant
    is its distributable fixed-granularity approximation.

    → (doc_id, n_windows, n_dup_windows, dup_frac).

    Scale shape: windows are per-row expressions (posexplode of md5
    digests — only 16-byte hashes leave the row, never window text); ONE
    groupBy(hash) with map-side combine for the corpus frequency; the
    join back is hash-keyed; the per-doc rollup is a count.  Same
    linear-cost discipline as chunk_dedup, at stride 1 instead of
    disjoint chunks.
    """
    words = words_col(text_col)
    base = df.select(F.col(id_col).alias("doc_id"), words.alias("ws"))
    win = base.select(
        "doc_id",
        F.explode(F.when(
            F.size("ws") >= window_tokens,
            F.transform(
                F.sequence(F.lit(1), F.size("ws") - (window_tokens - 1)),
                lambda i: F.md5(F.array_join(
                    F.slice("ws", i, window_tokens), " "))))
            .otherwise(F.array().cast("array<string>"))).alias("wh"))
    freq = win.groupBy("wh").agg(F.countDistinct("doc_id").alias("df"))
    per_doc = (win.join(freq, "wh")
               .groupBy("doc_id")
               .agg(F.count("*").alias("n_windows"),
                    F.sum(F.when(F.col("df") > 1, 1).otherwise(0))
                    .alias("n_dup_windows")))
    return (base.select("doc_id").join(per_doc, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
                    F.coalesce("n_dup_windows", F.lit(0))
                    .alias("n_dup_windows"),
                    (F.coalesce("n_dup_windows", F.lit(0)).cast("double")
                     / F.greatest(F.coalesce("n_windows", F.lit(0)),
                                  F.lit(1)).cast("double"))
                    .alias("dup_frac")))


def span_dedup_removal(df: DataFrame, window_tokens: int = 10,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Exact-substring duplicate REMOVAL at fixed token granularity — the
    removal half of the Lee et al. 2022 suffix-array method whose measuring
    half is :func:`dup_window_stats`.  Every ``window_tokens``-token sliding
    window that occurs verbatim in MORE THAN ONE document is kept only in
    its canonical owner (the min ``doc_id`` containing it); every other
    document drops the token positions that window covers.  The canonical
    owner keeps its text untouched, so exactly one copy of each duplicated
    span survives corpus-wide and the decision is deterministic (no
    tie-break ambiguity, re-runs identical).

    → (doc_id, n_tokens, n_removed, kept_hash) for EVERY input document
    (NULL text = empty doc, zero windows); the md5 witnesses the exact
    post-removal token stream without shipping cleaned text.

    Scale shape: windows are per-row expressions (only 16-byte hashes and
    int offsets leave the row); ONE groupBy(hash) with map-side combine
    computes corpus frequency + canonical owner together; the join back is
    hash-keyed; removed-start lists aggregate per doc (bounded by doc
    length); the final mask is a per-row array expression over a
    materialized covered-position column (computed ONCE per row — inlining
    it in the filter lambda would re-evaluate the flatten per token, the
    documented no-CSE hazard of nested higher-order functions).  Nothing is
    all-pairs; cost is linear in corpus token count like chunk_dedup.
    """
    words = words_col(F.coalesce(F.col(text_col), F.lit("")))
    base = df.select(F.col(id_col).alias("doc_id"), words.alias("ws"))
    win = (base.select(
        "doc_id",
        F.explode(F.when(
            F.size("ws") >= window_tokens,
            F.transform(
                F.sequence(F.lit(1), F.size("ws") - (window_tokens - 1)),
                lambda i: F.struct(
                    i.cast("int").alias("s"),
                    F.md5(F.array_join(F.slice("ws", i, window_tokens),
                                       " ")).alias("wh"))))
            .otherwise(F.array().cast("array<struct<s:int,wh:string>>")))
        .alias("u"))
        .select("doc_id", F.col("u.s").alias("s"), F.col("u.wh").alias("wh")))
    freq = win.groupBy("wh").agg(
        F.countDistinct("doc_id").alias("ndocs"),
        F.min("doc_id").alias("keeper"))
    rem = (win.join(freq, "wh")
           .where((F.col("ndocs") > 1) & (F.col("doc_id") != F.col("keeper")))
           .groupBy("doc_id")
           .agg(F.array_sort(F.collect_set("s")).alias("rs")))
    rs = F.coalesce(F.col("rs"), F.array().cast("array<int>"))
    cov = F.array_distinct(F.flatten(F.transform(
        rs, lambda s: F.sequence(s, s + (window_tokens - 1)))))
    masked = (base.join(rem, "doc_id", "left")
              .select("doc_id", "ws", cov.alias("cov")))
    kept = F.filter("ws", lambda x, i: ~F.array_contains("cov", i + 1))
    return masked.select(
        "doc_id",
        F.size("ws").cast("long").alias("n_tokens"),
        (F.size("ws") - F.size(kept)).cast("long").alias("n_removed"),
        F.md5(F.array_join(kept, " ")).alias("kept_hash"))


def global_shuffle(df: DataFrame, shards: int = 8, salt: str = "shuf",
                   key_col: str = "doc_id") -> DataFrame:
    """Deterministic corpus-wide training-order shuffle + sharding: every
    record gets a pseudo-random but fully reproducible (shard, pos)
    address derived only from (salt, key) — the "shuffle the corpus before
    training" step, stable across re-runs, repartitions, and engine
    versions (md5, not partition-dependent ``rand``).  Changing the salt
    is a fresh epoch-independent reshuffle.

    → input columns + (shard, pos); ``pos`` is the record's 1-based
    position within its shard when shard contents are read in key order.

    Scale shape: the shard id and sort key are map-side expressions; the
    only shuffle is the per-shard ``row_number`` window, which partitions
    by shard — NEVER a global window.  At 100 TB, ``shards`` is chosen
    ∝ corpus size (e.g. one shard per target output file), keeping every
    window partition bounded; writers then ``repartition(shard)`` +
    ``sortWithinPartitions(pos)`` for sequential training reads.
    """
    if shards < 1:
        raise ValueError("shards must be >= 1")
    k = F.md5(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string")))
    shard = (F.conv(F.substring(k, 1, 8), 16, 10).cast("long")
             % shards).cast("int")
    from pyspark.sql.window import Window
    w = (Window.partitionBy("shard")
         .orderBy(F.col("_shuffle_key"), F.col(key_col)))
    return (df.withColumn("_shuffle_key", k)
            .withColumn("shard", shard)
            .withColumn("pos", F.row_number().over(w).cast("long"))
            .drop("_shuffle_key"))


def bpe_apply(df: DataFrame, merges: list[tuple[str, str]],
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Apply a trained BPE merge list — the ENCODE half of the tokenizer
    whose TRAIN count step is ``bpe_pair_counts`` (Sennrich et al. 2016).

    True BPE is a per-word priority loop (repeatedly merge the
    highest-ranked adjacent pair present, leftmost first, until none
    applies).  That loop is genuinely imperative — a chained literal
    REPLACE diverges from it on ≥3 consecutive occurrences of one pair
    (e.g. ``aaaaaa`` with merge ``(a,a)`` is [aa,aa,aa] under BPE but
    [aa,a,aa,a] at the REPLACE fixpoint) — so this is one of the repo's
    few deliberate Python kernels: an Arrow-batched ``mapInPandas`` with a
    per-batch word-level memo cache (Zipf makes the cache hit rate high;
    the loop runs once per DISTINCT word per batch).

    → (doc_id, n_tokens_bpe, tokens_md5): token count after merging, plus
    an md5 witness of the space-joined token stream.

    Scale shape: map-only (no shuffle, no state); merges ship inside the
    closure exactly like ANN centroids/codebooks ship as literals —
    trained offline, broadcast with the task.  Cost is linear in corpus
    bytes; the memo cache amortizes the merge loop across repeated words.
    """
    import hashlib
    from collections.abc import Iterator

    import pandas as pd

    ranks = {pair: i for i, pair in enumerate(merges)}

    def encode_word(w: str, memo: dict) -> list[str]:
        got = memo.get(w)
        if got is not None:
            return got
        syms = list(w)
        while len(syms) > 1:
            best_rank, best_i = None, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_i is None:
                break
            syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        memo[w] = syms
        return syms

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict = {}
        for pdf in batches:
            out_id, out_n, out_md5 = [], [], []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                toks: list[str] = []
                for w in (text or "").split():
                    toks.extend(encode_word(w, memo))
                out_id.append(rid)
                out_n.append(len(toks))
                out_md5.append(hashlib.md5(
                    " ".join(toks).encode("utf-8")).hexdigest())
            yield pd.DataFrame({id_col: out_id, "n_tokens_bpe": out_n,
                                "tokens_md5": out_md5})

    return df.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} long, n_tokens_bpe long, tokens_md5 string")


def context_chunks(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", window: int = 64,
                   stride: int = 48) -> DataFrame:
    """Split each document's token stream into overlapping context windows
    (size ``window``, step ``stride`` — the BERT/embedding-model chunking
    recipe; the complement of ``pack_sequences``, which packs SHORT docs up,
    while this cuts LONG docs down).  Chunk count is
    ``1 + ceil((n - window)/stride)`` for ``n > window`` else 1, so every
    token is covered and consecutive chunks overlap by ``window - stride``.

    → (doc_id, chunk_idx, start_tok, n_tok, chunk_hash); the md5 witnesses
    the exact token slice without shipping chunk text.

    Scale shape: pure in-row array expressions (tokenize once, slice per
    chunk) + one explode — no shuffle at all; whole-stage codegen end to
    end.  Chunks-per-doc is bounded by doc length, the explode is linear in
    corpus token count.
    """
    if stride <= 0 or window <= 0 or stride > window:
        raise ValueError("need 0 < stride <= window")
    # NULL text normalizes to the empty document (one empty chunk) — the
    # same row-preserving contract as the other text operators; without
    # the coalesce a NULL doc would silently vanish from the output
    words = words_col(F.coalesce(F.col(text_col), F.lit("")))
    n = F.size(words)
    # ceil((n-window)/stride) via integer arithmetic; 0 when n <= window
    extra = F.when(
        n <= window, F.lit(0)
    ).otherwise(((n - window + (stride - 1)) / stride).cast("int"))
    chunks = F.sequence(F.lit(0), extra)  # ascending: 0..n_chunks-1
    ex = df.select(id_col, words.alias("w"),
                   F.explode(chunks).alias("chunk_idx"))
    start = F.col("chunk_idx") * stride
    piece = F.slice(F.col("w"), start + 1, window)
    return ex.select(
        id_col,
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        start.cast("int").alias("start_tok"),
        F.size(piece).alias("n_tok"),
        F.md5(F.array_join(piece, " ")).alias("chunk_hash"))


def normalize_url(url) -> "Column":
    """Canonicalize a URL column for web-corpus dedup (the C4/RefinedWeb
    recipe): URLs that differ only in scheme case, host case, default
    port, fragment, tracking parameters, trailing slash, or query-param
    order are the SAME page and must dedup together.

    Steps (pure ``pyspark.sql.functions`` — codegen'd, no UDF):
      1. strip the fragment (#...)
      2. lowercase scheme + host (path stays case-sensitive)
      3. drop default ports (:80 for http, :443 for https)
      4. drop tracking params (utm_*, fbclid, gclid, ref, mc_cid, mc_eid)
      5. sort surviving query params (order never distinguishes pages)
      6. drop a trailing slash on non-root paths and an empty '?'

    Returns a string Column; compose with ``F.md5`` for the dedup key.
    """
    from pyspark.sql import functions as F

    c = url if not isinstance(url, str) else F.col(url)
    no_frag = F.regexp_replace(c, r"#.*$", "")
    # scheme://host[:port] lowercased; rest untouched
    scheme = F.lower(F.regexp_extract(no_frag, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(no_frag, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    rest = F.regexp_extract(no_frag, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1)
    host = F.when((scheme == "http") & hostport.rlike(":80$"),
                  F.regexp_replace(hostport, r":80$", "")) \
        .when((scheme == "https") & hostport.rlike(":443$"),
              F.regexp_replace(hostport, r":443$", "")) \
        .otherwise(hostport)
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    TRACKING = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref|mc_cid|mc_eid)="
    params = F.filter(
        F.when(query == "", F.array().cast("array<string>"))
        .otherwise(F.split(query, "&")),
        lambda p: (p != "") & ~p.rlike(TRACKING))
    sorted_q = F.array_join(F.array_sort(params), "&")
    # trailing slash off non-root paths; EMPTY path unifies with '/'
    # ('http://x' and 'http://x/' are the same resource, RFC 3986 §6.2.3
    # — the two most common homepage spellings must dedup together)
    norm_path = F.when(path == "", F.lit("/")) \
        .when(path.rlike("^/.+/$"),
              F.regexp_replace(path, "/$", "")).otherwise(path)
    base = F.concat(scheme, F.lit("://"), host, norm_path)
    return F.when(c.isNull(), F.lit(None).cast("string")) \
        .when(scheme == "", c) \
        .otherwise(F.when(sorted_q == "", base)
                   .otherwise(F.concat(base, F.lit("?"), sorted_q)))


# Unicode text normalization (web-corpus cleanup).  Three JVM-side regex
# passes — no Python in the hot path (the UDF-is-the-slow-path rule; a
# 100 TB cleanup wants whole-stage codegen, and regexp_replace is).
_CTRL_ZW_CLASS = ("[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f"
                  "\\u200b-\\u200d\\ufeff]")
_USPACE_CLASS = "[\\u00a0\\u1680\\u2000-\\u200a\\u202f\\u205f\\u3000]"


def clean_text_col(col: "Column | str") -> Column:
    """Normalized text: control + zero-width characters removed, unicode
    space variants mapped to ASCII space, whitespace runs collapsed,
    ends trimmed.  NULL propagates (no data fabrication for missing
    text — the tukey_winsorize lesson).

    Order matters: zero-width removal BEFORE collapsing (a ZWSP between
    two spaces must not split the run), unicode-space mapping before the
    collapse so mixed runs fold to one ASCII space.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, _CTRL_ZW_CLASS, "")
    c = F.regexp_replace(c, _USPACE_CLASS, " ")
    c = F.regexp_replace(c, "[ \\t\\r\\n]+", " ")
    return F.trim(c)


def pps_systematic_sample(df: DataFrame, step: int,
                          text_col: str = "text", id_col: str = "doc_id",
                          shard_size: int = 1000) -> DataFrame:
    """Systematic probability-proportional-to-size sampling: lay documents
    end-to-end on a token axis (id order) and take one sample at every
    ``step``-th token — a doc is selected with probability exactly
    proportional to its length, long docs can be drawn multiple times
    (``n_hits``), and the whole draw is deterministic with NO random
    state.  The classic survey-sampling PPS design, used in training-data
    mixes to sample text mass rather than document count.

    → (doc_id, shard, n_tokens, n_hits, selected): a doc spanning tokens
    (cum - n, cum] within its shard is hit once per multiple of ``step``
    in that interval: n_hits = cum div step - (cum - n) div step.

    Scale shape: the token axis is SHARDED by id range (the pack_sequences
    discipline) — per-shard prefix sums, embarrassingly parallel, no
    global ordering; the sampling fraction is unchanged because every
    shard samples at the same rate.
    """
    from pyspark.sql import Window

    if step < 1:
        # step=0 is a DIVIDE_BY_ZERO mid-job under ANSI mode; negative
        # steps yield garbage selections — the context_chunks refusal rule
        raise ValueError(f"pps_systematic_sample: step must be >= 1, "
                         f"got {step}")
    toks = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0)))
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.floor(F.col(id_col) / shard_size).cast("long").alias("shard"),
        toks.alias("n_tokens"))
    w = (Window.partitionBy("shard").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum("n_tokens").over(w)
    hits = (F.expr(f"_po_cum div {step}")
            - F.expr(f"(_po_cum - n_tokens) div {step}"))
    return (base.withColumn("_po_cum", cum)
            .select("doc_id", "shard", "n_tokens",
                    hits.cast("long").alias("n_hits"),
                    (hits > 0).alias("selected")))


def nfc_md5_col(df: DataFrame, text_col: str = "text",
                out_col: str = "nfc_md5") -> DataFrame:
    """Append md5 of the NFC-normalized text — the Unicode-correctness
    dedup key: canonically-equivalent strings (é precomposed U+00E9 vs
    e + combining acute U+0301) byte-differ but MUST dedup together in a
    multilingual corpus; NFC is the W3C-recommended canonical form.
    Arrow-batched pandas transform (Python owns unicodedata; Spark has no
    normalization builtin); DuckDB's ``nfc_normalize`` reproduces it
    oracle-side.  Map-only — the dedup join downstream shuffles digests.
    The UDF itself lives in ``udfs.py``: this module's future-annotations
    import stringifies type hints, which breaks pandas_udf inference."""
    from ..udfs import nfc_md5_udf

    return df.withColumn(out_col, nfc_md5_udf(F.col(text_col)))


#: UTF-8-read-as-latin1 artifact: a char in the UTF-8 LEAD-byte range
#: U+00C2-U+00F4 (2-, 3-, and 4-byte sequence leads) followed by a char
#: in the continuation-byte range U+0080-U+00BF — e.g. U+00C3 U+00A9 is
#: mojibake for e-acute, U+00E2 U+0080 U+0099 for the right single
#: quote.  Built from chr() codes so the source stays ASCII-clean.
MOJIBAKE_RE = ("[" + chr(0xC2) + "-" + chr(0xF4) + "]["
               + chr(0x80) + "-" + chr(0xBF) + "]")


def mojibake_repair_col(s: Column | str) -> Column:
    """Detect-and-repair double-encoding damage (ftfy's core case): a
    string whose UTF-8 bytes were decoded as latin-1 shows artifact
    pairs like A-tilde + copyright-sign where the source had e-acute;
    the repair is the inverse transcode — re-encode as ISO-8859-1
    (codepoint == byte) and decode the bytes as UTF-8.  Entirely
    JVM-side: ``decode(encode(s))`` built-ins guarded by a
    :data:`MOJIBAKE_RE` artifact test, no UDF.

    Heuristic by nature (documented, not hidden): a string that
    legitimately contains an artifact-shaped pair is transcoded too, and
    mixed content with codepoints > U+00FF would lose them to ``?`` —
    the guard keeps repair off strings with no artifact evidence, which
    is the standard corpus-cleaning trade."""
    c = F.col(s) if isinstance(s, str) else s
    return F.when(
        F.regexp_count(c, F.lit(MOJIBAKE_RE)) > 0,
        F.decode(F.encode(c, "ISO-8859-1"), "UTF-8")).otherwise(c)


def compression_ratio_df(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id",
                         level: int = 6) -> DataFrame:
    """Per-document zlib compression ratio — the Gopher-family
    "too compressible = boilerplate/repetition" curation signal (and its
    inverse, ratio ~> 1 = high-entropy noise/binary-in-text).  Python
    zlib IS the capability here (Arrow-batched mapInPandas, the codec
    class); ``level`` is pinned because the ratio is level-dependent.

    → (doc_id, n_bytes, comp_bytes, ratio_millis): byte counts exact,
    ratio as integer millis (comp*1000 // raw) so downstream thresholds
    stay engine-exact.  Map-only; 100 TB shape is one scan."""
    import pandas as pd

    def run(batches):
        import zlib as _z

        for pdf in batches:
            out = {"doc_id": [], "n_bytes": [], "comp_bytes": [],
                   "ratio_millis": []}
            for did, t in zip(pdf[id_col], pdf[text_col]):
                # row-preserving like the sibling operators: a NULL text
                # is an empty document, never a silently-vanished row
                raw = b"" if t is None else str(t).encode("utf-8")
                comp = _z.compress(raw, level)
                out["doc_id"].append(int(did))
                out["n_bytes"].append(len(raw))
                out["comp_bytes"].append(len(comp))
                out["ratio_millis"].append(
                    len(comp) * 1000 // len(raw) if raw else 0)
            yield pd.DataFrame(out)

    return df.mapInPandas(
        run, schema=("doc_id long, n_bytes long, comp_bytes long, "
                     "ratio_millis long"))
