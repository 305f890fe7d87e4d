"""Training-data text operators: chunk dedup, contamination, sequence
packing, PII scrubbing, k-means assignment (pipeline.text / .similarity).

The oracle gate proves engine parity at corpus scale; these tests pin the
EDGE semantics: empty/short docs, boundary-straddling packs, tie-breaks.
"""

import random
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from pigeon_optics_spark.pipeline.similarity import kmeans_assign, kmeans_train
from pigeon_optics_spark.pipeline.text import (
    chunk_dedup,
    ngram_contamination,
    pack_sequences,
    pii_scrub,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestChunkDedup:
    def test_boilerplate_dropped_everywhere(self, spark):
        boiler = " ".join(f"b{i}" for i in range(10))
        uniq = ["u v w x y z a1 b2 c3 d4", "k l m n o p q r s t", "solo"]
        rows = [(i, f"{boiler} {u}") for i, u in enumerate(uniq)]
        out = {r["doc_id"]: r for r in
               chunk_dedup(_docs(spark, rows), max_docs=2).collect()}
        # the shared first chunk appears in 3 docs (> max_docs) → dropped;
        # each doc keeps only its unique tail chunk
        assert out[0]["n_chunks"] == 2 and out[0]["n_kept"] == 1
        assert out[2]["n_kept"] == 1  # 'solo' is a partial chunk, kept
        assert out[2]["clean_len"] == len("solo")

    def test_empty_and_fully_dropped_docs_survive(self, spark):
        boiler = " ".join(f"b{i}" for i in range(10))
        rows = [(0, ""), (1, boiler), (2, boiler), (3, boiler)]
        out = {r["doc_id"]: r for r in
               chunk_dedup(_docs(spark, rows), max_docs=2).collect()}
        assert out[0]["n_chunks"] == 0 and out[0]["clean_len"] == 0
        # boilerplate in 3 docs → all chunks dropped, but rows remain
        assert out[1]["n_kept"] == 0 and out[1]["clean_len"] == 0
        assert len(out) == 4

    def test_reassembly_preserves_order(self, spark):
        words = " ".join(f"w{i:03d}" for i in range(25))
        out = chunk_dedup(_docs(spark, [(0, words)]), max_docs=5).collect()[0]
        assert out["n_chunks"] == 3 and out["n_kept"] == 3
        assert out["clean_len"] == len(words)


class TestContamination:
    def test_overlap_counts(self, spark):
        # doc 0 is the benchmark (0 % 97 == 0); doc 1 shares its text
        # entirely, doc 2 shares nothing
        bench = "alpha beta gamma delta epsilon zeta"
        rows = [(0, bench), (1, bench), (2, "one two three four five six")]
        out = {r["doc_id"]: r for r in
               ngram_contamination(_docs(spark, rows), n=5).collect()}
        assert 0 not in out  # benchmark rows excluded from the report
        assert out[1]["n_overlap"] == out[1]["n_ngrams"] == 2
        assert out[1]["overlap_frac"] == 1.0
        assert out[2]["n_overlap"] == 0

    def test_short_doc_has_no_ngrams(self, spark):
        rows = [(0, "a b c d e f"), (1, "too short")]
        out = {r["doc_id"]: r for r in
               ngram_contamination(_docs(spark, rows), n=5).collect()}
        assert out[1]["n_ngrams"] == 0 and out[1]["overlap_frac"] == 0.0


class TestPackSequences:
    def test_offsets_and_straddling(self, spark):
        # three docs of 300 tokens in one shard, budget 512:
        # doc0 [0,300) → pack 0; doc1 [300,600) straddles packs 0-1;
        # doc2 [600,900) → pack 1 only
        text = " ".join("tok" for _ in range(300))
        rows = [(0, text), (1, text), (2, text)]
        out = {r["doc_id"]: r for r in
               pack_sequences(_docs(spark, rows), budget=512).collect()}
        assert [out[i]["start_offset"] for i in range(3)] == [0, 300, 600]
        assert out[0]["n_packs"] == 1 and out[0]["first_pack"] == 0
        assert out[1]["n_packs"] == 2
        assert out[2]["first_pack"] == 1 and out[2]["n_packs"] == 1

    def test_shards_pack_independently(self, spark):
        text = " ".join("tok" for _ in range(100))
        rows = [(0, text), (1500, text)]  # different shards at shard_size=1000
        out = {r["doc_id"]: r for r in
               pack_sequences(_docs(spark, rows), budget=512,
                              shard_size=1000).collect()}
        assert out[0]["shard"] == 0 and out[1500]["shard"] == 1
        # each shard starts its own offset space
        assert out[1500]["start_offset"] == 0


class TestPiiScrub:
    def test_redaction(self, spark):
        rows = [(0, "mail me at a.b+c@test-site.org or call 12345678 now"),
                (1, "clean text no pii"),
                (2, "short digits 123456 stay")]
        out = {r["doc_id"]: r for r in pii_scrub(_docs(spark, rows)).collect()}
        assert out[0]["n_emails"] == 1 and out[0]["n_numbers"] == 1
        assert out[1]["n_emails"] == 0 and out[1]["n_numbers"] == 0
        assert out[2]["n_numbers"] == 0  # 6 digits < threshold
        # scrubbed text replaces, never deletes surrounding content
        assert out[0]["scrubbed_len"] == len(
            "mail me at <EMAIL> or call <NUM> now")


class TestKmeansAssign:
    def test_nearest_and_tiebreak(self, spark):
        rows = [
            (0, [0.0, 0.0]),   # centroid 0
            (1, [10.0, 10.0]),  # centroid 1
            (2, [1.0, 0.0]),   # near centroid 0
            (3, [9.0, 10.0]),  # near centroid 1
            (4, [5.0, 5.0]),   # EQUIDISTANT → tie to smaller cid
        ]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = {r["vec_id"]: r for r in kmeans_assign(emb, k=2).collect()}
        assert out[0]["centroid"] == 0 and out[0]["dist2"] == 0.0
        assert out[2]["centroid"] == 0
        assert out[3]["centroid"] == 1
        assert out[4]["centroid"] == 0  # tie-break

    def test_assignment_plan_is_map_only(self, spark):
        emb = spark.createDataFrame(
            [(i, [float(i), 1.0]) for i in range(20)],
            "vec_id long, embedding array<float>")
        plan = kmeans_assign(emb, k=4)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # no shuffle: pure per-row expression


class TestProductQuantization:
    def _emb(self, spark, n=40, dim=16):
        # deterministic spread-out vectors
        rows = [(i, [float((i * 7 + d * 3) % 13) for d in range(dim)])
                for i in range(n)]
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def test_codebook_vectors_encode_to_themselves(self, spark):
        from pigeon_optics_spark.pipeline.similarity import pq_encode

        emb = self._emb(spark)
        out = {r["vec_id"]: r["codes"] for r in
               pq_encode(emb, m=4, k=8).collect()}
        # a codeword-source vector has d2 == 0 against its own codeword in
        # every subspace → encodes to its own id (no duplicate codewords in
        # this fixture)
        for j in range(8):
            assert out[j] == [j, j, j, j]

    def test_adc_ranks_reconstruction_error(self, spark):
        from pigeon_optics_spark.pipeline.similarity import pq_topk

        emb = self._emb(spark)
        out = pq_topk(emb.where("vec_id < 2"), emb, m=4, k=8, topk=3).collect()
        assert {r["query_id"] for r in out} == {0, 1}
        for r in out:
            assert r["neighbor_id"] != r["query_id"]
            assert r["adc_dist2"] >= 0.0
        # ranks are dense 1..3 per query
        ranks = sorted(r["rank"] for r in out if r["query_id"] == 0)
        assert ranks == [1, 2, 3]

    def test_encode_plan_is_map_only(self, spark):
        from pigeon_optics_spark.pipeline.similarity import pq_encode

        emb = self._emb(spark)
        plan = pq_encode(emb, m=4, k=8)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan


class TestBigramLm:
    def test_probabilities_and_short_docs(self, spark):
        from pigeon_optics_spark.pipeline.text import bigram_lm_score

        rows = [(0, "a b a b"), (1, "a b"), (2, "solo"), (3, "")]
        out = {r["doc_id"]: r for r in
               bigram_lm_score(_docs(spark, rows)).collect()}
        # corpus bigrams: doc0: (a,b),(b,a),(a,b); doc1: (a,b)
        # c(a,b)=3, c(b,a)=1; bigram-left counts c1(a)=3, c1(b)=1; V=3
        p_ab = (3 + 1) / (3 + 3)
        p_ba = (1 + 1) / (1 + 3)
        assert out[0]["n_bigrams"] == 3
        assert abs(out[0]["avg_prob"] - (p_ab + p_ba + p_ab) / 3) < 1e-15
        assert out[1]["avg_prob"] == p_ab
        # <2 words → no bigrams, zero score, row retained
        assert out[2]["n_bigrams"] == 0 and out[2]["avg_prob"] == 0.0
        assert out[3]["n_bigrams"] == 0


class TestGopherQuality:
    def test_repetition_and_composition_rules(self, spark):
        from pigeon_optics_spark.pipeline.text import gopher_quality

        rows = [
            (0, "the quick brown fox jumps over a lazy dog while the sun"
                " sets slowly behind them"),
            (1, "buy now buy now buy now buy now buy now"),   # 2-gram loop
            (2, "# # # # # # # # # # tag soup everywhere ..."),
            (3, "1 2 3 4 5 6 7 8 9 10 11 12"),                # no alpha words
            (4, ""),                                           # empty
            (5, "one two"),                                    # < 3 words
        ]
        out = {r["doc_id"]: r for r in
               gopher_quality(_docs(spark, rows)).collect()}
        # doc1: grams ["buy now"]*5 + ["now buy"]*4 -> 9 grams, 2 distinct
        assert abs(out[1]["dup_2gram_frac"] - 7 / 9) < 1e-15
        assert not out[1]["gopher_pass"]
        # doc2: 10 '#' + 1 '...' over 14 words
        assert abs(out[2]["symbol_word_ratio"] - 11 / 14) < 1e-15
        assert not out[2]["gopher_pass"]
        # doc3: zero alpha words
        assert out[3]["alpha_word_frac"] == 0.0
        assert not out[3]["gopher_pass"]
        # empty/short docs: defined ratios, no crash, fail the length rule
        assert out[4]["n_words"] == 0 and out[4]["dup_2gram_frac"] == 0.0
        assert out[5]["dup_2gram_frac"] == 0.0 and out[5]["dup_3gram_frac"] == 0.0
        assert not out[4]["gopher_pass"] and not out[5]["gopher_pass"]
        # doc0: clean English sentence, long enough, passes
        assert out[0]["gopher_pass"]

    def test_plan_is_map_only(self, spark):
        from pigeon_optics_spark.pipeline.text import gopher_quality

        plan = gopher_quality(_docs(spark, [(0, "a b c")]))._jdf \
            .queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestCurationOps:
    def _docs_lang(self, spark, n=40):
        rows = [(i, f"word{i} text body {'x ' * (i % 7)}",
                 ["en", "de", "es"][i % 3]) for i in range(n)]
        return spark.createDataFrame(rows, "doc_id long, text string, lang string")

    def test_exact_k_budget_and_determinism(self, spark):
        from pigeon_optics_spark.pipeline.text import exact_k_sample

        docs = self._docs_lang(spark)
        out = exact_k_sample(docs, 5).collect()
        per = {}
        for r in out:
            per.setdefault(r["lang"], []).append((r["rk"], r["doc_id"]))
        # exactly k per stratum, ranks 1..k, stable across re-runs and
        # repartitionings
        assert all(sorted(rk for rk, _ in v) == [1, 2, 3, 4, 5]
                   for v in per.values())
        again = exact_k_sample(docs.repartition(7), 5).collect()
        assert sorted((r["lang"], r["rk"], r["doc_id"]) for r in again) == \
            sorted((r["lang"], r["rk"], r["doc_id"]) for r in out)

    def test_exact_k_small_stratum_keeps_all(self, spark):
        from pigeon_optics_spark.pipeline.text import exact_k_sample

        docs = spark.createDataFrame(
            [(1, "a", "en"), (2, "b", "en"), (3, "c", "zh")],
            "doc_id long, text string, lang string")
        out = exact_k_sample(docs, 10).collect()
        assert len(out) == 3  # min(k, |stratum|)

    def test_split_assign_disjoint_exhaustive_stable(self, spark):
        from pigeon_optics_spark.pipeline.text import split_assign

        docs = self._docs_lang(spark, 200)
        out = {r["doc_id"]: r["split"] for r in split_assign(docs).collect()}
        assert len(out) == 200
        assert set(out.values()) <= {"train", "val", "test"}
        # membership is a pure function of doc_id: a subset gets the
        # identical assignment (append-stability / no leakage)
        sub = {r["doc_id"]: r["split"]
               for r in split_assign(docs.where("doc_id < 50")).collect()}
        assert all(out[d] == s for d, s in sub.items())
        # map-only: no shuffle in the plan
        plan = split_assign(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_mix_weights_exact_arithmetic(self, spark):
        from pigeon_optics_spark.pipeline.text import mix_weights

        docs = spark.createDataFrame(
            [(1, "one two three", "en"), (2, "vier funf", "de"),
             (3, "six seven eight nine", "en")],
            "doc_id long, text string, lang string")
        out = {r["lang"]: r for r in mix_weights(docs).collect()}
        assert out["en"]["n_docs"] == 2 and out["en"]["n_tokens"] == 7
        assert out["de"]["n_tokens"] == 2
        assert out["en"]["share"] == 7 / 9 and out["de"]["share"] == 2 / 9
        assert out["de"]["sqrt_tokens"] == 2 ** 0.5
        # the 1-row grand total joins as a broadcast, not a shuffle join
        plan = mix_weights(docs)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan

    def test_heavy_hitters_doc_frequency(self, spark):
        from pigeon_optics_spark.pipeline.text import heavy_hitters

        # 'common' in 4/5 docs (repeats inside a doc count once);
        # 'rare' in 1/5
        rows = [(i, "common common filler" + (" rare" if i == 0 else ""))
                for i in range(4)] + [(4, "other words only")]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["word"]: r for r in heavy_hitters(docs, 0.5).collect()}
        assert "rare" not in out
        assert out["common"]["doc_freq"] == 4
        assert out["common"]["doc_frac"] == 4 / 5
        assert out["common"]["n_adds"] == sum(
            len(set(t.split())) for _, t in rows)

    def test_line_dedup_first_occurrence_order(self, spark):
        from pigeon_optics_spark.pipeline.text import line_dedup

        # pins array_distinct's first-occurrence-in-order semantics, which
        # the operator (and its oracle's MIN(ord) reconstruction) rely on
        text = "nav\nbody one\nnav\nbody two\nfooter\nnav\nfooter"
        out = line_dedup(spark.createDataFrame(
            [(1, text)], "doc_id long, text string")).collect()[0]
        clean = "nav\nbody one\nbody two\nfooter"
        import hashlib
        assert (out["n_lines"], out["n_kept"]) == (7, 4)
        assert out["clean_len"] == len(clean)
        assert out["clean_hash"] == hashlib.md5(clean.encode()).hexdigest()


class TestKmeansTrain:
    def _py_train(self, rows, k, iters, quant=10000):
        """Pure-Python Lloyd replica of kmeans_train's integer contract."""
        import math

        def quantize(v):
            return [math.floor(float(x) * float(quant)) for x in v]

        q = {i: quantize(v) for i, v in rows}
        dim = len(next(iter(q.values())))
        means = [[float(c) for c in q[i]] for i in sorted(q)[:k]]

        def assign():
            out = {}
            for i, qv in q.items():
                best = min(
                    (sum((float(qv[d]) - mv[d]) ** 2 for d in range(dim)), j)
                    for j, mv in enumerate(means))
                out[i] = best
            return out

        for _ in range(iters):
            a = assign()
            sums = defaultdict(lambda: [0] * dim)
            cnt = Counter()
            for i, (_, j) in a.items():
                cnt[j] += 1
                for d in range(dim):
                    sums[j][d] += q[i][d]
            means = [[sums[j][d] / cnt[j] for d in range(dim)]
                     if cnt[j] else means[j] for j in range(k)]
        return assign()

    def test_matches_python_replica_exactly(self, spark):
        rng = random.Random(42)
        rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = {r["vec_id"]: (r["dist2"], r["centroid"])
               for r in kmeans_train(emb, k=4, iters=2).collect()}
        # spark floats truncate to float32 on ingest — replicate that
        import struct
        f32 = lambda x: struct.unpack("f", struct.pack("f", x))[0]
        want = self._py_train([(i, [f32(x) for x in v]) for i, v in rows],
                              k=4, iters=2)
        assert got == want  # EXACT double equality incl. dist2

    def test_empty_cell_keeps_previous_centroid(self, spark):
        # seeds 0 and 1 are identical → in iteration 1 every point ties (or
        # loses) to cid 0, cell 1 goes EMPTY and must keep its seed centroid
        # [0,0]; in iteration 2 the origin points then flip back to cell 1
        # (whose retained centroid is nearer than cell 0's dragged mean)
        rows = [(0, [0.0, 0.0]), (1, [0.0, 0.0]),
                (2, [10.0, 10.0]), (3, [0.1, 0.0])]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = {r["vec_id"]: r["centroid"]
               for r in kmeans_train(emb, k=2, iters=2).collect()}
        assert out == {0: 1, 1: 1, 2: 0, 3: 1}
        want = self._py_train(rows, k=2, iters=2)
        assert out == {i: j for i, (_, j) in want.items()}

    def test_final_pass_plan_is_map_only(self, spark):
        emb = spark.createDataFrame(
            [(i, [float(i % 5), 1.0]) for i in range(20)],
            "vec_id long, embedding array<float>")
        plan = (kmeans_train(emb, k=2, iters=1)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" not in plan  # assignment is a pure per-row expr


class TestNormalizeUrl:
    def test_canonicalization_cases(self, spark):
        from pigeon_optics_spark.pipeline.text import normalize_url

        cases = [
            # (input, expected)
            ("HTTP://Example.COM:80/Path/?b=2&a=1#frag",
             "http://example.com/Path?a=1&b=2"),
            ("https://example.com:443/x/", "https://example.com/x"),
            ("https://example.com/", "https://example.com/"),  # root slash kept
            ("https://example.com/a?utm_source=tw&utm_campaign=x&id=7",
             "https://example.com/a?id=7"),
            ("https://example.com/a?fbclid=abc&gclid=def",
             "https://example.com/a"),
            ("https://example.com/a?z=1&y=2&z=0",
             "https://example.com/a?y=2&z=0&z=1"),
            ("https://example.com:8443/a", "https://example.com:8443/a"),
            ("http://example.com:8080/a", "http://example.com:8080/a"),
            ("ftp://Host/A", "ftp://host/A"),       # path case preserved
            ("not a url", "not a url"),             # schemeless passthrough
            (None, None),
        ]
        df = spark.createDataFrame(
            [(i, u) for i, (u, _) in enumerate(cases)], "i long, url string")
        got = {r["i"]: r["norm"]
               for r in df.select("i", normalize_url("url").alias("norm"))
               .collect()}
        for i, (inp, want) in enumerate(cases):
            assert got[i] == want, f"{inp!r}: {got[i]!r} != {want!r}"

    def test_dedup_key_collapses_equivalent_urls(self, spark):
        from pigeon_optics_spark.pipeline.text import normalize_url
        from pyspark.sql import functions as F

        urls = ["http://A.com/p?x=1&utm_source=s#top",
                "HTTP://a.com:80/p/?x=1",
                "http://a.com/p?utm_campaign=c&x=1"]
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        n = df.select(F.md5(normalize_url("url")).alias("k")) \
            .distinct().count()
        assert n == 1


class TestCleanTextCol:
    ADVERSARIAL = [
        "plain single spaced",
        "double  spaces\tand\ttabs",
        "crlf\r\nline\nbreaks",
        "nbsp here and em-space",
        "zero​width‍joined﻿",
        "ctrl\x01chars\x07embedded\x7f",
        " leading and trailing  ",
        "mixed ​  \t run collapse",
        "",
        "   ",
        "　ideographic　space　",
    ]

    @staticmethod
    def _reference(s: str) -> str:
        import re as _re

        s = _re.sub("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f"
                    "​-‍﻿]", "", s)
        s = _re.sub("[   -   　]", " ", s)
        s = _re.sub("[ \t\r\n]+", " ", s)
        return s.strip()

    def test_matches_python_reference(self, spark):
        from pigeon_optics_spark.pipeline.text import clean_text_col

        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(self.ADVERSARIAL)],
            "id long, text string")
        got = {r["id"]: r["c"]
               for r in df.select(
                   "id", clean_text_col("text").alias("c")).collect()}
        for i, s in enumerate(self.ADVERSARIAL):
            assert got[i] == self._reference(s), (i, s)

    def test_null_propagates(self, spark):
        from pigeon_optics_spark.pipeline.text import clean_text_col

        df = spark.createDataFrame([(1, None)], "id long, text string")
        assert df.select(clean_text_col("text").alias("c")
                         ).collect()[0]["c"] is None

    def test_oracle_prep_parity_duckdb(self, spark):
        """The gate oracle's defensive strip (RE2 spellings) must agree
        with clean_text_col on PRE-dirtied source text — the class that
        only bites when a future testdata round ships such characters."""
        import duckdb

        from pigeon_optics_spark.pipeline.text import clean_text_col

        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(self.ADVERSARIAL)],
            "id long, text string")
        spark_clean = {r["id"]: r["c"]
                       for r in df.select(
                           "id",
                           clean_text_col("text").alias("c")).collect()}
        con = duckdb.connect()
        expr = (r"trim(regexp_replace(regexp_replace(regexp_replace(s, "
                r"'[\x00-\x08\x0b\x0c\x0e-\x1f\x7f\x{200b}-\x{200d}"
                r"\x{feff}]', '', 'g'), "
                r"'[\x{00a0}\x{1680}\x{2000}-\x{200a}\x{202f}\x{205f}"
                r"\x{3000}]', ' ', 'g'), '[ \t\r\n]+', ' ', 'g'))")
        for i, s in enumerate(self.ADVERSARIAL):
            duck = con.execute(f"SELECT {expr} FROM (SELECT ? AS s)",
                               [s]).fetchone()[0]
            assert duck == spark_clean[i], (i, s, duck, spark_clean[i])


def test_cusum_fold_matches_python_replica(spark):
    """CUSUM control-chart fold: Spark's aggregate() must execute the
    exact IEEE sequence of the Python reference — alarms, resets, and
    the final statistic bit-for-bit (the EWMA sequential-fold class,
    extended to a struct accumulator with a branch)."""
    import random

    from pigeon_optics_spark.queries.events_queries import cusum_state_col
    from pyspark.sql import functions as F

    rng = random.Random(20260814)
    rows = []
    for u in range(25):
        for i in range(rng.randint(1, 80)):
            rows.append((u, i, round(rng.uniform(0, 300), 2)))
    df = spark.createDataFrame(rows, "user_id long, seq long, value double")
    seq = (df.groupBy("user_id")
           .agg(F.array_sort(F.collect_list(F.struct("seq", "value")))
                .alias("s")))
    st = cusum_state_col(F.col("s").getField("value"))
    got = {r["user_id"]: (r["fs"], r["na"])
           for r in seq.select("user_id",
                               st.getField("s").alias("fs"),
                               st.getField("n").alias("na")).collect()}
    import collections

    series = collections.defaultdict(list)
    for u, i, v in sorted(rows):
        series[u].append(v)
    for u, vs in series.items():
        s, n = 0.0, 0
        for x in vs:
            t = max(0.0, s + (x - 55.25))
            if t > 250.5:
                s, n = 0.0, n + 1
            else:
                s = t
        assert got[u] == (s, n), u


def test_pps_systematic_sample_replica(spark):
    """Pure-Python replica: per-shard token axis, one hit per step-th
    token; total hits == floor(shard_tokens/step) summed over shards and
    every hit count matches the interval arithmetic."""
    import re

    from pigeon_optics_spark.pipeline.text import TOKEN_RE, pps_systematic_sample

    rows = [(i, ("w " * (i % 13)).strip()) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    step, shard_size = 5, 16
    got = {r["doc_id"]: (r["shard"], r["n_tokens"], r["n_hits"], r["selected"])
           for r in pps_systematic_sample(
               df, step=step, shard_size=shard_size).collect()}
    cums: dict[int, int] = {}
    for i, text in rows:
        n = len(re.findall(TOKEN_RE, text))
        shard = i // shard_size
        before = cums.get(shard, 0)
        after = before + n
        cums[shard] = after
        hits = after // step - before // step
        assert got[i] == (shard, n, hits, hits > 0), i
    total_hits = sum(v[2] for v in got.values())
    assert total_hits == sum(c // step for c in cums.values())
    assert any(v[2] > 1 for v in got.values())  # multi-hit long doc
    assert any(v[2] == 0 for v in got.values())  # zero-token docs skipped


class TestNgramsUdtf:
    def test_lateral_sql_and_python_replica(self, spark):
        """Native Python UDTF (§2.10): LATERAL expansion matches a pure
        replica, including the empty (short-text) and NULL branches."""
        from pigeon_optics_spark.udfs import register_ngrams_udtf

        register_ngrams_udtf(spark)
        df = spark.createDataFrame(
            [(1, "hello"), (2, "ab"), (3, None)], "doc_id long, text string")
        df.createOrReplaceTempView("po_udtf_docs")
        got = [(r.doc_id, r.pos, r.gram) for r in spark.sql(
            "SELECT t.doc_id, g.pos, g.gram "
            "FROM po_udtf_docs t, LATERAL po_ngrams(t.text, 3) g").collect()]
        want = [(1, i, "hello"[i:i + 3]) for i in range(3)]
        assert sorted(got) == want  # doc 2 too short, doc 3 NULL -> no rows


def test_rate_limit_fold_matches_python_replica(spark):
    """Token-bucket fold: Spark's aggregate() must execute the exact
    integer sequence of the Python reference — refill shift, capacity
    clamp, admission decisions, sentinel first event.  Gap pattern is
    adversarial: zero gaps (same-ts bursts), exact-refill-boundary gaps
    (k * 8192 s), and long gaps that clamp at capacity."""
    import random

    from pigeon_optics_spark.queries.events_queries import (
        _RL_CAP,
        _RL_COST,
        _RL_SHIFT,
        rate_limit_state_col,
    )
    from pyspark.sql import functions as F

    rng = random.Random(20260815)
    rows = []
    for u in range(20):
        t = 1_700_000_000_000_000  # epoch micros
        for i in range(rng.randint(1, 60)):
            gap = rng.choice([0, 1, 8192 * 10**6, 8192 * 10**6 - 1,
                              rng.randint(1, 10**11)])
            t += gap
            rows.append((u, i, t))
    df = spark.createDataFrame(rows, "user_id long, seq long, t long")
    agg = (df.groupBy("user_id")
           .agg(F.array_sort(F.collect_list(F.struct("seq", "t")))
                .alias("s")))
    st = rate_limit_state_col(F.col("s").getField("t"))
    got = {r["user_id"]: (r["tok"], r["a"], r["d"])
           for r in agg.select("user_id",
                               st.getField("tok").alias("tok"),
                               st.getField("a").alias("a"),
                               st.getField("d").alias("d")).collect()}
    import collections

    series = collections.defaultdict(list)
    for u, i, t in sorted(rows):
        series[u].append(t)
    n_denies = 0
    for u, ts in series.items():
        tok, last, a, d = _RL_CAP, -1, 0, 0
        for t in ts:
            refill = 0 if last == -1 else (t - last) >> _RL_SHIFT
            tok = min(_RL_CAP, tok + refill)
            if tok >= _RL_COST:
                tok, a = tok - _RL_COST, a + 1
            else:
                d += 1
            last = t
        assert got[u] == (tok, a, d), u
        n_denies += d
    assert n_denies > 0  # the adversarial gaps must exercise the deny branch


def test_mojibake_repair_col_semantics(spark):
    """mojibake_repair_col: true mojibake transcodes back to the
    original, clean strings (ASCII, real accents, CJK) pass through
    untouched because the guard sees no artifact pair."""
    from pyspark.sql import functions as F

    from pigeon_optics_spark.pipeline.text import mojibake_repair_col

    originals = [
        "caf" + chr(0xE9),                     # cafe-acute
        "na" + chr(0xEF) + "ve r" + chr(0xE9) + "sum" + chr(0xE9),
        chr(0x2019) + "smart quote" + chr(0x2019),   # U+2019 (3-byte UTF-8)
    ]
    def moji(s):  # what latin-1 misdecoding does to the UTF-8 bytes
        return s.encode("utf-8").decode("latin-1")
    rows = ([(moji(s), s) for s in originals]            # damaged -> original
            + [("plain ascii", "plain ascii")]           # untouched
            + [(originals[0], originals[0])]             # real accent kept
            + [("CJK " + chr(0x4E2D) + chr(0x6587),
                "CJK " + chr(0x4E2D) + chr(0x6587))])    # guard: no transcode
    df = spark.createDataFrame([(d,) for d, _ in rows], "dirty string")
    got = [r["c"] for r in
           df.select(mojibake_repair_col("dirty").alias("c")).collect()]
    for (dirty, want), g in zip(rows, got):
        assert g == want, (dirty, g, want)
