"""Whole-corpus invariants for the training-data operators, checked against
independent pure-Python recomputation on a seeded pseudo-random corpus.

These are the in-repo analogue of the DuckDB oracle gate: same math,
different engine (plain Python), exact equality — including float paths,
which match because both sides fold sequentially in double precision.
"""

import hashlib
import random

import pytest

from pigeon_optics_spark.pipeline.similarity import pq_encode
from pigeon_optics_spark.pipeline.text import (
    bigram_lm_score,
    chunk_dedup,
    ngram_contamination,
    pack_sequences,
)

VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
         "theta", "iota", "kappa", "the", "and", "x1", "y22", "z333"]


@pytest.fixture(scope="module")
def corpus():
    rng = random.Random(20260813)
    rows = []
    for i in range(120):
        n = rng.choice([0, 1, 3, 9, 10, 11, 25, 40])
        rows.append((i, " ".join(rng.choice(VOCAB) for _ in range(n))))
    return rows


def _words(text):
    return [w for w in text.strip().split() if w]


def test_chunk_dedup_identity_when_nothing_drops(spark, corpus):
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           chunk_dedup(df, chunk_words=10, max_docs=10**9).collect()}
    for doc_id, text in corpus:
        ws = _words(text)
        clean = " ".join(" ".join(ws[i:i + 10])
                         for i in range(0, len(ws), 10))
        r = out[doc_id]
        assert r["n_chunks"] == r["n_kept"] == (len(ws) + 9) // 10
        assert r["clean_len"] == len(clean)
        assert r["clean_hash"] == hashlib.md5(clean.encode()).hexdigest()


def test_pack_sequences_matches_python_prefix_sums(spark, corpus):
    from pigeon_optics_spark.pipeline.text import TOKEN_RE
    import re

    tok = re.compile(TOKEN_RE)
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           pack_sequences(df, budget=64, shard_size=50).collect()}
    shards = {}
    for doc_id, text in corpus:  # corpus is already doc_id-ordered
        n = len(tok.findall(text))
        shard = doc_id // 50
        start = shards.get(shard, 0)
        shards[shard] = start + n
        r = out[doc_id]
        assert r["shard"] == shard and r["n_tokens"] == n
        assert r["start_offset"] == start
        assert r["first_pack"] == start // 64
        want_packs = 0 if n == 0 else (start + n - 1) // 64 - start // 64 + 1
        assert r["n_packs"] == want_packs


def test_contamination_matches_python(spark, corpus):
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           ngram_contamination(df, n=5, bench_mod=7).collect()}
    def grams(text):
        ws = _words(text)
        return {" ".join(ws[i:i + 5]) for i in range(len(ws) - 4)} \
            if len(ws) >= 5 else set()
    bench = set()
    for doc_id, text in corpus:
        if doc_id % 7 == 0:
            bench |= grams(text)
    for doc_id, text in corpus:
        if doc_id % 7 == 0:
            assert doc_id not in out
            continue
        g = grams(text)
        r = out[doc_id]
        assert r["n_ngrams"] == len(g)
        assert r["n_overlap"] == len(g & bench)


def test_bigram_lm_matches_python_exactly(spark, corpus):
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    out = {r["doc_id"]: r for r in bigram_lm_score(df).collect()}
    c2, c1, vocab, doc_bis = {}, {}, set(), {}
    for doc_id, text in corpus:
        ws = _words(text)
        vocab |= set(ws)
        bis = list(zip(ws, ws[1:]))
        doc_bis[doc_id] = bis
        for b in bis:
            c2[b] = c2.get(b, 0) + 1
            c1[b[0]] = c1.get(b[0], 0) + 1
    v = len(vocab)
    for doc_id, bis in doc_bis.items():
        r = out[doc_id]
        assert r["n_bigrams"] == len(bis)
        # Python sum() folds left-to-right from 0 — same order as the
        # engine's position-sorted F.aggregate, so equality is EXACT
        want = sum((c2[b] + 1) / (c1[b[0]] + v) for b in bis) \
            / max(len(bis), 1)
        assert r["avg_prob"] == want


def test_pq_codes_match_python_argmin(spark):
    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # float32 storage: recompute from the values Spark actually holds
    stored = {r["vec_id"]: r["embedding"]
              for r in emb.orderBy("vec_id").collect()}
    m, k, dsub = 4, 8, 4
    cb = [[stored[j][s * dsub:(s + 1) * dsub] for j in range(k)]
          for s in range(m)]
    out = {r["vec_id"]: r["codes"] for r in pq_encode(emb, m=m, k=k).collect()}
    for i, vec in stored.items():
        want = []
        for s in range(m):
            sub = vec[s * dsub:(s + 1) * dsub]
            best = None
            for j in range(k):
                d = 0.0
                for x, y in zip(sub, cb[s][j]):
                    d += (float(x) - float(y)) * (float(x) - float(y))
                if best is None or d < best[0]:
                    best = (d, j)
            want.append(best[1])
        assert out[i] == want, f"vec {i}"
