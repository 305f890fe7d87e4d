"""Pure-Python recomputation checks for the round-5 continuation operators
(same contract as test_pipeline_property.py: seeded pseudo-random corpus,
exact equality including double paths — both sides fold sequentially)."""

import hashlib
import random
from collections import Counter, defaultdict

import pytest

from pigeon_optics_spark.pipeline.text import (
    bm25_topk,
    bpe_pair_counts,
    corpus_line_dedup,
    dup_window_stats,
    inverted_index,
)

VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
         "theta", "iota", "kappa", "the", "and", "x1", "y22", "z333"]


@pytest.fixture(scope="module")
def corpus():
    rng = random.Random(20260814)
    rows = []
    for i in range(100):
        n = rng.choice([0, 1, 5, 12, 20, 30])
        rows.append((i, " ".join(rng.choice(VOCAB) for _ in range(n))))
    # guaranteed duplicated 10-token run across two docs
    rows.append((100, " ".join(VOCAB[:12])))
    rows.append((101, " ".join(VOCAB[:12])))
    return rows


def _words(text):
    return [w for w in text.strip().split() if w]


def test_inverted_index_matches_python(spark, corpus):
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {r["term"]: r for r in inverted_index(df).collect()}

    postings = defaultdict(Counter)
    for doc_id, text in corpus:
        for w in _words(text):
            postings[w][doc_id] += 1
    assert set(got) == set(postings)
    for term, cnt in postings.items():
        r = got[term]
        docs = sorted(cnt)
        assert r["doc_freq"] == len(docs)
        assert r["total_tf"] == sum(cnt.values())
        assert (r["first_doc"], r["last_doc"]) == (docs[0], docs[-1])
        want = ",".join(f"{d}:{cnt[d]}" for d in docs)
        assert r["postings_md5"] == hashlib.md5(want.encode()).hexdigest()


def test_bpe_pair_counts_matches_python(spark, corpus):
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = [(r["pair"], r["n"]) for r in
           bpe_pair_counts(df, top_k=10).collect()]

    counts = Counter()
    for _, text in corpus:
        for w in _words(text):
            for i in range(len(w) - 1):
                counts[w[i:i + 2]] += 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == want


def test_bm25_matches_python(spark, corpus):
    terms = sorted(["alpha", "the", "z333"])
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           bm25_topk(df, terms, top_k=1000).collect()}

    docs = {d: _words(t) for d, t in corpus}
    n_docs = len(docs)
    avgdl = sum(len(w) for w in docs.values()) / n_docs
    dfreq = {t: sum(1 for ws in docs.values() if t in ws) for t in terms}
    expected = {}
    for d, ws in docs.items():
        dl = len(ws)
        total, matched = 0.0, 0
        for t in terms:  # written order = sorted order, like the operator
            tf = ws.count(t)
            if not tf:
                continue
            matched += 1
            idf = (float(n_docs) - float(dfreq[t]) + 0.5) / (float(dfreq[t]) + 0.5)
            total = total + idf * (float(tf) * 2.5) / (
                float(tf) + 1.5 * (0.25 + 0.75 * (float(dl) / avgdl)))
        if matched:
            expected[d] = (total, dl, matched)
    assert set(got) == set(expected)
    for d, (score, dl, matched) in expected.items():
        r = got[d]
        assert r["score"] == score  # exact: same fold order both sides
        assert (r["dl"], r["n_matched"]) == (dl, matched)
    # rank order: score desc, doc_id asc
    ranked = sorted(got.values(), key=lambda r: r["rank"])
    assert all(a["rank"] < b["rank"] for a, b in zip(ranked, ranked[1:]))
    assert ranked == sorted(ranked, key=lambda r: (-r["score"], r["doc_id"]))


def test_corpus_line_dedup_matches_python(spark):
    # deterministic multi-line fixture with cross-doc collisions
    rows = [(i, "\n".join(f"ln{(i * 3 + j * j) % 7}" for j in range(4)))
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           corpus_line_dedup(df, max_doc_freq=8).collect()}

    docfreq = Counter()
    for d, text in rows:
        for ln in set(text.split("\n")):
            docfreq[ln] += 1
    for d, text in rows:
        lines = text.split("\n")
        kept = [ln for ln in lines if docfreq[ln] <= 8]
        clean = "\n".join(kept)
        r = got[d]
        assert r["n_lines"] == len(lines)
        assert r["n_kept"] == len(kept)
        assert r["clean_len"] == len(clean)
        assert r["clean_hash"] == hashlib.md5(clean.encode()).hexdigest()


def test_dup_window_stats_matches_python(spark, corpus):
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {r["doc_id"]: r for r in dup_window_stats(df).collect()}

    windows = {}
    for d, text in corpus:
        ws = _words(text)
        windows[d] = [" ".join(ws[i:i + 10])
                      for i in range(len(ws) - 9)] if len(ws) >= 10 else []
    docs_per_window = defaultdict(set)
    for d, wlist in windows.items():
        for w in wlist:
            docs_per_window[w].add(d)
    for d, wlist in windows.items():
        n_dup = sum(1 for w in wlist if len(docs_per_window[w]) > 1)
        r = got[d]
        assert r["n_windows"] == len(wlist)
        assert r["n_dup_windows"] == n_dup
        assert r["dup_frac"] == n_dup / max(len(wlist), 1)
    # the planted pair must register as fully duplicated
    assert got[100]["n_dup_windows"] == got[100]["n_windows"] > 0


@pytest.fixture(scope="module")
def event_rows():
    import datetime
    rng = random.Random(20260815)
    base = datetime.datetime(2024, 3, 1)
    rows = []
    for i in range(400):
        rows.append((
            i,
            base + datetime.timedelta(seconds=rng.randrange(0, 3 * 86400)),
            rng.randrange(0, 12),
            rng.choice(["view", "click", "purchase", "signup"]),
        ))
    # planted tie: two same-user same-ts events (the oracle-tiebreak class)
    t = base + datetime.timedelta(seconds=999)
    rows.append((400, t, 3, "view"))
    rows.append((401, t, 3, "purchase"))
    return rows


def _events_df(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string")


def test_attribution_matches_python(spark, event_rows):
    import pigeon_optics_spark.queries.events_queries as EQ

    df = _events_df(spark, event_rows)
    orig = EQ.load_events
    EQ.load_events = lambda s, d: df
    try:
        got = {r["purchase_id"]: r for r in
               EQ.events_attribution(spark, "ignored").collect()}
    finally:
        EQ.load_events = orig

    by_user = {}
    for eid, ts, uid, et in sorted(event_rows, key=lambda r: (r[1], r[0])):
        by_user.setdefault(uid, []).append((eid, ts, et))
    expected = {}
    for uid, seq in by_user.items():
        last_touch = None
        for eid, ts, et in seq:
            if et == "purchase":
                if last_touch and (ts - last_touch[1]).total_seconds() <= 86400:
                    expected[eid] = (last_touch[2], last_touch[0], last_touch[1])
                else:
                    expected[eid] = (None, None, None)
            if et in ("click", "view"):
                last_touch = (eid, ts, et)
    assert set(got) == set(expected)
    for pid, (atype, tid, tts) in expected.items():
        r = got[pid]
        assert r["attributed_type"] == atype
        assert r["touch_id"] == tid
        assert (r["touch_ts"] == tts) or (tts is None and r["touch_ts"] is None)


def test_gapfill_matches_python(spark, event_rows):
    import pigeon_optics_spark.queries.events_queries as EQ
    import datetime

    df = _events_df(spark, event_rows)
    orig = EQ.load_events
    EQ.load_events = lambda s, d: df
    try:
        got = {(r["user_id"], r["hr"]): r for r in
               EQ.events_resample_gapfill(spark, "ignored").collect()}
    finally:
        EQ.load_events = orig

    def trunc(ts):
        return ts.replace(minute=0, second=0, microsecond=0)

    per_user = {}
    for eid, ts, uid, et in event_rows:
        if uid < 40:
            per_user.setdefault(uid, []).append(ts)
    expected = {}
    for uid, tss in per_user.items():
        h, last = trunc(min(tss)), trunc(max(tss))
        counts = {}
        for ts in tss:
            counts[trunc(ts)] = counts.get(trunc(ts), 0) + 1
        while h <= last:
            expected[(uid, h)] = counts.get(h, 0)
            h += datetime.timedelta(hours=1)
    assert set(got) == set(expected)
    for k, n in expected.items():
        assert got[k]["n_events"] == n
        assert got[k]["is_gap"] == (n == 0)
    assert any(n == 0 for n in expected.values())  # gaps actually exist


def test_throttle_planted_tie_is_deterministic(spark, event_rows):
    """The planted same-(user, ts) pair must produce the same keep flags on
    every run — ordering ties break on event_id."""
    import pigeon_optics_spark.queries.events_queries as EQ

    df = _events_df(spark, event_rows)
    orig = EQ.load_events
    EQ.load_events = lambda s, d: df
    try:
        a = {r["event_id"]: r["keep"] for r in
             EQ.events_throttle_dedup(spark, "ignored").collect()}
        b = {r["event_id"]: r["keep"] for r in
             EQ.events_throttle_dedup(spark, "ignored").collect()}
    finally:
        EQ.load_events = orig
    assert a == b and len(a) == len(event_rows)


# ---------------------------------------------------------------------------
# bpe_apply: true merge-loop semantics vs an independent replica
# ---------------------------------------------------------------------------

def _ref_bpe(word, merges):
    """Independent reference: repeatedly apply the HIGHEST-priority pair
    present (leftmost occurrence), textbook Sennrich encode order."""
    syms = list(word)
    while True:
        present = [(merges.index((a, b)), i)
                   for i, (a, b) in enumerate(zip(syms, syms[1:]))
                   if (a, b) in merges]
        if not present:
            return syms
        _, i = min(present)
        syms[i:i + 2] = [syms[i] + syms[i + 1]]


def test_bpe_apply_matches_reference(spark):
    from pigeon_optics_spark.pipeline.text import bpe_apply
    import hashlib

    merges = [("a", "a"), ("t", "h"), ("th", "e"), ("aa", "aa"),
              ("k", "e"), ("ke", "y")]
    rows = [(0, "the key aaaaaa"),       # run of 6: [aa,aa,aa] then (aa,aa)
            (1, "aaa theth keykey"),
            (2, ""),                      # empty doc
            (3, "zzz unmergeable"),
            (4, "aaaaaaa the")]           # odd-length run
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens_bpe"], r["tokens_md5"])
           for r in bpe_apply(df, merges).collect()}
    for doc_id, text in rows:
        toks = []
        for w in text.split():
            toks.extend(_ref_bpe(w, merges))
        md5 = hashlib.md5(" ".join(toks).encode()).hexdigest()
        assert got[doc_id] == (len(toks), md5), doc_id
    # the exact case where a REPLACE-chain would diverge: priority order
    # matters — (a,a) outranks (aa,aa), so aaaaaa → aa,aa,aa → aaaa, aa
    assert _ref_bpe("aaaaaa", merges) == ["aaaa", "aa"]


def test_bpe_apply_memo_is_batch_safe(spark):
    # many repeated words across rows: memoized path must equal cold path
    from pigeon_optics_spark.pipeline.text import bpe_apply

    merges = [("t", "h"), ("th", "e")]
    rows = [(i, "the " * (i % 3 + 1)) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["n_tokens_bpe"] for r in bpe_apply(df, merges).collect()}
    assert out == {i: i % 3 + 1 for i in range(50)}  # 'the' → 1 token each


# ---------------------------------------------------------------------------
# context-window chunking: pure-Python replica + boundary cases
# ---------------------------------------------------------------------------


def test_context_chunks_matches_python_replica(spark):
    import hashlib

    from pigeon_optics_spark.pipeline.text import context_chunks

    W, S = 5, 3
    rows = [
        (0, ""),                                  # empty → one empty chunk
        (1, "a b c"),                             # n < W
        (2, "a b c d e"),                         # n == W exactly
        (3, "a b c d e f"),                       # n == W+1 → 2 chunks
        (4, " ".join(f"t{i}" for i in range(11))),  # (n-W) % S == 0
        (5, " ".join(f"u{i}" for i in range(12))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["doc_id"], r["chunk_idx"]):
           (r["start_tok"], r["n_tok"], r["chunk_hash"])
           for r in context_chunks(df, window=W, stride=S).collect()}

    expect = {}
    for doc_id, text in rows:
        toks = text.split()
        n = len(toks)
        n_chunks = 1 if n <= W else 1 + -(-(n - W) // S)
        for c in range(n_chunks):
            piece = toks[c * S: c * S + W]
            expect[(doc_id, c)] = (
                c * S, len(piece),
                hashlib.md5(" ".join(piece).encode()).hexdigest())
    assert got == expect
    # coverage invariant: every token index falls inside >= 1 chunk
    for doc_id, text in rows:
        n = len(text.split())
        covered = set()
        for (d, c), (start, ln, _) in expect.items():
            if d == doc_id:
                covered.update(range(start, start + ln))
        assert covered == set(range(n))


def test_context_chunks_rejects_bad_stride(spark):
    import pytest as _pytest

    from pigeon_optics_spark.pipeline.text import context_chunks

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        context_chunks(df, stride=0)
    with _pytest.raises(ValueError):
        context_chunks(df, window=4, stride=5)


# ---------------------------------------------------------------------------
# embedding covariance: exact recompute in numpy-free Python
# ---------------------------------------------------------------------------


def test_embedding_covariance_matches_python_replica(spark):
    from pigeon_optics_spark.pipeline.similarity import embedding_covariance

    vecs = [
        [0.5, -0.25, 0.125],
        [1.0, 0.0, -1.0],
        [0.333, 0.667, 0.999],
        [-0.5, -0.5, 0.5],
    ]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vecs)],
                               "vec_id long, embedding array<double>")
    out = {(r["i"], r["j"]): r for r in
           embedding_covariance(df, grid=10_000).collect()}

    import math
    q = [[math.floor(x * 10_000) for x in v] for v in vecs]
    n = len(q)
    d = 3
    assert set(out) == {(i, j) for i in range(d) for j in range(i, d)}
    for i in range(d):
        for j in range(i, d):
            s_i = sum(row[i] for row in q)
            s_j = sum(row[j] for row in q)
            s_ij = sum(row[i] * row[j] for row in q)
            r = out[(i, j)]
            assert (r["n"], r["s_i"], r["s_j"], r["s_ij"]) == \
                (n, s_i, s_j, s_ij)
            # same fixed op order as the engine expression
            expect_cov = (float(s_ij) - float(s_i) * float(s_j)
                          / float(n)) / float(n)
            assert r["cov"] == expect_cov  # exact: same IEEE sequence


def test_pca_project_matches_numpy(spark):
    """pca_project's distributed pieces (covariance pass + map-only
    projection) must reproduce a straight numpy PCA on the quantized grid."""
    import numpy as np

    from pigeon_optics_spark.pipeline.similarity import pca_project

    rng = np.random.RandomState(7)
    # anisotropic cloud: one dominant direction
    base = rng.randn(40, 1) @ np.array([[3.0, 1.0, 0.2, 0.0]]) \
        + 0.05 * rng.randn(40, 4)
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(base)],
        "vec_id long, embedding array<double>")
    out = {r["vec_id"]: list(r["components"])
           for r in pca_project(df, n_components=2).collect()}

    grid = 10_000
    q = np.floor(base * grid)
    n = q.shape[0]
    s = q.sum(axis=0)
    cov = np.zeros((4, 4))
    for i in range(4):
        for j in range(i, 4):
            s_ij = float((q[:, i] * q[:, j]).sum())
            cov[i, j] = cov[j, i] = (s_ij - s[i] * s[j] / n) / n
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:2]
    mean = s / n / grid
    for k, idx in enumerate(order):
        v = evecs[:, idx]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        expect = (base - mean) @ v
        got = np.array([out[i][k] for i in range(n)])
        assert np.allclose(got, expect, atol=1e-9)
    # dominant direction recovered
    v0 = evecs[:, order[0]]
    true_dir = np.array([3.0, 1.0, 0.2, 0.0])
    cos = abs(v0 @ true_dir) / np.linalg.norm(v0) / np.linalg.norm(true_dir)
    assert cos > 0.999


def test_context_chunks_null_text_is_empty_doc(spark):
    from pigeon_optics_spark.pipeline.text import context_chunks

    df = spark.createDataFrame([(1, None), (2, "   "), (3, "a b")],
                               "doc_id long, text string")
    out = {(r["doc_id"], r["chunk_idx"]): (r["n_tok"], r["chunk_hash"])
           for r in context_chunks(df, window=4, stride=3).collect()}
    import hashlib
    empty = hashlib.md5(b"").hexdigest()
    assert out[(1, 0)] == (0, empty)   # NULL → one empty chunk, not dropped
    assert out[(2, 0)] == (0, empty)   # whitespace-only likewise
    assert out[(3, 0)][0] == 2
    assert len(out) == 3


def test_pq_recon_error_consistent_with_codes(spark, sf_dir):
    """Invariant tying the two PQ surfaces together: err2 must equal the
    squared L2 distance to the reconstruction implied by pq_encode's OWN
    codes (independent subspace argmins ⇒ the chosen codeword is the
    nearest one, so the two formulations coincide)."""
    import numpy as np

    from pigeon_optics_spark.pipeline.similarity import (
        _pq_codebook,
        pq_encode,
        pq_reconstruction_error,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    m, k = 8, 16
    dim = len(emb.select("embedding").first()[0])
    dim_sub = dim // m
    errs = {r["vec_id"]: r["err2"]
            for r in pq_reconstruction_error(emb, m=m, k=k).collect()}
    codes = {r["vec_id"]: r["codes"] for r in pq_encode(emb, m=m, k=k).collect()}
    cb = _pq_codebook(emb, m, k, dim_sub, "vec_id", "embedding")
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    assert errs and set(errs) == set(codes)
    for vid, v in vecs.items():
        recon = np.concatenate([
            np.asarray(cb[s][codes[vid][s]], dtype=np.float64)
            for s in range(m)])
        expect = float(((v - recon) ** 2).sum())
        assert abs(errs[vid] - expect) <= 1e-9 * max(1.0, expect), vid


class TestTriangleEnumerate:
    """Degree-oriented triangle enumeration vs brute-force on adversarial
    graphs: a hub star (no triangles), overlapping cliques, and a seeded
    random graph — the exactly-once identity is what orientation must
    preserve."""

    def _spark_triangles(self, spark, edges):
        from pigeon_optics_spark.pipeline.graph import triangle_enumerate

        df = spark.createDataFrame(
            [(int(u), int(v)) for u, v in edges], "u long, v long")
        return sorted(tuple(r) for r in triangle_enumerate(df).collect())

    def _brute(self, edges):
        es = {tuple(sorted(e)) for e in edges}
        nodes = sorted({n for e in es for n in e})
        out = []
        for i, a in enumerate(nodes):
            for b in nodes[i + 1:]:
                if (a, b) not in es:
                    continue
                for c in nodes[nodes.index(b) + 1:]:
                    if (a, c) in es and (b, c) in es:
                        out.append((a, b, c))
        return sorted(out)

    def test_star_has_no_triangles(self, spark):
        edges = [(0, i) for i in range(1, 30)]  # hub with degree 29
        assert self._spark_triangles(spark, edges) == []

    def test_overlapping_cliques(self, spark):
        k5a = [(a, b) for a in range(5) for b in range(a + 1, 5)]
        k4b = [(a, b) for a in range(3, 7) for b in range(a + 1, 7)]
        edges = sorted(set(k5a) | set(k4b))
        got = self._spark_triangles(spark, edges)
        assert got == self._brute(edges)
        # K5 contributes C(5,3)=10, K4 contributes C(4,3)=4, and no mixed
        # triangle exists beyond those already counted (0-2 touch only 3,4)
        assert len(got) == 14

    def test_random_graph_matches_brute_force(self, spark):
        import random

        rng = random.Random(20260814)
        nodes = list(range(40))
        edges = sorted({tuple(sorted(rng.sample(nodes, 2)))
                        for _ in range(200)})
        got = self._spark_triangles(spark, edges)
        assert got == self._brute(edges)
        assert got, "fixture must actually contain triangles"


def test_sq8_encode_and_topk_match_python_replica(spark):
    """SQ8 codes are 0..255, constant dims map to 0, and the asymmetric
    integer scores + ranking equal an independent pure-Python replica."""
    import math

    from pigeon_optics_spark.pipeline.similarity import sq8_encode, sq8_topk

    rng = __import__("random").Random(20260814)
    dim, n, grid = 6, 30, 10_000
    vecs = []
    for vid in range(n):
        v = [rng.uniform(-1, 1) for _ in range(dim)]
        v[3] = 0.25            # constant dimension → rng guard → code 0
        vecs.append((vid, v))
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")

    # python replica on the SAME float32-rounded values Spark stores
    import numpy as np

    g = {vid: [math.floor(float(np.float32(x)) * grid) for x in v]
         for vid, v in vecs}
    mn = [min(g[vid][d] for vid in g) for d in range(dim)]
    rr = [max(max(g[vid][d] for vid in g) - mn[d], 1) for d in range(dim)]
    codes = {vid: [(gv[d] - mn[d]) * 255 // rr[d] for d in range(dim)]
             for vid, gv in g.items()}

    got_codes = {r["id"]: list(r["codes"])
                 for r in sq8_encode(emb, grid)[0].collect()}
    assert got_codes == codes
    assert all(0 <= c <= 255 for cs in codes.values() for c in cs)
    assert all(cs[3] == 0 for cs in codes.values())

    got = [(r["query_id"], r["rank"], r["neighbor_id"], r["score"])
           for r in sq8_topk(emb.where("vec_id < 3"), emb, k=4, grid=grid)
           .collect()]
    # the score is the RANGE-WEIGHTED integer inner product
    # Σ_d qg_d·code_d·rng_d (de-affined ranking up to a per-query
    # constant) — ranking by the raw code dot product would reweight
    # every dimension by 255/rng_d (review fix)
    want = []
    for q in range(3):
        scored = sorted(
            ((sum(gq * c * r_ for gq, c, r_ in
                  zip(g[q], codes[v], rr)), v)
             for v in g if v != q),
            key=lambda t: (-t[0], t[1]))[:4]
        want += [(q, i + 1, v, s) for i, (s, v) in enumerate(scored)]
    assert sorted(got) == sorted(want)
