"""Similarity search over embedding columns (``array<float>``).

- ``cosine_topk``: brute-force exact top-k — the baseline and the verifier.
  Dot products are *sequential* array folds in double precision, which makes
  them bit-reproducible across engines (verified vs DuckDB ``list_reduce``).
- ``lsh_bucketed_topk``: the scale path — deterministic random-hyperplane
  LSH; hyperplane coefficients are ±1 derived from md5(plane‖dim), so both
  engines build identical planes.  Bucket equi-join bounds the candidate set;
  exact cosine then ranks candidates only.

At 100 TB: norms and bucket signatures are per-row (no shuffle); the
candidate join shuffles only on (bucket), and the query side is tiny →
broadcast.

- ``ivf_topk``: IVF-flat with a deterministic TRAINLESS coarse quantizer —
  centroids are the corpus vectors with the smallest ids (sampled-centroid
  initialization; a production deployment would train k-means offline and
  ship the centroids the same way).  Cell assignment is a per-row argmax
  over literal centroid arrays (no shuffle, no training state on
  executors); queries probe their ``n_probe`` nearest cells and the exact
  cosine runs only inside probed cells.  This is the partition-pruning
  family of ANN: at scale, cells map to partitions and a query touches
  n_probe/n_centroids of the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _vec_dim(df: DataFrame, vec_col) -> int | None:
    """Probe the (uniform) vector dimension from one row — a bounded
    single-row job (the centroid-literal collect class).  Feeds the
    literal-plane LSH fast path; ``None`` (empty input) keeps the
    adaptive in-plan derivation."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    row = df.select(F.size(c).alias("d")).first()
    if row is None or row["d"] is None or row["d"] <= 0:
        return None
    return int(row["d"])


def dot_col(a, b) -> Column:
    """Sequential-fold dot product in double (bit-stable across engines).

    The higher-order-function fold IS the fast form on Spark 4: an r11
    experiment expanded it to a flat per-element codegen sum
    (``v[0]*q[0] + v[1]*q[1] + …``) and measured the flat form ~3× SLOWER
    to execute (14.3 s vs 4.5 s on a 40k-row × dim-64 noop scan, identical
    checksums) on top of seconds of per-query driver time building the
    64-term trees — zip_with/aggregate compile to a tight loop while the
    flat chain pays per-element null-check branches.  Keep the fold."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_col(a) -> Column:
    """L2 norm via the same sequential fold (see ``dot_col`` on why the
    fold beats a flat expansion)."""
    ca = F.col(a) if isinstance(a, str) else a
    return F.sqrt(F.aggregate(
        F.transform(ca, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    ))


def _spread(df: DataFrame) -> DataFrame:
    """Widen an under-parallel input before a CPU-heavy per-row stage.

    A small corpus parquet scans as one IO-sized partition (128 MB splits),
    so per-row work that is orders of magnitude heavier than the scan —
    shingle explodes, per-shingle hashing, per-pair cosine folds — runs
    single-task while every other core idles (r11 stage attribution: a
    5.4 s one-task stage inside an otherwise sub-second minhash run).
    Round-robin to session parallelism only when the input is narrower
    than that: at scale the scan already has more partitions than cores
    and this is a driver-side no-op — no shuffle is ever added to a
    well-partitioned input."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def _py_norm(vec) -> float:
    """Driver-side replay of ``norm_col``'s exact IEEE op sequence over an
    already-collected vector (doubles in, left-to-right 0.0-seeded fold,
    correctly-rounded sqrt) — bit-identical to the JVM expression, so a
    collected centroid's norm can ship as a plan literal."""
    import math

    acc = 0.0
    for x in vec:
        fx = float(x)
        acc = acc + fx * fx
    return math.sqrt(acc)


def cosine_topk(queries: DataFrame, corpus: DataFrame, k: int = 5,
                q_id: str = "vec_id", q_vec: str = "embedding",
                c_id: str = "vec_id", c_vec: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (self excluded).

    → (query_id, rank, neighbor_id, cosine).  Query side is broadcast; the
    corpus is scanned once; ties broken by neighbor id for determinism.
    """
    q = queries.select(F.col(q_id).alias("query_id"), F.col(q_vec).alias("qv"),
                       norm_col(q_vec).alias("qn"))
    c = _spread(corpus).select(
        F.col(c_id).alias("neighbor_id"), F.col(c_vec).alias("cv"),
        norm_col(c_vec).alias("cn"))
    pairs = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", dot_col("qv", "cv") / (F.col("qn") * F.col("cn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


N_PLANES = 8


def _dbl_sql(x: float) -> str:
    """Exact SQL double literal: ``repr`` emits the shortest decimal that
    round-trips, and Spark's parser reads double literals with Java's
    correctly-rounded ``Double.parseDouble`` — the parsed value is the
    same IEEE double bit-for-bit.

    Non-finite doubles are the ONE class where this path diverges from
    ``F.lit`` (``repr`` yields ``nan``/``inf``, which the SQL parser
    rejects), so they raise a clear error here instead of surfacing as a
    baffling ``ParseException`` inside a kilobyte literal.  No call site
    can produce them today — every value is a finite corpus coordinate,
    an md5-derived ±1, or a norm of finite inputs — the guard pins the
    failure mode (ADVICE r11)."""
    v = float(x)
    if v != v or v in (float("inf"), float("-inf")):
        raise ValueError(
            f"_dbl_sql: non-finite double {v!r} cannot ride as a SQL "
            "literal (Spark's parser has no nan/inf syntax); use F.lit "
            "or handle the value upstream")
    return repr(v) + "D"


def _arr_sql_d(values) -> str:
    """Render a (possibly nested) list of doubles as a SQL array literal
    (exact values — see :func:`_dbl_sql`)."""
    if isinstance(values, (list, tuple)):
        return "array(" + ", ".join(_arr_sql_d(v) for v in values) + ")"
    return _dbl_sql(values)


def _arr_sql_i(values) -> str:
    """Render a (possibly nested) list of ints as a SQL array literal.
    Plain integer literals type exactly like ``F.lit(int)``: IntegerType
    when the value fits int32 (py4j ships small Python ints as Java
    Integer), BIGINT above — so element types are unchanged."""
    if isinstance(values, (list, tuple)):
        return "array(" + ", ".join(_arr_sql_i(v) for v in values) + ")"
    return str(int(values))


def _arr2_lit(rows) -> Column:
    """``array<array<double>>`` literal as ONE parsed expression.
    ``F.lit`` on a nested Python list expands CLIENT-side into one py4j
    call per element (~0.35 s of driver wall for an 8×64 plane matrix,
    paid on every query construction); the equivalent SQL string parses
    in ~2 ms with bit-identical values (checksummed)."""
    return F.expr(_arr_sql_d(rows))


def _lsh_plane_coefs(n_planes: int, dim: int) -> list[list[float]]:
    """Driver-side replay of the md5-derived ±1 plane coefficients —
    identical values to the in-plan md5 derivation (same "p:d" keying), so
    the planes can ship as literals instead of re-hashing
    n_planes·dim md5s per ROW."""
    import hashlib

    return [
        [1.0 if hashlib.md5(f"{p}:{d}".encode()).hexdigest()[0] in "89abcdef"
         else -1.0 for d in range(dim)]
        for p in range(n_planes)
    ]


def lsh_bucket_col(vec, n_planes: int = N_PLANES,
                   dim: int | None = None) -> Column:
    """Random-hyperplane signature: bit p = sign of ⟨v, plane_p⟩ where
    plane_p[d] = +1 if the first md5 nibble of "p:d" is ≥ 8 else −1.
    Deterministic — no RNG state to ship to executors.

    With ``dim``, the coefficients are precomputed driver-side
    (``_lsh_plane_coefs``) and ride in the plan as one n_planes×dim
    array-of-array double literal; the signature is the same
    transform/zip_with/aggregate fold over the literal planes — the
    adaptive path otherwise evaluates n_planes·dim md5 digests per row
    (512/row at dim 64), the dominant cost of every LSH signature scan.
    Measured 10× (21.4 s → 2.1 s on a 40k-row dim-64 noop scan),
    bit-identical checksums (same coefficient values, same fold order);
    rows of a different length fall back to the adaptive md5 path via the
    size guard.  (A flat per-element expansion of the plane dots was also
    tried — no faster than the fold over literals, and far costlier to
    build; see ``dot_col``.)
    """
    v = F.col(vec) if isinstance(vec, str) else vec

    def plane_dot(p):
        return F.aggregate(
            F.zip_with(
                v,
                # per-dimension ±1 coefficient, derived in-place from md5
                F.transform(
                    F.sequence(F.lit(0), F.size(v) - 1),
                    lambda d: F.when(
                        F.instr(F.lit("89abcdef"),
                                F.substring(F.md5(F.concat(p.cast("string"), F.lit(":"),
                                                           d.cast("string"))), 1, 1)) > 0,
                        F.lit(1.0)).otherwise(F.lit(-1.0)),
                ),
                lambda x, coef: x.cast("double") * coef,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    adaptive = F.array_join(
        F.transform(F.sequence(F.lit(0), F.lit(n_planes - 1)),
                    lambda p: F.when(plane_dot(p) >= 0, "1").otherwise("0")),
        "",
    )
    if dim is None:
        return adaptive

    coefs = _lsh_plane_coefs(n_planes, dim)
    # one PARSED literal — F.lit(nested list) still expands client-side
    # into a py4j call per element (~0.35 s per call site at 8×64)
    planes_lit = _arr2_lit(coefs)
    fast = F.array_join(
        F.transform(
            planes_lit,
            lambda pl: F.when(
                F.aggregate(
                    F.zip_with(v, pl, lambda x, coef: x.cast("double") * coef),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ) >= 0, F.lit("1")).otherwise(F.lit("0")),
        ),
        "",
    )
    return F.when(F.size(v) == dim, fast).otherwise(adaptive)


def ivf_topk(queries: DataFrame, corpus: DataFrame, k: int = 5,
             n_centroids: int = 16, n_probe: int = 4,
             q_id: str = "vec_id", q_vec: str = "embedding",
             c_id: str = "vec_id", c_vec: str = "embedding",
             cents=None) -> DataFrame:
    """IVF-flat approximate top-k (see module docstring for the quantizer).

    → (query_id, rank, neighbor_id, cosine).  Plan: per-row cell argmax over
    literal centroids (no shuffle) → corpus partitioned by cell; query side
    probes its n_probe best cells and broadcasts into the cell equi-join;
    exact cosine only inside probed cells.  Ties in centroid scores break
    toward the larger cid (max-struct semantics, mirrored in the oracle).

    ``cents``: optional precollected centroid seed rows (see
    ``_centroid_scored``)."""
    scored, _dim = _centroid_scored(corpus, n_centroids, c_id, c_vec,
                                    cents=cents)

    # hoist the vector norm into its own projection so the centroid scorer
    # divides by the SAME column instead of re-folding the norm once per
    # centroid (n_centroids× per row before)
    c = _spread(corpus).select(
        F.col(c_id).alias("neighbor_id"), F.col(c_vec).alias("cv"),
        norm_col(c_vec).alias("cn"),
    ).select(
        "neighbor_id", "cv", "cn",
        F.array_max(scored("cv", F.col("cn"))).getField("cid").alias("cell"),
    )
    q = queries.select(
        F.col(q_id).alias("query_id"), F.col(q_vec).alias("qv"),
        norm_col(q_vec).alias("qn"),
    ).select(
        "query_id", "qv", "qn",
        F.explode(F.transform(
            F.slice(F.reverse(F.array_sort(scored("qv", F.col("qn")))),
                    1, n_probe),
            lambda s: s["cid"],
        )).alias("cell"),
    )
    pairs = (
        c.join(F.broadcast(q), "cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", dot_col("qv", "cv") / (F.col("qn") * F.col("cn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def lsh_bucketed_topk(queries: DataFrame, corpus: DataFrame, k: int = 5,
                      q_id: str = "vec_id", q_vec: str = "embedding",
                      c_id: str = "vec_id", c_vec: str = "embedding",
                      n_planes: int = N_PLANES,
                      dim: int | None = None) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket.

    → (query_id, rank, neighbor_id, cosine).  Recall < 1 by construction;
    the point is the plan shape — bucket equi-join instead of corpus scan
    per query.

    ``dim``: the vector dimension when the caller already knows it (e.g.
    from a centroid collect over the same corpus), skipping the one-row
    probe job.  Any value is results-identical: ``lsh_bucket_col`` guards
    its literal-plane fast path with ``size(vec) = dim`` and rows of any
    other length take the adaptive md5 path either way.
    """
    if dim is None:
        dim = _vec_dim(queries, q_vec)
    q = queries.select(F.col(q_id).alias("query_id"), F.col(q_vec).alias("qv"),
                       norm_col(q_vec).alias("qn"),
                       lsh_bucket_col(q_vec, n_planes, dim).alias("bucket"))
    c = _spread(corpus).select(
        F.col(c_id).alias("neighbor_id"), F.col(c_vec).alias("cv"),
        norm_col(c_vec).alias("cn"),
        lsh_bucket_col(c_vec, n_planes, dim).alias("bucket"))
    pairs = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", dot_col("qv", "cv") / (F.col("qn") * F.col("cn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def kmeans_assign(emb: DataFrame, k: int = 8, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """One Lloyd assignment step over a deterministic trainless quantizer:
    centroids are the ``k`` smallest-id vectors (same convention as
    ``ivf_topk``; production would train offline and ship centroids as
    literals the same way).

    → (vec_id, centroid, dist2) — nearest centroid by squared L2, ties to
    the smaller centroid id (lexicographic struct min, mirrored in the
    oracle's ORDER BY d2, cid).

    Scale shape: centroids are a driver-side literal array (k·dim doubles),
    so assignment is a pure per-row expression — no shuffle, no join, no
    state on executors; at 100 TB this is a map-only pass.  The squared-L2
    fold is sequential in double precision (bit-stable across engines, same
    class as ``dot_col``).
    """
    cents = emb.orderBy(id_col).limit(k).select(id_col, vec_col).collect()
    # parsed literal (one py4j call; see _arr2_lit) — type unchanged:
    # array<struct<cid:int,cv:array<double>>>
    cent_lit = F.expr("array(" + ", ".join(
        f"named_struct('cid', {j}, 'cv', "
        f"{_arr_sql_d([float(x) for x in row[vec_col]])})"
        for j, row in enumerate(cents)) + ")")

    best = F.array_min(F.transform(
        cent_lit,
        lambda c: F.struct(_d2_col(F.col(vec_col), c["cv"]).alias("d2"),
                           c["cid"].alias("cid")),
    ))
    return emb.select(
        F.col(id_col).alias("vec_id"),
        best.getField("cid").alias("centroid"),
        best.getField("d2").alias("dist2"),
    )


def _pq_codebook(emb: DataFrame, m: int, k: int, dim_sub: int,
                 id_col: str, vec_col: str):
    """Deterministic trainless PQ codebook: codeword ``j`` of subspace ``s``
    is dims ``[s*dim_sub, (s+1)*dim_sub)`` of the vector with id ``j``
    (same smallest-id convention as ``ivf_topk``/``kmeans_assign``)."""
    rows = emb.orderBy(id_col).limit(k).select(id_col, vec_col).collect()
    return [
        [[float(x) for x in row[vec_col][s * dim_sub:(s + 1) * dim_sub]]
         for row in rows]
        for s in range(m)
    ]


def _centroid_scored(corpus: DataFrame, n_centroids: int,
                     id_col: str, vec_col: str, cents=None):
    """Deterministic IVF coarse quantizer shared by ivf_topk / ivfpq_topk
    (one definition so a tie-break or casting tweak can never desync cell
    assignment between the two): smallest-n ids as centroid literals, and
    the cosine scorer closure over them.  → (scored, dim).

    The centroids are already collected, so their norms ship as plan
    LITERALS (``_py_norm`` replays the JVM fold bit-for-bit) — the closure
    previously re-folded ``norm(cv)`` over the literal array once per
    centroid per row, and callers now pass the row vector's (hoisted) norm
    column so ``norm(v)`` is folded once per row instead of once per
    centroid; the cosine ``dot/(vnorm·lit(cnorm))`` divides the same
    doubles as before (oracle-verified).  The dot stays the HOF fold — see
    ``dot_col`` for why a flat expansion loses.

    ``cents``: optionally the already-collected smallest-``n_centroids``
    rows (``orderBy(id).limit(n).select(id, vec)``) so a caller composing
    several methods over one corpus runs the bounded seed collect ONCE
    instead of once per method (each collect is a full Spark job of
    driver-serialized latency — VERDICT r11 item 6)."""
    if cents is None:
        cents = corpus.orderBy(id_col).limit(n_centroids) \
            .select(id_col, vec_col).collect()
    dim = len(cents[0][vec_col]) if cents else None
    cent_vecs = [[float(x) for x in row[vec_col]] for row in cents]
    cent_norms = [_py_norm(cv) for cv in cent_vecs]
    # one PARSED literal (see _arr2_lit): the struct-by-struct build cost
    # ~n_centroids·dim py4j calls (~0.7 s at 16×64) per query construction.
    # Plain int literals parse to IntegerType exactly like F.lit(j), so
    # the struct type is unchanged: struct<cid:int,cv:array<double>,cn:double>.
    cent_lit = F.expr("array(" + ", ".join(
        f"named_struct('cid', {j}, 'cv', array("
        + ", ".join(_dbl_sql(x) for x in cent_vecs[j])
        + f"), 'cn', {_dbl_sql(cent_norms[j])})"
        for j in range(len(cents))) + ")")

    def scored(vec, vnorm: Column | None = None) -> Column:
        v = F.col(vec) if isinstance(vec, str) else vec
        vn = vnorm if vnorm is not None else norm_col(v)
        return F.transform(
            cent_lit,
            lambda c: F.struct(
                (dot_col(v, c["cv"]) / (vn * c["cn"])).alias("cos"),
                c["cid"].alias("cid"),
            ),
        )

    return scored, dim


def _d2_col(a, b) -> Column:
    """Squared L2 via the sequential fold (see ``dot_col`` on why the fold
    beats a flat expansion)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb,
                   lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_encode(emb: DataFrame, m: int = 8, k: int = 16,
              id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Product-quantization encoding: each vector becomes ``m`` small codes
    (argmin codeword per subspace, ties to the smaller code).

    → (vec_id, codes array<int>) — 64 floats compress to 8 codes; at
    100 TB this is the difference between an ANN index that fits in
    executor memory and one that doesn't (PQ is the standard memory tier
    under IVF — see Jégou et al., PAMI 2011).

    Scale shape: the codebook is an m·k·dim_sub literal (a few KB), so
    encoding is a map-only pass — no shuffle, no training state; the
    squared-L2 folds are sequential doubles (engine-portable, same class
    as ``dot_col``).
    """
    dim_sub, cb_lit = _pq_cb_lit(emb, m, k, id_col, vec_col)
    codes = _pq_codes_col(cb_lit, vec_col, m, k, dim_sub)
    return emb.select(F.col(id_col).alias("vec_id"), codes.alias("codes"))


def pq_reconstruction_error(emb: DataFrame, m: int = 8, k: int = 16,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """Per-vector PQ reconstruction error — the index-quality eval that
    decides m/k sizing before an ANN index is built at corpus scale.

    ``err2 = Σ_s min_j d2(subvec_s, codeword[s][j])`` — exactly the
    squared L2 between the vector and its PQ reconstruction, because each
    subspace independently picks its nearest codeword.  → all input
    columns + ``err2 DOUBLE``.

    Scale shape: codebook is a literal (the pq_encode pattern), so this is
    one map-only corpus pass — no shuffle, no join.  Determinism: the
    subspace fold runs in ascending ``s`` order and each inner min is over
    doubles (order-free), so ``err2`` is bit-identical across engines.
    """
    dim_sub, cb_lit = _pq_cb_lit(emb, m, k, id_col, vec_col)
    err = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, s: acc + F.array_min(F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda j: _d2_col(
                F.slice(F.col(vec_col), s * dim_sub + 1, dim_sub),
                F.element_at(F.element_at(cb_lit, s + 1), j + 1)),
        )),
    )
    return emb.select("*", err.alias("err2"))


def _pq_cb_lit(emb, m: int, k: int, id_col: str, vec_col: str):
    """Shared PQ setup: probe the dimension, train the codebook, and build
    the nested codebook LITERAL (the transform lambdas' subspace index is
    a Column, so the codebook ships inside the plan and is indexed with
    element_at).  One definition for all four PQ call sites — dim % m
    truncation behavior changes HERE or nowhere.  → (dim_sub, cb_lit)."""
    dim = len(emb.select(vec_col).first()[0])
    if dim % m:
        # a truncated m*dim_sub reconstruction compared against the FULL
        # query vector NULL-pads the zip_with fold — every ADC distance
        # goes NULL and the top-k window returns arbitrary ties.  FAISS
        # imposes the same precondition; refuse loudly (review finding).
        raise ValueError(
            f"PQ requires dim divisible by m (dim={dim}, m={m})")
    dim_sub = dim // m
    cb = _pq_codebook(emb, m, k, dim_sub, id_col, vec_col)
    # parsed literal (one py4j call; see _arr2_lit): m·k·dim_sub doubles
    cb_lit = F.expr(_arr_sql_d([[list(cw) for cw in cb[s]]
                                for s in range(m)]))
    return dim_sub, cb_lit


def _pq_codes_col(cb_lit: Column, vec_col: str, m: int, k: int,
                  dim_sub: int) -> Column:
    """argmin-codeword codes expression (shared by pq_encode / ivfpq_topk —
    a pure column so composition stays map-only, never a self-join)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda s: F.array_min(F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda j: F.struct(
                _d2_col(F.slice(F.col(vec_col), s * dim_sub + 1, dim_sub),
                        F.element_at(F.element_at(cb_lit, s + 1), j + 1))
                .alias("d2"),
                j.alias("j"),
            ),
        )).getField("j"),
    )


def pq_topk(queries: DataFrame, corpus: DataFrame, m: int = 8, k: int = 16,
            topk: int = 5, id_col: str = "vec_id",
            vec_col: str = "embedding") -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: corpus rows are RECONSTRUCTED
    from their codes (the only corpus-side data a PQ index stores); queries
    keep full precision.

    → (query_id, rank, neighbor_id, adc_dist2).  The ADC distance is the
    full-vector squared L2 between the exact query and the reconstruction —
    one sequential fold, mirrored exactly in the oracle.

    Scale shape: codes + codebook replace the corpus vectors (8 bytes/vec
    here vs 256), queries broadcast, one corpus scan; composes with IVF
    cells for the scan-pruning tier.
    """
    dim_sub, cb_lit = _pq_cb_lit(corpus, m, k, id_col, vec_col)
    # reuse THIS call's codebook literal — calling pq_encode here would
    # probe the dimension and train the identical codebook a second time
    # (two extra driver-side jobs per query, review finding)
    coded = corpus.select(
        F.col(id_col).alias("vec_id"),
        _pq_codes_col(cb_lit, vec_col, m, k, dim_sub).alias("codes"))
    decoded = coded.select(
        F.col("vec_id").alias("neighbor_id"),
        F.flatten(F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda s: F.element_at(F.element_at(cb_lit, s + 1),
                                   F.element_at(F.col("codes"), s + 1) + 1),
        )).alias("decoded"),
    )
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"))
    pairs = (decoded.join(F.broadcast(q),
                          F.col("neighbor_id") != F.col("query_id"))
             .withColumn("adc_dist2",
                         _d2_col("qv", "decoded")))
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist2"),
                                               F.asc("neighbor_id"))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= topk)
            .select("query_id", "rank", "neighbor_id", "adc_dist2"))


def sq8_encode(corpus: DataFrame, grid: int = 10_000,
               id_col: str = "vec_id", vec_col: str = "embedding") \
        -> tuple[DataFrame, list[int], list[int]]:
    """Scalar quantization (the SQ8 / int8 ANN storage tier): each dimension
    is affinely mapped to a 0..255 code from its corpus-wide [min, max].

    Everything is exact-integer so the oracle can reproduce it: vectors are
    first snapped to the ``floor(x·grid)`` BIGINT lattice (the emb_covariance
    idiom), per-dim min/max is a bounded ``dim``-row aggregate collected to
    literals (the centroid-literal pattern — ships inside the plan, no
    training state on executors), and the code is the integer floor division
    ``(v − mn)·255 // max(mx − mn, 1)`` (a constant dimension maps to code 0
    via the GREATEST guard — same formula both engines).  The division runs
    in doubles but is provably exact-floor: numerators ≤ range·255 ≈ 5·10⁶
    are double-exact, IEEE quotients are correctly rounded, and a non-exact
    quotient sits ≥ 1/range ≫ ulp away from the nearest integer.

    → (codes DataFrame (id, codes array<long>), mn list, rng list).
    Scale shape: ONE bounded stats pass, then map-only encode — codes are
    1 byte/dim of information vs 4, the memory tier between full vectors
    and PQ."""
    gcol = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(float(grid))).cast("long"))
    stats = (corpus.select(F.posexplode(gcol).alias("d", "v"))
             .groupBy("d").agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
             .orderBy("d").collect())
    mn = [int(r["mn"]) for r in stats]
    rng = [max(int(r["mx"]) - int(r["mn"]), 1) for r in stats]
    # parsed int-array literals (one py4j call each; see _arr_sql_i)
    mn_lit = F.expr(_arr_sql_i(mn))
    rng_lit = F.expr(_arr_sql_i(rng))
    codes = corpus.select(
        F.col(id_col).alias("id"),
        F.transform(
            gcol,
            lambda x, i: F.floor(
                ((x - F.element_at(mn_lit, i + 1)) * F.lit(255))
                .cast("double")
                / F.element_at(rng_lit, i + 1).cast("double")).cast("long"),
        ).alias("codes"))
    return codes, mn, rng


def sq8_topk(queries: DataFrame, corpus: DataFrame, k: int = 5,
             grid: int = 10_000, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """Asymmetric top-k over SQ8 codes: the corpus side keeps only its
    scalar-quantized codes (:func:`sq8_encode`), queries keep the full
    ``grid`` lattice — the SQ analogue of PQ's ADC.  The score is the exact
    BIGINT weighted inner product ``Σ_d qg_d · code_d · rng_d`` — the
    de-affined inner product up to a per-query additive constant
    (``Σ qg_d·mn_d·255``, constant within each query's ranking window)
    and the positive factor 255, so the top-k ORDER equals ranking by the
    true dequantized inner product.  Ranking by the RAW code dot product
    would silently reweight every dimension by ``255/rng_d``, letting a
    narrow-range noise dimension dominate wide signal dimensions (review
    finding).  Magnitudes: |qg|≤grid·|x|, code≤255, rng≤2·grid → per-term
    ≲5·10¹⁰, 64 dims ≲4·10¹² — far under 2^63, integer-deterministic, and
    the DuckDB oracle reproduces it bit-for-bit.

    → (query_id, rank, neighbor_id, score).  Plan: bounded query side
    broadcast into the code scan (the pq_topk/ADC whitelist class), one
    window top-k.  At 100 TB the corpus scan reads 1-byte codes instead of
    float vectors — a 4× IO tier with none of PQ's codebook training."""
    codes, _mn, rng = sq8_encode(corpus, grid, id_col, vec_col)
    rng_lit = F.expr(_arr_sql_i(rng))
    qgrid = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * F.lit(float(grid)))
            .cast("long")).alias("qg"))
    pairs = (codes.withColumnRenamed("id", "neighbor_id")
             .join(F.broadcast(qgrid),
                   F.col("neighbor_id") != F.col("query_id"))
             .withColumn("score", F.aggregate(
                 F.transform(
                     F.zip_with("codes", "qg", lambda c, q: c * q),
                     lambda x, i: x * F.element_at(rng_lit, i + 1)),
                 F.lit(0).cast("long"), lambda acc, v: acc + v)))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                               F.asc("neighbor_id"))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "score"))


def ivfpq_topk(queries: DataFrame, corpus: DataFrame, topk: int = 5,
               n_centroids: int = 16, n_probe: int = 4, m: int = 8,
               k: int = 16, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """IVF-PQ approximate top-k — the two ANN tiers composed the way a
    production index runs them (Jégou et al., PAMI 2011; FAISS ``IVFPQ``):
    the IVF coarse quantizer prunes the SCAN (only ``n_probe`` cells of the
    corpus are touched per query) and PQ compresses the STORAGE (only codes
    + a literal codebook live corpus-side; ADC distances run against the
    reconstruction).

    → (query_id, rank, neighbor_id, adc_dist2).

    Scale shape: both quantizers are deterministic literals (a few KB
    broadcast inside the plan), cell assignment and PQ decode are map-only,
    queries broadcast into the cell equi-join, and per-query cost is
    ``n_probe/n_centroids`` of a corpus scan over 8-byte codes instead of
    full vectors — the memory/IO tiering that makes ANN feasible at 100 TB.
    """
    scored, _dim = _centroid_scored(corpus, n_centroids, id_col, vec_col)

    dim_sub, cb_lit = _pq_cb_lit(corpus, m, k, id_col, vec_col)
    # ONE map-only corpus pass computes the cell AND the PQ codes (the two
    # quantizers are independent literals — composing them must not add a
    # self-join/shuffle).  The pass costs ~120 µs/row (16 centroid folds +
    # m·k sub-distance argmins) over an IO-sized scan — r12 measured 4.7
    # cpu-s in ONE task at sf0.1 — so spread it like the other corpus
    # sides (§2.5; join + deterministic window downstream are
    # placement-independent, and a no-op on wide inputs).
    decoded = _spread(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.array_max(scored(vec_col)).getField("cid").alias("cell"),
        _pq_codes_col(cb_lit, vec_col, m, k, dim_sub).alias("codes"),
    ).select(
        "neighbor_id", "cell",
        F.flatten(F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda s: F.element_at(F.element_at(cb_lit, s + 1),
                                   F.element_at(F.col("codes"), s + 1) + 1),
        )).alias("decoded"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        F.explode(F.transform(
            F.slice(F.reverse(F.array_sort(scored(vec_col))), 1, n_probe),
            lambda s: s["cid"],
        )).alias("cell"),
    )
    pairs = (
        decoded.join(F.broadcast(q), "cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("adc_dist2", _d2_col("qv", "decoded"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist2"),
                                               F.asc("neighbor_id"))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= topk)
            .select("query_id", "rank", "neighbor_id", "adc_dist2"))


def _mean_assign(q: DataFrame, means: list[list[float]],
                 with_d2: bool = False) -> DataFrame:
    """Assignment pass against literal centroid means: argmin squared-L2,
    ties to the smaller cid.  Map-only — the centroids ride inside the plan
    as a k·dim double literal (broadcast by construction)."""
    dim = len(means[0]) if means else None
    # parsed literal (one py4j call; see _arr2_lit) — type unchanged:
    # array<struct<cid:int,mv:array<double>>>
    cent_lit = F.expr("array(" + ", ".join(
        f"named_struct('cid', {j}, 'mv', "
        f"{_arr_sql_d([float(m) for m in mv])})"
        for j, mv in enumerate(means)) + ")")
    best = F.array_min(F.transform(
        cent_lit,
        lambda c: F.struct(_d2_col(F.col("qv"), c["mv"]).alias("d2"),
                           c["cid"].alias("cid")),
    ))
    cols = [F.col("vec_id"), F.col("qv"),
            best.getField("cid").alias("centroid")]
    if with_d2:
        cols.append(best.getField("d2").alias("dist2"))
    return q.select(*cols)


def kmeans_train(emb: DataFrame, k: int = 8, iters: int = 2,
                 quant: int = 10000, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Multi-iteration Lloyd k-means training, engine-deterministic end to
    end — the trained sibling of ``kmeans_assign`` (which runs ONE step
    against the trainless seed quantizer).

    Floating-point k-means is not reproducible across engines: a per-dim
    centroid mean is a float sum whose last ulp depends on accumulation
    order (Spark partial aggs vs any other engine's ordering).  Training
    therefore quantizes each component to an integer grid first
    (``floor(x · quant)`` — deterministic IEEE ops), after which

    - per-cell per-dim sums are exact BIGINT aggregates (order-free),
    - each centroid mean is ``double(sum) / double(count)`` — one
      correctly-rounded IEEE division of exactly-representable integers,
      bit-identical in Spark, DuckDB, and Python,
    - assignment distance is the usual sequential double fold over the
      quantized components (same bit-stable class as ``dot_col``), ties to
      the smaller cid.

    Seeding follows the repo's smallest-k-ids convention; ``iters``
    centroid updates run, a cell that goes empty keeps its previous
    centroid, and the return value is the FINAL assignment
    ``(vec_id, centroid, dist2)``.

    Scale shape (the real cluster training loop): each iteration is one
    map-only assignment pass (centroids are broadcast literals, k·dim
    doubles) plus one ``groupBy(centroid)`` aggregation with map-side
    combine whose result is k·(dim+1) numbers — the ONLY thing ever
    collected to the driver.  No per-row state, no join, nothing grows
    with corpus size; this is exactly how Lloyd iterates on a
    1000-executor cluster (MLlib does the same collect-update loop).
    """
    dim = len(emb.select(vec_col).head()[0])
    q = emb.select(
        F.col(id_col).alias("vec_id"),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * F.lit(float(quant)))
            .cast("long"),
        ).alias("qv"),
    ).persist()
    q.count()  # materialize: consumed once per iteration + final pass
    try:
        seed = q.orderBy("vec_id").limit(k).collect()
        # count=1 means: float(int) is exact, matching double(sum)/double(1)
        means = [[float(v) for v in row["qv"]] for row in seed]
        for _ in range(iters):
            assigned = _mean_assign(q, means)
            sums = (assigned.groupBy("centroid").agg(
                *[F.sum(F.element_at("qv", i + 1)).alias(f"s{i}")
                  for i in range(dim)],
                F.count("*").alias("cnt"),
            )).collect()
            # Python int/int true division == SQL double(s)/double(cnt):
            # both are the correctly-rounded IEEE quotient of exact inputs
            # — PROVIDED the big-int sum is double-exact.  Past 2^53,
            # Python divides the exact integer (correctly rounded once)
            # while SQL first rounds s to double, then divides: the two
            # can differ in the last ulp and boundary assignments drift
            # (review finding).  The guard costs nothing (sums are
            # already driver-side) and |s| ≤ rows·quant·|x| only nears
            # 2^53 at ~10^12 rows per cell.
            for row in sums:
                for i in range(dim):
                    if abs(row[f"s{i}"]) >= (1 << 53):
                        raise ValueError(
                            "kmeans_train: per-cell component sum "
                            f"{row[f's{i}']} exceeds 2^53 — the "
                            "cross-engine bit-identity contract breaks; "
                            "lower quant or shard the corpus")
            new = {row["centroid"]: [row[f"s{i}"] / row["cnt"]
                                     for i in range(dim)]
                   for row in sums}
            means = [new.get(j, means[j]) for j in range(k)]
        return _mean_assign(q, means, with_d2=True).select(
            "vec_id", "centroid", "dist2")
    finally:
        # lazily-consumed return: unpersist only marks for eviction after
        # the final pass has been planned; blocking=False keeps it safe
        q.unpersist(blocking=False)


def embedding_covariance(emb: DataFrame, vec_col: str = "embedding",
                         grid: int = 10_000) -> DataFrame:
    """Exact corpus covariance / Gram statistics over an embedding column —
    the building block under PCA whitening, feature-correlation audits, and
    OOD drift monitors on training corpora.

    Engine-exact by integer-grid quantization (the ``emb_kmeans_train``
    discipline): each component maps to ``floor(x·grid)`` (BIGINT), so the
    pairwise product sums ``s_ij``, the linear sums ``s_i``, and the count
    are all exact integer aggregates — order-free, map-side combinable.
    The covariance itself is then a fixed sequence of IEEE double ops on
    those exact integers: ``(s_ij - s_i·s_j/n)/n`` — bit-identical in any
    engine.

    → rows ``(i, j, n, s_i, s_j, s_ij, cov)`` for ``0 <= i <= j < dim``.

    Scale shape: ONE corpus scan; the d(d+1)/2 pair terms expand IN-ROW
    (array transform, no join), and ``groupBy(i, j)`` partially aggregates
    map-side, so the shuffle carries at most ``partitions × d²/2`` partial
    sums regardless of corpus size.  Overflow headroom: unit-scale
    components quantize to |q| ≤ grid, so a pair sum is ≤ grid²·N — at
    grid 1e4 that holds to N ≈ 9e10 rows per (i,j) before BIGINT overflow;
    raise/lower ``grid`` to trade precision against headroom.
    """
    qcol = F.transform(F.col(vec_col),
                       lambda x: F.floor(x.cast("double") * grid)
                       .cast("long"))
    d = F.size(qcol)
    # each pair struct carries the product AND both operands, so ONE
    # aggregation yields s_ij, s_i, s_j, n per (i, j) group — no marker
    # rows, no second branch over the corpus, no join (a branched version
    # planned THREE corpus scans: Spark does not dedupe a shared agg
    # subtree referenced under different filters)
    pair_structs = F.flatten(F.transform(qcol, lambda x, i: F.transform(
        F.slice(qcol, i + 1, d - i),
        lambda y, k: F.struct(i.cast("int").alias("i"),
                              (i + k).cast("int").alias("j"),
                              (x * y).alias("p"),
                              x.alias("a"),
                              y.alias("b")))))
    ex = emb.select(F.explode(pair_structs).alias("s")) \
        .select("s.i", "s.j", "s.p", "s.a", "s.b")
    agg = ex.groupBy("i", "j").agg(F.sum("p").alias("s_ij"),
                                   F.sum("a").alias("s_i"),
                                   F.sum("b").alias("s_j"),
                                   F.count("*").alias("n"))
    cov = ((F.col("s_ij").cast("double")
            - F.col("s_i").cast("double") * F.col("s_j").cast("double")
            / F.col("n").cast("double"))
           / F.col("n").cast("double"))
    return agg.select("i", "j", "n", "s_i", "s_j", "s_ij",
                      cov.alias("cov"))


def pca_project(emb: DataFrame, n_components: int = 8,
                vec_col: str = "embedding", id_col: str = "vec_id",
                grid: int = 10_000, cov_rows: list | None = None) -> DataFrame:
    """PCA projection of the embedding corpus: covariance via
    :func:`embedding_covariance` (one distributed scan, exact integer
    aggregates), eigendecomposition DRIVER-SIDE on the d×d matrix (d² is
    a few thousand numbers — never corpus-sized), then a map-only
    projection with the top-``n_components`` eigenvectors riding the plan
    as literals (the ANN-codebook pattern).

    → (vec_id, components ARRAY<DOUBLE>) in eigenvalue-descending order.

    Eigenvector sign is normalized (largest-|coord| positive) so output is
    deterministic up to numpy's eigh; this is the one operator family whose
    kernel (symmetric eigensolve) is legitimately driver-side — the
    distributed parts are the covariance pass and the projection map.
    Verified against numpy in pytest rather than oracle-gated: DuckDB has
    no eigensolver to mirror — and the PROJECTION is pinned by the
    emb_pca_invariants gate (variance == eigenvalue, orthogonality).
    Pass ``cov_rows`` (collected :func:`embedding_covariance` output for
    the same grid) to skip the internal covariance scan when the caller
    already ran one — the gate does, halving its corpus passes.
    """
    import numpy as np

    if cov_rows is None:
        cov_rows = embedding_covariance(emb, vec_col, grid=grid).collect()
    if not cov_rows:
        raise ValueError(
            "pca_project: empty embedding corpus (no covariance rows)")
    d = max(r["j"] for r in cov_rows) + 1
    cov = np.zeros((d, d))
    for r in cov_rows:
        cov[r["i"], r["j"]] = r["cov"]
        cov[r["j"], r["i"]] = r["cov"]
    evals, evecs = np.linalg.eigh(cov)       # ascending eigenvalues
    order = np.argsort(evals)[::-1][:n_components]
    comps = []
    for idx in order:
        v = evecs[:, idx]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        comps.append([float(x) for x in v])
    # mean (in grid units → original units) for centering
    lin = {r["i"]: (r["s_i"], r["n"]) for r in cov_rows if r["i"] == r["j"]}
    mean = [lin[i][0] / lin[i][1] / grid for i in range(d)]
    mean_lit = F.expr(_arr_sql_d(mean))
    centered = F.zip_with(F.col(vec_col).cast("array<double>"), mean_lit,
                          lambda x, m: x - m)
    proj_cols = [
        F.aggregate(
            F.zip_with(centered, F.expr(_arr_sql_d(comp)),
                       lambda x, w: x * w),
            F.lit(0.0), lambda acc, x: acc + x)
        for comp in comps]
    return emb.select(id_col, F.array(*proj_cols).alias("components"))


def jl_sign_matrix(k: int, d: int, seed: str = "rp") -> list[list[int]]:
    """±1 sign matrix for a Johnson-Lindenstrauss random projection,
    derived per cell from md5 (the repo-wide engine-reproducible hash —
    DuckDB/Python/Spark all rebuild the identical matrix, no RNG state).

    Achlioptas (2001): a dense ±1 matrix scaled by 1/sqrt(k) satisfies the
    JL lemma with the same distortion bounds as Gaussian projections — the
    scaling is deferred to consumers (a constant factor doesn't change
    neighbor ORDER, so the sketch stays exact-integer here)."""
    import hashlib

    return [[1 if hashlib.md5(f"{seed}:{j}:{i}".encode()).digest()[0] % 2 == 0
             else -1 for i in range(d)] for j in range(k)]


def random_project(emb: DataFrame, k: int = 16, grid: int = 10_000,
                   seed: str = "rp", vec_col: str = "embedding",
                   id_col: str = "vec_id") -> DataFrame:
    """Johnson-Lindenstrauss sketch: project each vector onto ``k`` md5-
    derived ±1 directions — the dimensionality-reduction tier BETWEEN raw
    brute force and trained quantizers (PQ/SQ8/IVF need a training pass;
    a JL sketch needs none and preserves pairwise distances within
    (1±eps) at k = O(log n / eps^2), so it's the first move when 64-dim
    cosine at 100 TB is too wide to shuffle).

    Exactness: components snap to the ``floor(x*grid)`` BIGINT lattice
    (the emb_covariance discipline), each projection is a ±1-weighted
    integer SUM — order-free, engine-exact.  Map-only: the sign matrix is
    a compile-time literal inside one projected select; no shuffle, no
    collect (the dim probe is one bounded ``first()``).

    → (id_col, j, proj): k rows per vector, proj = Σ_i sign[j][i]·q_i.
    """
    first = emb.select(vec_col).first()
    if first is None:
        raise ValueError("empty embedding corpus")
    d = len(first[0])
    signs = jl_sign_matrix(k, d, seed)
    signs_lit = F.expr(_arr_sql_i([list(row) for row in signs]))
    q = F.transform(F.col(vec_col),
                    lambda x: F.floor(x.cast("double") * grid).cast("long"))
    projs = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda j: F.struct(
            j.cast("long").alias("j"),
            F.aggregate(
                F.zip_with(q, F.element_at(signs_lit, (j + 1).cast("int")),
                           lambda a, b: a * b),
                F.lit(0).cast("long"), lambda acc, v: acc + v).alias("proj")))
    return (emb.select(id_col, F.explode(projs).alias("s"))
            .select(id_col, F.col("s.j").alias("j"),
                    F.col("s.proj").alias("proj")))
