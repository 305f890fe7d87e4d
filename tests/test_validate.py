"""pipeline.validate — constraint suites, k-anonymity; and the wave-6
text ops (span_dedup_removal, global_shuffle) against pure-Python
recomputation.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from pigeon_optics_spark.pipeline.text import global_shuffle, span_dedup_removal
from pigeon_optics_spark.pipeline.validate import (check_constraints,
                                                   kanonymity_audit,
                                                   referential_check,
                                                   uniqueness_check)


# ---------------------------------------------------------------- validate

def test_check_constraints_null_is_violation(spark):
    df = spark.createDataFrame(
        [(1,), (60,), (None,)], "qty int")
    rep = check_constraints(df, {
        "qty_in_1_50": F.col("qty").between(1, 50),
    }).collect()
    assert len(rep) == 1
    r = rep[0]
    # 60 out of range AND the NULL both count as violations
    assert r.violations == 2 and r.n_rows == 3 and r.passed is False


def test_check_constraints_single_scan_plan(spark):
    df = spark.range(100).select(
        F.col("id").alias("a"), (F.col("id") * 2).alias("b"))
    rep = check_constraints(df, {
        "a_nonneg": F.col("a") >= 0,
        "b_even": F.col("b") % 2 == 0,
        "a_small": F.col("a") < 10,
    })
    plan = rep._jdf.queryExecution().executedPlan().toString()
    # every row-level check folds into ONE aggregation over ONE scan
    assert plan.count("Range (") == 1


def test_check_constraints_empty_df(spark):
    df = spark.createDataFrame([], "x int")
    r = check_constraints(df, {"x_pos": F.col("x") > 0}).collect()[0]
    assert r.violations == 0 and r.n_rows == 0 and r.passed is True


def test_check_constraints_rejects_empty_checks(spark):
    with pytest.raises(ValueError):
        check_constraints(spark.range(1), {})


def test_uniqueness_check(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "a"), (2, "a")], "k int, v string")
    ok = uniqueness_check(df, ["k", "v"]).collect()[0]
    assert ok.violations == 1 and ok.passed is False  # (1,'a') twice
    bad = uniqueness_check(df, ["k"]).collect()[0]
    assert bad.violations == 2 and bad.n_rows == 4 and bad.passed is False
    good = uniqueness_check(df.select("k").distinct(), ["k"]).collect()[0]
    assert good.violations == 0 and good.passed is True


def test_referential_check_orphans_and_null_keys(spark):
    child = spark.createDataFrame([(1,), (2,), (99,), (None,)], "fk int")
    parent = spark.createDataFrame([(1,), (2,), (2,)], "pk int")
    r = referential_check(child, parent, "fk", "pk").collect()[0]
    # 99 is an orphan; NULL references nothing; duplicate parent key must
    # NOT fan out child rows (n_rows stays 4)
    assert r.violations == 2 and r.n_rows == 4 and r.passed is False


def test_kanonymity_audit_boundary(spark):
    rows = [("US", "A")] * 3 + [("US", "B")] * 2 + [("DE", "A")]
    df = spark.createDataFrame(rows, "nat string, seg string")
    out = {(r.nat, r.seg): (r.group_size, r.anonymous)
           for r in kanonymity_audit(df, ["nat", "seg"], k=3).collect()}
    assert out[("US", "A")] == (3, True)   # == k passes
    assert out[("US", "B")] == (2, False)
    assert out[("DE", "A")] == (1, False)
    with pytest.raises(ValueError):
        kanonymity_audit(df, ["nat"], k=0)


# ------------------------------------------------- span_dedup_removal

def _py_span_removal(docs, w=3):
    """Pure-Python recomputation: windows of w tokens, cross-doc dup spans
    survive only in min-doc_id owner."""
    toks = {d: (t or "").split() for d, t in docs}
    toks = {d: [x for x in v if x] for d, v in toks.items()}
    owner: dict[str, int] = {}
    holders: dict[str, set] = {}
    for d, ws in toks.items():
        for i in range(len(ws) - w + 1):
            key = " ".join(ws[i:i + w])
            holders.setdefault(key, set()).add(d)
            owner[key] = min(owner.get(key, d), d)
    out = {}
    for d, ws in toks.items():
        cov = set()
        for i in range(len(ws) - w + 1):
            key = " ".join(ws[i:i + w])
            if len(holders[key]) > 1 and owner[key] != d:
                cov.update(range(i, i + w))
        kept = [x for j, x in enumerate(ws) if j not in cov]
        out[d] = (len(ws), len(ws) - len(kept),
                  hashlib.md5(" ".join(kept).encode()).hexdigest())
    return out


def test_span_dedup_removal_matches_python(spark):
    docs = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "x y alpha beta gamma delta q r"),        # shares a 4-gram run
        (3, "alpha beta gamma delta epsilon zeta"),   # full dup of 1
        (4, "unique words only here nothing shared"),
        (5, "ab"),                                    # shorter than window
        (6, None),                                    # NULL text
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, r.n_removed, r.kept_hash)
           for r in span_dedup_removal(df, window_tokens=3).collect()}
    want = _py_span_removal(docs, w=3)
    assert got == want
    # the canonical owner (doc 1) keeps everything; the full dup (doc 3)
    # loses everything; the partial overlap (doc 2) loses only the span
    assert got[1][1] == 0
    assert got[3][1] == got[3][0]
    assert 0 < got[2][1] < got[2][0]
    # short and NULL docs emit rows untouched
    assert got[5] == (1, 0, hashlib.md5(b"ab").hexdigest())
    assert got[6][0] == 0 and got[6][1] == 0


def test_span_dedup_removal_no_cross_doc_dups(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "e f g h")], "doc_id long, text string")
    out = span_dedup_removal(df, window_tokens=3).collect()
    assert all(r.n_removed == 0 for r in out)


# ------------------------------------------------------ global_shuffle

def test_global_shuffle_deterministic_and_exhaustive(spark):
    df = spark.range(200).select(F.col("id").alias("doc_id"))
    a = global_shuffle(df, shards=4, salt="s1")
    b = global_shuffle(df.repartition(7), shards=4, salt="s1")
    ra = {r.doc_id: (r.shard, r.pos) for r in a.collect()}
    rb = {r.doc_id: (r.shard, r.pos) for r in b.collect()}
    # partition-layout independent, fully deterministic
    assert ra == rb
    # positions within each shard are exactly 1..n (dense, no gaps/dups)
    by_shard: dict[int, list] = {}
    for shard, pos in ra.values():
        by_shard.setdefault(shard, []).append(pos)
    assert sum(len(v) for v in by_shard.values()) == 200
    for v in by_shard.values():
        assert sorted(v) == list(range(1, len(v) + 1))


def test_global_shuffle_salt_reshuffles(spark):
    df = spark.range(100).select(F.col("id").alias("doc_id"))
    a = {r.doc_id: (r.shard, r.pos)
         for r in global_shuffle(df, shards=4, salt="s1").collect()}
    b = {r.doc_id: (r.shard, r.pos)
         for r in global_shuffle(df, shards=4, salt="s2").collect()}
    assert a != b  # a different salt is a fresh permutation
    with pytest.raises(ValueError):
        global_shuffle(df, shards=0)


def test_global_shuffle_window_is_partitioned(spark):
    df = spark.range(50).select(F.col("id").alias("doc_id"))
    plan = (global_shuffle(df, shards=4)
            ._jdf.queryExecution().executedPlan().toString())
    # the row_number window must partition by shard — never a global window
    # (same bracket-count idiom as test_plans._unpartitioned_window_lines:
    # a partitioned window prints three bracket groups, a global one two)
    assert any("Window [" in ln for ln in plan.splitlines())
    global_windows = [ln for ln in plan.splitlines()
                      if "Window [" in ln and " WindowGroupLimit" not in ln
                      and ln.count("], [") == 1]
    assert not global_windows, plan


def test_tukey_winsorize_matches_python(spark):
    """Pure-Python recomputation: fences from numpy-free exact quartiles
    (linear interpolation at (n-1)*p), clamp + flags per row."""
    import random

    from pigeon_optics_spark.pipeline.validate import tukey_winsorize

    rng = random.Random(7)
    vals = [rng.randrange(0, 1000) for _ in range(257)] + [10_000, -5_000]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "id long, x long")
    got = {r["id"]: r for r in tukey_winsorize(df, "x").collect()}

    s = sorted(vals)
    n = len(s)

    def q(p):
        pos = (n - 1) * p
        lo, frac = int(pos), pos - int(pos)
        return s[lo] + (s[min(lo + 1, n - 1)] - s[lo]) * frac

    q25, q75 = q(0.25), q(0.75)
    lo_f, hi_f = q25 - 1.5 * (q75 - q25), q75 + 1.5 * (q75 - q25)
    for i, v in enumerate(vals):
        r = got[i]
        assert r["clamped"] == max(min(float(v), hi_f), lo_f)
        assert r["below"] == (v < lo_f)
        assert r["above"] == (v > hi_f)
    assert any(r["below"] for r in got.values())
    assert any(r["above"] for r in got.values())


def test_tukey_winsorize_constant_column(spark):
    """Zero IQR: fences collapse to the constant; nothing flags."""
    from pigeon_optics_spark.pipeline.validate import tukey_winsorize

    df = spark.createDataFrame([(i, 42) for i in range(10)],
                               "id long, x long")
    rows = tukey_winsorize(df, "x").collect()
    assert all(r["clamped"] == 42.0 and not r["below"] and not r["above"]
               for r in rows)


def test_tukey_winsorize_null_stays_null(spark):
    """A NULL input must stay NULL — LEAST/GREATEST skip NULLs, so the
    naive clamp would fabricate the UPPER FENCE for missing data."""
    from pigeon_optics_spark.pipeline.validate import tukey_winsorize

    df = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 100), (4, None)], "id long, x long")
    rows = {r["id"]: r for r in tukey_winsorize(df, "x").collect()}
    assert rows[4]["clamped"] is None
    assert rows[4]["below"] is None and rows[4]["above"] is None
    assert rows[3]["above"] and rows[3]["clamped"] < 100.0


def test_tukey_winsorize_k_iqr_tightens(spark):
    """Smaller k_iqr must clamp strictly more rows (the gate runs 0.25)."""
    from pigeon_optics_spark.pipeline.validate import tukey_winsorize

    df = spark.createDataFrame([(i, i * i) for i in range(30)],
                               "id long, x long")
    wide = tukey_winsorize(df, "x", k_iqr=1.5).where("below OR above").count()
    tight = tukey_winsorize(df, "x", k_iqr=0.25).where("below OR above").count()
    assert tight > wide


def test_robots_rules_grouping_and_decision():
    from pigeon_optics_spark.pipeline.validate import (
        robots_decision,
        robots_rules,
    )

    txt = ("# policy\n"
           "User-Agent: BadBot\nDisallow: /\n\n"
           "User-agent: *\n"
           "DISALLOW: /private/   # inline comment\n"
           "Allow: /private/pub/\n"
           "Disallow:\n")
    rules = robots_rules(txt)
    # BadBot's match-all must not leak; empty Disallow is a no-op
    assert rules == [(False, "/private/"), (True, "/private/pub/")]
    assert robots_decision("/data/x", rules) == (True, 0)
    assert robots_decision("/private/x", rules) == (False, 9)
    assert robots_decision("/private/pub/x", rules) == (True, 13)

    # multi-agent group: rules bind to every agent named above them
    multi = "User-agent: a\nUser-agent: *\nDisallow: /q/\n"
    assert robots_rules(multi) == [(False, "/q/")]
    # named-agent selection
    assert robots_rules(multi, agent="a") == [(False, "/q/")]
    assert robots_rules("User-agent: a\nDisallow: /q/\n") == []

    # blank lines carry no semantic meaning (RFC 9309): rules after a
    # blank line still bind; a group ends only at a UA line after rules
    spaced = "User-agent: *\n\nDisallow: /r/\n"
    assert robots_rules(spaced) == [(False, "/r/")]
    split_group = "User-agent: *\nDisallow: /a/\n\nDisallow: /b/\n"
    assert robots_rules(split_group) == [(False, "/a/"), (False, "/b/")]

    # the agent parameter is case-insensitive like the UA values
    assert robots_rules("User-agent: BadBot\nDisallow: /q/\n",
                        agent="BadBot") == [(False, "/q/")]

    # RFC 9309 most-specific-group rule: when a group names the agent,
    # the '*' groups must be IGNORED (not merged in); '*' applies only
    # when no group names the agent
    mixed = ("User-agent: a\nDisallow: /a-only/\n\n"
             "User-agent: *\nDisallow: /everyone/\n")
    assert robots_rules(mixed, agent="a") == [(False, "/a-only/")]
    assert robots_rules(mixed, agent="b") == [(False, "/everyone/")]
    assert robots_rules(mixed) == [(False, "/everyone/")]
    # an agent named in a MULTI-agent group alongside '*' still gets
    # that group via the named match (not the '*' fallback)
    both = "User-agent: a\nUser-agent: *\nDisallow: /q/\n"
    assert robots_rules(both, agent="a") == [(False, "/q/")]

    # length tie -> allow wins
    tie = "User-agent: *\nDisallow: /x/\nAllow: /x/\n"
    assert robots_decision("/x/q", robots_rules(tie)) == (True, 3)


def test_robots_unknown_directive_ends_agent_run():
    """RFC 9309: any rule line (incl. Crawl-delay) ends a group's
    user-agent accumulation — previously 'beta' merged into alpha's
    group and alpha was wrongly treated as fully blocked."""
    from pigeon_optics_spark.pipeline.validate import (
        robots_decision,
        robots_rules,
    )

    txt = ("User-agent: alpha\n"
           "Crawl-delay: 10\n"
           "User-agent: beta\n"
           "Disallow: /\n")
    assert robots_rules(txt, agent="alpha") == []         # throttled only
    assert robots_rules(txt, agent="beta") == [(False, "/")]
    assert robots_decision("/x", robots_rules(txt, "alpha"))[0] is True
    assert robots_decision("/x", robots_rules(txt, "beta"))[0] is False
    # consecutive agent lines without intervening rules still group
    txt2 = "User-agent: a\nUser-agent: b\nDisallow: /p\n"
    assert robots_rules(txt2, "a") == [(False, "/p")]
    assert robots_rules(txt2, "b") == [(False, "/p")]


def test_check_constraints_awkward_names(spark):
    """Dotted / internal-colliding check names must work — they are
    report labels, never column references."""
    from pigeon_optics_spark.pipeline.validate import check_constraints

    df = spark.createDataFrame([(1,), (-2,)], "price long")
    out = {r["check_name"]: (r["violations"], r["n_rows"]) for r in
           check_constraints(df, {
               "price.positive": F.col("price") > 0,
               "_n_rows": F.col("price").isNotNull(),
           }).collect()}
    assert out["price.positive"] == (1, 2)
    assert out["_n_rows"] == (0, 2)


def test_tukey_winsorize_awkward_column_name(spark):
    from pigeon_optics_spark.pipeline.validate import tukey_winsorize

    df = spark.createDataFrame([(i,) for i in range(20)] + [(1000,)],
                               ["my col"])
    out = tukey_winsorize(df, "my col")
    assert out.where(F.col("above")).count() == 1
