"""Data-quality validation operators (Deequ-style constraint suites,
privacy audits) — the pre-training gatekeeping a 100 TB ingest needs
before anything downstream trusts the data.

Design: every metric is an exact integer aggregate (counts of violating
rows), so reports value-hash bit-identically against a SQL oracle; all
row-level checks for one table share a SINGLE aggregation pass (one scan
regardless of how many constraints are registered — the Deequ batching
insight), and the cross-table checks (uniqueness, referential) are each
one additional shuffle-light pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

REPORT_COLS = ("check_name", "violations", "n_rows", "passed")


def check_constraints(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Row-level constraint report: for each named boolean predicate, count
    the rows where it is NOT satisfied (NULL predicate = violation — a
    range check over a NULL value is not evidence of validity).

    → (check_name, violations, n_rows, passed), one row per check.

    Scale shape: ALL checks compile into ONE aggregation over ONE scan
    (each check is a conditional SUM in the same agg); the long-format
    report explodes the single 1-row aggregate, so report size is
    O(checks), never O(rows).
    """
    if not checks:
        raise ValueError("no constraints given")
    # user-supplied check names appear ONLY as string literals — aliasing
    # the aggregates by name and reading them back through F.col() broke
    # on dotted names (parsed as struct access) and collided with the
    # internal _n_rows alias (review finding)
    aggs = [F.count("*").alias("_n_rows")]
    for i, (_name, pred) in enumerate(checks.items()):
        aggs.append(F.sum(F.when(pred, 0).otherwise(1))
                    .cast("long").alias(f"_c{i}"))
    row = df.agg(*aggs)
    pairs = F.array(*[
        F.struct(F.lit(name).alias("check_name"),
                 F.coalesce(F.col(f"_c{i}"), F.lit(0)).alias("violations"))
        for i, name in enumerate(checks)])
    return (row.select(F.col("_n_rows").cast("long").alias("n_rows"),
                       F.explode(pairs).alias("p"))
            .select(F.col("p.check_name").alias("check_name"),
                    F.col("p.violations").alias("violations"),
                    "n_rows",
                    (F.col("p.violations") == 0).alias("passed")))


def uniqueness_check(df: DataFrame, cols: list[str],
                     name: str | None = None) -> DataFrame:
    """Key-uniqueness report row: violations = excess rows beyond one per
    distinct key (0 iff ``cols`` is a unique key).

    Scale shape: COUNT vs COUNT(DISTINCT struct) in one aggregation —
    Spark plans the distinct as a partial-aggregated expand, no
    driver-side work.
    """
    cname = name or ("unique_" + "_".join(cols))
    key = F.struct(*[F.col(c) for c in cols])
    row = df.agg(F.count("*").cast("long").alias("n_rows"),
                 F.count_distinct(key).cast("long").alias("nd"))
    return row.select(
        F.lit(cname).alias("check_name"),
        (F.col("n_rows") - F.col("nd")).alias("violations"),
        "n_rows",
        (F.col("n_rows") == F.col("nd")).alias("passed"))


def referential_check(child: DataFrame, parent: DataFrame,
                      child_key: str, parent_key: str,
                      name: str | None = None) -> DataFrame:
    """Referential-integrity report row: violations = child rows whose key
    has no parent (orphans).  NULL child keys are orphans (they reference
    nothing).

    Scale shape: LEFT join on the key (AQE picks broadcast vs shuffle by
    parent size) then one aggregation; distinct parent keys first so a
    fan-out parent can never duplicate child rows into the count.
    """
    cname = name or f"ref_{child_key}_in_{parent_key}"
    pk = parent.select(F.col(parent_key).alias("_pk")).distinct()
    j = child.select(F.col(child_key).alias("_ck")).join(
        pk, F.col("_ck") == F.col("_pk"), "left")
    row = j.agg(F.count("*").cast("long").alias("n_rows"),
                F.sum(F.when(F.col("_pk").isNull(), 1).otherwise(0))
                .cast("long").alias("violations"))
    return row.select(F.lit(cname).alias("check_name"), "violations",
                      "n_rows", (F.col("violations") == 0).alias("passed"))


def kanonymity_audit(df: DataFrame, qi_cols: list[str],
                     k: int) -> DataFrame:
    """k-anonymity audit over quasi-identifier columns: every QI
    combination's group size, flagged ``anonymous`` when at least ``k``
    records share it.  Rows in non-anonymous groups are the re-identifiable
    ones a release would have to suppress or generalize (Sweeney 2002).

    → (qi columns..., group_size, anonymous).

    Scale shape: one groupBy over the QI tuple with map-side combine;
    output is O(distinct QI combinations), not O(rows).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    return (df.groupBy(*qi_cols)
            .agg(F.count("*").cast("long").alias("group_size"))
            .select(*qi_cols, "group_size",
                    (F.col("group_size") >= k).alias("anonymous")))


def tukey_winsorize(df: DataFrame, col: str,
                    k_iqr: float = 1.5) -> DataFrame:
    """Tukey-fence winsorization of a numeric column: values outside
    [q25 - k*IQR, q75 + k*IQR] clamp to the fence, with below/above
    flags — the standard robust-outlier clamp a feature pipeline applies
    before scaling (k = 1.5 is Tukey's classic fence; smaller k clamps
    more aggressively).

    → original columns + (clamped DOUBLE, below BOOL, above BOOL).
    NULL inputs stay NULL (LEAST/GREATEST skip NULLs in both engines, so
    a naive clamp would fabricate the upper fence for missing data).

    Determinism: exact percentiles at quarter probabilities over an
    INTEGER column make every interpolated quantile, the IQR, and the
    k*IQR fences exactly representable doubles when k is dyadic (the
    q_exact_quantiles class), so the clamp is bit-stable across engines.

    Scale shape: ONE percentile aggregation (Spark's percentile is a
    partial-aggregable sketchless exact impl) broadcast back via a 1-row
    cross join — no global sort, no window.  At 100 TB swap
    percentile -> approx_percentile and the plan is unchanged.
    """
    q = df.agg(F.percentile(F.col(col), F.lit(0.25)).alias("_q25"),
               F.percentile(F.col(col), F.lit(0.75)).alias("_q75"))
    iqr = F.col("_q75") - F.col("_q25")
    fences = q.select((F.col("_q25") - k_iqr * iqr).alias("_lo"),
                      (F.col("_q75") + k_iqr * iqr).alias("_hi"))
    c = F.col(col).cast("double")
    return (df.crossJoin(F.broadcast(fences))
            .select(*df.columns,
                    F.when(c.isNull(), F.lit(None).cast("double"))
                    .otherwise(F.greatest(F.least(c, F.col("_hi")),
                                          F.col("_lo"))).alias("clamped"),
                    (c < F.col("_lo")).alias("below"),
                    (c > F.col("_hi")).alias("above")))


def robots_rules(text: str, agent: str = "*") -> list[tuple[bool, str]]:
    """Parse a robots.txt body → [(allow, path_prefix)] for ``agent`` —
    the crawl-policy half of corpus curation (a web-scale corpus must be
    able to PROVE each document's path was fetchable under the site's
    policy).  Implements the load-bearing parts of RFC 9309 grouping:

    - a group is one or more consecutive ``User-agent`` lines followed by
      its rule lines; rules bind to EVERY agent named above them;
    - only the MOST SPECIFIC matching groups apply (RFC 9309 §2.2.1):
      when any group names ``agent`` exactly, the ``*`` groups are
      ignored; ``*`` groups apply only when no group names the agent —
      a stricter group for some other bot must never leak in;
    - directive and agent names are case-insensitive, ``#`` starts a
      comment; blank lines carry NO semantic meaning (RFC 9309 — a group
      ends only when a new ``User-agent`` line follows rule lines);
    - an empty ``Disallow:`` is a no-op (allow-all), not a match-all.

    Decision logic lives in :func:`robots_decision`.
    """
    agent = agent.lower()
    # pass 1: collect every group's (agents, rules) in document order
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    agents: list[str] = []
    grp_rules: list[tuple[bool, str]] = []
    in_rules = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_rules:
                groups.append((agents, grp_rules))
                agents, grp_rules, in_rules = [], [], False
            agents.append(val.lower())
        else:
            # ANY other rule line — allow/disallow but also crawl-delay
            # etc. — ends the group's user-agent accumulation run (RFC
            # 9309 grammar).  Treating unknown directives as transparent
            # merged UNRELATED agents into one group: 'User-agent: a /
            # Crawl-delay: 10 / User-agent: b / Disallow: /' must NOT
            # block agent a (review finding).
            in_rules = True
            if key in ("allow", "disallow") and val:
                grp_rules.append((key == "allow", val))
    if agents or grp_rules:
        groups.append((agents, grp_rules))
    # pass 2: most-specific-group selection — named groups beat '*' groups
    named = [g for g in groups if agent in g[0]]
    chosen = named if named else [g for g in groups if "*" in g[0]]
    return [rule for _, rls in chosen for rule in rls]


def robots_decision(path: str, rules: list[tuple[bool, str]]) \
        -> tuple[bool, int]:
    """(allowed, matched_rule_len) by the longest-match rule: the most
    specific (longest) matching prefix decides; an allow wins a length
    tie; no match ⇒ allowed with length 0."""
    best = (True, 0)
    best_len = -1
    for allow, prefix in rules:
        if path.startswith(prefix):
            ln = len(prefix)
            if ln > best_len or (ln == best_len and allow and not best[0]):
                best = (allow, ln)
                best_len = ln
    return best
