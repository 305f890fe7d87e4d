"""Float-drift sweep at larger-than-driver scale (r3 item 9 / r4 item 6).

Every cross-engine float-divergence class found so far (decimal→double cast,
decimal÷int scale rules, computed-double re-cast midpoints) surfaced only
ABOVE the driver's sf0.01 gate, so each round the statistical/LM gates get
one run at ~5× sf0.1: this script builds a scaled slice of the
float-sensitive tables with DETERMINISTIC perturbations (DuckDB, temp dir),
copies the rest verbatim, and drives tools/check_oracle.py over the
statistical queries at that scale.

Usage:  python tools/sf_sweep.py [src_sf_dir] [multiplier]
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 5

#: gates whose math is float-sensitive (exact-decimal sums, window frames,
#: rational LM probabilities, cluster profile aggregates)
SWEEP_QUERIES = [
    "q_event_zscores",
    "q_exact_quantiles",
    "q_moving_average",
    "text_bigram_lm",
    "corpus_cluster_profile",
    # r5 continuation: BM25 (idf/tf-saturation doubles, written-order
    # sums), DSIR (LM-ratio weights driving a threshold compare),
    # transition matrix / session conversion (int-ratio divisions)
    "text_bm25_topk",
    "text_dsir_weights",
    "events_transition_matrix",
    "events_session_conversion",
    # r5 wave 5: seasonal mean (decimal-sum / count division feeding a
    # 1.5x threshold compare), covariance (fixed-order IEEE sequence over
    # exact integer sums — larger N moves the magnitudes)
    "events_seasonal_baseline",
    "emb_covariance",
    # r5 wave 7: EWMA (sequential double fold — longer per-user chains at
    # scale exercise accumulated rounding), winsorize (interpolated
    # percentile fences at a different n)
    "events_trend_folds",  # pack: ewma+cusum+holt+linreg (r6 merge)
    "text_winsorize",
    # r5 wave 10: CUSUM (sequential struct fold with a branch — alarm
    # counts are sensitive to any single-ulp drift in the running sum,
    # and longer chains at 5x compound it; also exercises the DuckDB
    # list-accumulator oracle form at scale)
    # cusum: inside events_trend_folds (r6 merge)
    # r5 wave 12: Holt (coupled level/trend double fold — the longest
    # IEEE chains in the suite at 5×), OLS rationals (verifies the
    # documented BIGINT headroom live: 5× rows ⇒ ~25× products),
    # Gini (N² products at 5× corpus), min_by/max_by (perturbed prices
    # move the tie structure the struct order must keep deterministic)
    # holt: inside events_trend_folds (r6 merge)
    "events_forecast_backtest",
    # linreg: inside events_trend_folds (r6 merge)
    "text_corpus_metrics",  # pack incl. gini (r6 merge)
    "q_query_shape_semantics",  # pack incl. minby (r6 merge)
    # r5 wave 13: OHLC (min_by/max_by over perturbed doubles + decimal
    # volume, both batch and the streaming state-merge twin), PCA
    # invariants (eigensolve + projected-variance tolerance at 5x n),
    # rate limiter (pure integer — included to pin the shift arithmetic
    # over 5x-longer per-user chains)
    "events_ohlc_bars",
    "events_stream_ohlc",
    "emb_eval_metrics",  # pack incl. pca invariants (r6 merge)
    "events_rate_limit",
]

#: per-copy deterministic perturbations; k=0 is the original rows so the
#: base corpus stays embedded in the scaled one.  Money columns stay true
#: 2-decimal doubles (midpoint-safe, see queries/_util.py); ids offset far
#: enough to never collide.
SCALED = {
    "events": """
        SELECT event_id + CAST({k} AS BIGINT) * 1000000000 AS event_id,
               ts + ({k} * 7) * INTERVAL 1 SECOND AS ts,
               user_id + {k} * 1000000 AS user_id,
               event_type,
               value + ({k} % 9) * 0.125 AS value,
               props
        FROM src""",
    "lineitem": """
        SELECT l_orderkey + {k} * 100000000 AS l_orderkey,
               l_partkey, l_suppkey, l_linenumber,
               l_quantity,
               l_extendedprice + ({k} % 5) * 0.01 AS l_extendedprice,
               l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM src""",
    "orders": """
        SELECT o_orderkey + {k} * 100000000 AS o_orderkey,
               o_custkey, o_orderstatus,
               o_totalprice + ({k} % 5) * 0.01 AS o_totalprice,
               o_orderdate + {k} * INTERVAL 1 DAY AS o_orderdate,
               o_orderpriority
        FROM src""",
    "documents": """
        SELECT doc_id + {k} * 10000000 AS doc_id,
               CASE WHEN {k} = 0 THEN text
                    ELSE text || ' sweep copy ' || {k} END AS text,
               lang, source,
               n_chars + CASE WHEN {k} = 0 THEN 0
                              ELSE LENGTH(' sweep copy ') + LENGTH('{k}') END
                 AS n_chars
        FROM src""",
    "embeddings": """
        SELECT vec_id + {k} * 10000000 AS vec_id,
               CASE WHEN {k} = 0 THEN embedding
                    ELSE list_transform(embedding,
                                        x -> CAST(x + {k} * 0.001 AS FLOAT))
               END AS embedding,
               label
        FROM src""",
}

COPIED = ["region", "nation", "customer", "supplier", "part"]


def main() -> int:
    out = tempfile.mkdtemp(prefix="po_sf_sweep_")
    con = duckdb.connect()
    for t in COPIED:
        shutil.copy(os.path.join(SRC, f"{t}.parquet"),
                    os.path.join(out, f"{t}.parquet"))
    for t, tmpl in SCALED.items():
        con.execute(
            f"CREATE OR REPLACE VIEW src AS "
            f"SELECT * FROM read_parquet('{SRC}/{t}.parquet')")
        union = "\nUNION ALL\n".join(tmpl.format(k=k) for k in range(K))
        con.execute(f"COPY ({union}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"scaled {t}: {n} rows")
    print(f"slice at {out} ({K}x {SRC})")
    rc = subprocess.call(
        [sys.executable, os.path.join(os.path.dirname(__file__),
                                      "check_oracle.py"), out, *SWEEP_QUERIES])
    if rc == 0:
        shutil.rmtree(out, ignore_errors=True)
    else:
        print(f"slice kept for debugging: {out}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
