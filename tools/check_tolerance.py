#!/usr/bin/env python3
"""Tolerance gate for the rows-only-by-design queries: value-compare the
Verify dumps against their natural DuckDB twins (tolerance_sql.json) under
explicit, per-query tolerances — so "rows-only" never means "values never
compared".

- q_bm25_logidf: identity columns (doc_id, rnk) exact; score within
  rel-tol 1e-12 (libm ln may differ in the last ulp across engines).
- q_lm_fluency_terciles: per-doc model columns (n_bigrams, fluency) exact
  against the same hashed-bigram chain; bucket/keep may disagree only for
  docs pinched between the exact quantile_disc pivot and Spark's
  Greenwald-Khanna sketch pivot (<= 2% of docs), and each bucket must hold
  roughly a third of the corpus (proportion in [0.25, 0.42]).
- q_probe_score: numpy re-solve of the identical ridge system, scores
  within abs-tol 1e-6.
- q_approx_agg (r11): HLL++ estimate within 4 standard errors of the
  exact COUNT(DISTINCT) at the default relativeSD = 0.05; the
  percentile_approx element's exact rank interval within the published
  Greenwald-Khanna bound (1/accuracy, + equal slack) of the 0.5 target.
- q_entropy (r16): doc_id/n_tokens/n_distinct exact; Shannon entropy
  within rel-tol 1e-12 (libm ln + engine-specific float-sum order).

Usage: python3 tools/check_tolerance.py <verify_out_dir> <sf_dir>
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

REL_TOL = 1e-12
MAX_BUCKET_DISAGREE = 0.02
BUCKET_PROP_LO, BUCKET_PROP_HI = 0.25, 0.42


def rows_by_key(cols, rows, key_cols):
    idx = [cols.index(k) for k in key_cols]
    return {tuple(r[i] for i in idx): r for r in rows}


def fetch(con, sql):
    cur = con.execute(sql)
    return [d[0] for d in cur.description], cur.fetchall()


def check_bm25_logidf(con, out_dir, sql):
    ocols, orows = fetch(con, sql)
    scols, srows = fetch(con, f"SELECT * FROM '{out_dir}/q_bm25_logidf/*.parquet'")
    if len(orows) != len(srows):
        return f"row counts differ: spark={len(srows)} oracle={len(orows)}"
    om = rows_by_key(ocols, orows, ["doc_id"])
    sm = rows_by_key(scols, srows, ["doc_id"])
    if om.keys() != sm.keys():
        return f"doc_id sets differ: only-spark={sorted(set(sm) - set(om))[:3]} only-oracle={sorted(set(om) - set(sm))[:3]}"
    o_rnk, o_sc = ocols.index("rnk"), ocols.index("score")
    s_rnk, s_sc = scols.index("rnk"), scols.index("score")
    for k in om:
        if om[k][o_rnk] != sm[k][s_rnk]:
            return f"doc {k}: rnk differs spark={sm[k][s_rnk]} oracle={om[k][o_rnk]}"
        a, b = sm[k][s_sc], om[k][o_sc]
        if abs(a - b) > REL_TOL * max(abs(a), abs(b)):
            return f"doc {k}: score out of rel-tol: spark={a!r} oracle={b!r}"
    return None


def check_terciles(con, out_dir, sql):
    ocols, orows = fetch(con, sql)
    scols, srows = fetch(
        con, f"SELECT * FROM '{out_dir}/q_lm_fluency_terciles/*.parquet'")
    if len(orows) != len(srows):
        return f"row counts differ: spark={len(srows)} oracle={len(orows)}"
    om = rows_by_key(ocols, orows, ["doc_id"])
    sm = rows_by_key(scols, srows, ["doc_id"])
    if om.keys() != sm.keys():
        return "doc_id sets differ"
    oi = {c: ocols.index(c) for c in ocols}
    si = {c: scols.index(c) for c in scols}
    n_disagree = 0
    counts = {"head": 0, "middle": 0, "tail": 0}
    for k in om:
        o, s = om[k], sm[k]
        for c in ("n_bigrams", "fluency"):
            if o[oi[c]] != s[si[c]]:
                return f"doc {k}: {c} differs spark={s[si[c]]} oracle={o[oi[c]]}"
        if s[si["bucket"]] not in counts:
            return f"doc {k}: unknown bucket {s[si['bucket']]!r}"
        counts[s[si["bucket"]]] += 1
        if (s[si["keep"]]) != (s[si["bucket"]] != "tail"):
            return f"doc {k}: keep inconsistent with bucket"
        if o[oi["bucket"]] != s[si["bucket"]]:
            n_disagree += 1
    n = len(om)
    if n_disagree > MAX_BUCKET_DISAGREE * n:
        return (f"bucket disagreement {n_disagree}/{n} exceeds "
                f"{MAX_BUCKET_DISAGREE:.0%} (sketch vs exact pivots)")
    for b, c in counts.items():
        if not (BUCKET_PROP_LO <= c / n <= BUCKET_PROP_HI):
            return f"bucket {b} holds {c}/{n} = {c / n:.2f}, outside [{BUCKET_PROP_LO}, {BUCKET_PROP_HI}]"
    return None


PROBE_B = 256
PROBE_LAMBDA = 655.0
SCORE_ABS_TOL = 1e-6


def check_probe_score(con, out_dir, sql):
    import numpy as np
    ocols, orows = fetch(con, sql)
    scols, srows = fetch(
        con, f"SELECT * FROM '{out_dir}/q_probe_score/*.parquet'")
    if len(orows) != len(srows):
        return f"row counts differ: spark={len(srows)} oracle={len(orows)}"
    oi = {c: ocols.index(c) for c in ocols}
    si = {c: scols.index(c) for c in scols}
    # rebuild the exact integer design matrix, re-solve the same ridge
    nf = PROBE_B + 1
    ids = [r[oi["doc_id"]] for r in orows]
    X = np.zeros((len(orows), nf), dtype=np.int64)
    Y = np.zeros(len(orows), dtype=np.int64)
    for k, r in enumerate(orows):
        Y[k] = r[oi["y"]]
        for e in r[oi["feats"]]:
            X[k][e["b"]] = e["x"]
    G = X.T @ X
    b = X.T @ Y
    w = np.linalg.solve(G.astype(float) + PROBE_LAMBDA * np.eye(nf),
                        b.astype(float))
    scores = dict(zip(ids, X.astype(float) @ w))
    ys = dict(zip(ids, Y))
    sm = rows_by_key(scols, srows, ["doc_id"])
    if {k[0] for k in sm} != set(ids):
        return "doc_id sets differ"
    for k, row in sm.items():
        kk = k[0]
        if row[si["y"]] != ys[kk]:
            return f"doc {kk}: label differs spark={row[si['y']]} oracle={ys[kk]}"
        a = row[si["score"]]
        if abs(a - scores[kk]) > SCORE_ABS_TOL:
            return f"doc {kk}: score out of tol: spark={a!r} oracle={scores[kk]!r}"
        if abs(scores[kk] - 0.5) > SCORE_ABS_TOL and \
                row[si["keep"]] != (scores[kk] >= 0.5):
            return f"doc {kk}: keep inconsistent with score {scores[kk]}"
    return None


HLL_RSD = 0.05          # Spark's approx_count_distinct default relativeSD
HLL_SIGMA = 4.0         # gate at 4 standard errors (Heule et al. 2013)
HLL_ABS_SLACK = 8       # tiny-cardinality floor (sparse-mode edge)
PCTL_ACCURACY = 1000    # the query's percentile_approx accuracy literal
PCTL_RANK_SLACK = 1.0 / PCTL_ACCURACY  # one extra eps beyond the GK bound


def check_approx_agg(con, out_dir, sql):
    ocols, orows = fetch(con, sql)
    scols, srows = fetch(con, f"SELECT * FROM '{out_dir}/q_approx_agg/*.parquet'")
    if len(orows) != len(srows):
        return f"row counts differ: spark={len(srows)} oracle={len(orows)}"
    om = rows_by_key(ocols, orows, ["event_type"])
    sm = rows_by_key(scols, srows, ["event_type"])
    if om.keys() != sm.keys():
        return "event_type sets differ"
    oi = {c: ocols.index(c) for c in ocols}
    si = {c: scols.index(c) for c in scols}
    for k in om:
        exact = om[k][oi["exact_users"]]
        approx = sm[k][si["approx_users"]]
        tol = max(HLL_SIGMA * HLL_RSD * exact, HLL_ABS_SLACK)
        if abs(approx - exact) > tol:
            return (f"{k[0]}: approx_users={approx} vs exact={exact} "
                    f"outside {HLL_SIGMA} sigma ({tol:.1f})")
        # percentile_approx returns an actual element; its exact rank
        # interval must sit within eps = 1/accuracy (+ slack) of 0.5
        n = om[k][oi["n_vals"]]
        if n == 0:
            continue
        v = sm[k][si["p50_value"]]
        if v is None:
            return f"{k[0]}: p50_value is NULL with {n} non-null values"
        # IS NOT DISTINCT FROM: `= ?` would match nothing for a NULL
        # group key (NULL = NULL is NULL) and spuriously fail the
        # element check (ADVICE r11; latent — the fixture has no NULL
        # event_type, but direct-SQL users may)
        lo, hi = con.execute(
            "SELECT COUNT(*) FILTER (WHERE value < ?), "
            "       COUNT(*) FILTER (WHERE value <= ?) "
            "FROM events WHERE event_type IS NOT DISTINCT FROM ?",
            [v, v, k[0]]).fetchone()
        if lo == hi:
            return f"{k[0]}: p50_value={v!r} is not an element of the column"
        eps = 1.0 / PCTL_ACCURACY + PCTL_RANK_SLACK
        if not (lo / n - eps <= 0.5 <= hi / n + eps):
            return (f"{k[0]}: p50={v!r} rank interval "
                    f"[{lo / n:.4f}, {hi / n:.4f}] not within {eps} of 0.5")
    return None


PAGERANK_REL_TOL = 1e-9  # per-node contribution sums reduce in
#                          engine-specific order; 5 rounds of double sums


def check_pagerank(con, out_dir, sql):
    ocols, orows = fetch(con, sql)
    scols, srows = fetch(con, f"SELECT * FROM '{out_dir}/q_pagerank/*.parquet'")
    if len(orows) != len(srows):
        return f"row counts differ: spark={len(srows)} oracle={len(orows)}"
    om = rows_by_key(ocols, orows, ["doc_id"])
    sm = rows_by_key(scols, srows, ["doc_id"])
    if om.keys() != sm.keys():
        return (f"doc_id sets differ: only-spark={sorted(set(sm) - set(om))[:3]} "
                f"only-oracle={sorted(set(om) - set(sm))[:3]}")
    o_pr, s_pr = ocols.index("pr"), scols.index("pr")
    for k in om:
        a, b = sm[k][s_pr], om[k][o_pr]
        if abs(a - b) > PAGERANK_REL_TOL * max(abs(a), abs(b)):
            return f"doc {k}: pr out of rel-tol: spark={a!r} oracle={b!r}"
    # rank mass sanity on the Spark side: sums to ~N*(teleport+damped avg)
    # == 1.0 per-node average only on a regular graph; the robust invariant
    # is that every pr is positive and finite
    if any(not (sm[k][s_pr] > 0) for k in sm):
        return "non-positive pagerank value"
    return None


HLL_SKETCH_RSD = 1.04 / (2 ** 12) ** 0.5  # lgConfigK=12 default


def check_sketch_union(con, out_dir, sql):
    ocols, orows = fetch(con, sql)
    scols, srows = fetch(
        con, f"SELECT * FROM '{out_dir}/q_sketch_union/*.parquet'")
    if len(orows) != len(srows):
        return f"row counts differ: spark={len(srows)} oracle={len(orows)}"
    om = rows_by_key(ocols, orows, ["event_type"])
    sm = rows_by_key(scols, srows, ["event_type"])
    if om.keys() != sm.keys():
        return "event_type sets differ"
    oi = {c: ocols.index(c) for c in ocols}
    si = {c: scols.index(c) for c in scols}
    for k in om:
        if om[k][oi["n_days"]] != sm[k][si["n_days"]]:
            return (f"{k[0]}: n_days differs spark={sm[k][si['n_days']]} "
                    f"oracle={om[k][oi['n_days']]}")
        exact = om[k][oi["exact_users"]]
        est = sm[k][si["est_users"]]
        tol = max(HLL_SIGMA * HLL_SKETCH_RSD * exact, HLL_ABS_SLACK)
        if abs(est - exact) > tol:
            return (f"{k[0]}: est_users={est} vs exact={exact} outside "
                    f"{HLL_SIGMA} sigma ({tol:.1f})")
    return None


def check_entropy(con, out_dir, sql):
    """q_entropy (r16): identity/count columns exact; entropy within
    rel-tol 1e-12 of the twin's (libm ln + engine-specific float sum
    order — the q_bm25_logidf class, plus an abs floor for the exact-zero
    single-token docs)."""
    ocols, orows = fetch(con, sql)
    scols, srows = fetch(con, f"SELECT * FROM '{out_dir}/q_entropy/*.parquet'")
    if len(orows) != len(srows):
        return f"row counts differ: spark={len(srows)} oracle={len(orows)}"
    om = rows_by_key(ocols, orows, ["doc_id"])
    sm = rows_by_key(scols, srows, ["doc_id"])
    if om.keys() != sm.keys():
        return f"doc_id sets differ: only-spark={sorted(set(sm) - set(om))[:3]} only-oracle={sorted(set(om) - set(sm))[:3]}"
    oi = {c: ocols.index(c) for c in ocols}
    si = {c: scols.index(c) for c in scols}
    for k in om:
        for c in ("n_tokens", "n_distinct"):
            if om[k][oi[c]] != sm[k][si[c]]:
                return (f"doc {k}: {c} differs spark={sm[k][si[c]]} "
                        f"oracle={om[k][oi[c]]}")
        a, b = sm[k][si["entropy"]], om[k][oi["entropy"]]
        if abs(a - b) > max(REL_TOL * max(abs(a), abs(b)), 1e-15):
            return f"doc {k}: entropy out of rel-tol: spark={a!r} oracle={b!r}"
    return None


CHECKS = {
    "q_bm25_logidf": check_bm25_logidf,
    "q_lm_fluency_terciles": check_terciles,
    "q_probe_score": check_probe_score,
    "q_approx_agg": check_approx_agg,
    "q_pagerank": check_pagerank,
    "q_sketch_union": check_sketch_union,
    "q_entropy": check_entropy,
}


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    tol = json.load(open(f"{out_dir}/tolerance_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(tol.items()):
        fn = CHECKS.get(name)
        if fn is None:
            print(f"FAIL {name}: no checker registered for this twin")
            n_bad += 1
            continue
        try:
            err = fn(con, out_dir, sql)
        except Exception as e:
            err = f"checker error: {e}"
        if err:
            print(f"FAIL {name}: {err}")
            n_bad += 1
        else:
            print(f"ok   {name} (within tolerance)")
            n_ok += 1
    # Verify filters its tolerance dump by the `only` argument, so a
    # checker whose query was out of scope is a SKIP, not a failure.
    # Scope is decided by the DUMP ITSELF (ADVICE r11): if the query's
    # result directory exists in out_dir, the query RAN this verify —
    # a missing tolerance_sql.json entry then means its twin was
    # dropped (e.g. a reverted toleranceSql wiring) and the value gate
    # silently vanished: FAIL loudly. Only a query absent from the
    # dump is a genuine scope skip.
    import os
    for name in sorted(set(CHECKS) - set(tol)):
        if os.path.isdir(os.path.join(out_dir, name)):
            print(f"FAIL {name}: dumped by Verify but missing from "
                  f"tolerance_sql.json — its value gate was dropped")
            n_bad += 1
        else:
            print(f"skip {name}: not in this verify scope")
    print(f"== {n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
