#!/usr/bin/env python3
"""Same-window Spark-vs-DuckDB twin sweep (VERDICT r13 #3).

Every weak-list adjudication needs BOTH engines measured in ONE window:
ambient VM-level CPU steal hits the sustained all-core Spark JVM while
leaving (or even favoring) the short DuckDB twins, so numbers taken hours
apart manufacture ratio disputes (5 of r13's 7 over-bar readings were
pure window drift). This script runs `graft.AB` (interleaved Spark
min-of-N, one JVM) and the DuckDB twins (min-of-N) back-to-back,
records the 1-minute loadavg at each phase boundary, and emits the
ratio table PERF.md's weak sweeps used to hand-build.

Usage:
  python3 tools/twin_bench.py <sf_dir> <q1,q2,...> [--reps N]
      [--oracle-json PATH] [--out PATH.json] [--label NAME]

The twin SQL comes from a Verify dump's oracle_sql.json (sf-independent
SQL over view names; default /tmp/verify_out/oracle_sql.json — run
`SPARK_GRAFT_ONLY=<qs> sbt "runMain graft.Verify <sf> /tmp/verify_out"`
first if absent). Spark reps run FIRST (JVM warmup inside graft.AB's
interleave), twins second; both phases print per-engine loads so an
asymmetric-steal window is visible in the artifact itself.
"""
import argparse
import json
import os
import re
import subprocess
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def load1():
    return os.getloadavg()[0]


def run_spark(sf_dir, queries, reps):
    cmd = ["sbt", "-batch",
           f"runMain graft.AB {sf_dir} {','.join(queries)} {reps}"]
    p = subprocess.run(cmd, capture_output=True, text=True,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
    out = {}
    pat = re.compile(
        r"AB (\S+)\s+med=([\d.]+) min=([\d.]+) max=([\d.]+)")
    for line in p.stdout.splitlines():
        m = pat.search(line)
        if m:
            out[m.group(1)] = {"med": float(m.group(2)),
                               "min": float(m.group(3)),
                               "max": float(m.group(4))}
    if not out:
        sys.stderr.write(p.stdout[-3000:] + p.stderr[-3000:])
        raise SystemExit("graft.AB produced no AB lines")
    return out


def run_twins(sf_dir, queries, oracle, reps):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    out = {}
    # interleave twins the same way graft.AB interleaves Spark queries
    acc = {q: [] for q in queries}
    for _ in range(reps):
        for q in queries:
            t0 = time.perf_counter()
            con.execute(oracle[q]).fetchall()
            acc[q].append(time.perf_counter() - t0)
    for q, vs in acc.items():
        vs = sorted(vs)
        out[q] = {"med": vs[len(vs) // 2], "min": vs[0], "max": vs[-1]}
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("queries")
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--oracle-json",
                    default="/tmp/verify_out/oracle_sql.json")
    ap.add_argument("--out", default=None)
    ap.add_argument("--label", default=None)
    args = ap.parse_args()
    queries = args.queries.split(",")
    oracle = json.load(open(args.oracle_json))
    missing = [q for q in queries if q not in oracle]
    if missing:
        raise SystemExit(f"no twin SQL for: {missing} — rows-only queries "
                         "have no DuckDB twin; drop them from the list")

    rec = {"label": args.label, "sf_dir": args.sf_dir, "reps": args.reps,
           "wall_start": time.strftime("%Y-%m-%dT%H:%M:%S"),
           "load_pre_spark": load1()}
    spark = run_spark(args.sf_dir, queries, args.reps)
    rec["load_post_spark"] = load1()
    twins = run_twins(args.sf_dir, queries, oracle, args.reps)
    rec["load_post_twin"] = load1()
    rec["wall_end"] = time.strftime("%Y-%m-%dT%H:%M:%S")

    rows = []
    for q in queries:
        s, d = spark.get(q), twins[q]
        if s is None:
            continue
        rows.append({"query": q, "spark_min": s["min"], "spark_med": s["med"],
                     "spark_max": s["max"], "twin_max": d["max"],
                     "twin_min": d["min"], "twin_med": d["med"],
                     "ratio_min": s["min"] / d["min"] if d["min"] else None,
                     "ratio_med": s["med"] / d["med"] if d["med"] else None})
    rec["rows"] = rows

    hdr = (f"{'query':<24} {'spark_min':>9} {'spark_med':>9} "
           f"{'twin_min':>8} {'twin_med':>8} {'r_min':>6} {'r_med':>6}")
    print(hdr)
    for r in rows:
        print(f"{r['query']:<24} {r['spark_min']:>9.3f} "
              f"{r['spark_med']:>9.3f} {r['twin_min']:>8.3f} "
              f"{r['twin_med']:>8.3f} {r['ratio_min']:>6.2f} "
              f"{r['ratio_med']:>6.2f}")
    print(f"loads: pre_spark={rec['load_pre_spark']:.2f} "
          f"post_spark={rec['load_post_spark']:.2f} "
          f"post_twin={rec['load_post_twin']:.2f} "
          f"window={rec['wall_start']}..{rec['wall_end']}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rec, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
