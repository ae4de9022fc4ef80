#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet dumps
against the DuckDB oracle SQL and diff (sort-normalized, column-name-sorted).

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return [cols[i] for i in order], out


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            cur = con.execute(sql)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        try:
            cur = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            scols = [d[0] for d in cur.description]
            srows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_bad += 1
            continue
        oc, orw = normalize(ocols, orows)
        sc, srw = normalize(scols, srows)
        if oc != sc:
            print(f"FAIL {name}: columns differ: spark={sc} oracle={oc}")
            n_bad += 1
            continue
        if len(orw) != len(srw):
            print(f"FAIL {name}: row counts differ: spark={len(srw)} oracle={len(orw)}")
            n_bad += 1
            continue
        bad = [(a, b) for a, b in zip(srw, orw) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(orw)} rows differ; first: spark={bad[0][0]} oracle={bad[0][1]}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(orw)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
