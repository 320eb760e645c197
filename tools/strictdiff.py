#!/usr/bin/env python3
"""Strict (un-normalized) replica of every plausible driver hash-compare.

Usage: python3 tools/strictdiff.py <sfDir> <verifyOutDir> [key ...]

For each oracle key, loads the graft.Verify parquet and the DuckDB oracle
result with columns sorted by name, then reports the FIRST difference under
each of these lenses:

  typed   type(v) differs (Decimal vs float vs int ...)
  repr    repr(v) differs (decimal scale, float formatting, tz, ...)
  order   rows equal as a multiset but not in produced order (tie-order)

A key that is clean under all three lenses hash-matches under any driver
implementation (value-hash, string-hash, ordered or sorted).
"""
import sys, json, glob, datetime, decimal, os
import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from typegate import type_issues

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def cell(v):
    return (type(v).__name__, repr(v))


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_clean = n_dirty = 0
    for key in sorted(oracle):
        if only and key not in only:
            continue
        files = sorted(glob.glob(f"{out_dir}/{key}/*.parquet"))
        if not files:
            print(f"MISSING {key}")
            n_dirty += 1
            continue
        try:
            exp_rel = con.sql(oracle[key])
            cols = sorted(exp_rel.columns)
            exp = con.execute(
                f"SELECT {', '.join(cols)} FROM exp_rel").fetchall()
        except Exception as e:
            print(f"ORAFAIL {key}: {e}")
            n_dirty += 1
            continue
        got_rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
        gcols = sorted(got_rel.columns)
        if [c.lower() for c in gcols] != [c.lower() for c in cols]:
            print(f"SCHEMA  {key}: spark={gcols} oracle={cols}")
            n_dirty += 1
            continue
        tissues = type_issues(got_rel, exp_rel)
        if tissues:
            print(f"TYPE    {key}: " + "; ".join(tissues))
            n_dirty += 1
            continue
        got = con.execute(f"SELECT {', '.join(gcols)} FROM got_rel").fetchall()
        if len(got) != len(exp):
            print(f"ROWS    {key}: spark={len(got)} oracle={len(exp)}")
            n_dirty += 1
            continue
        issues = []
        for i, (g, e) in enumerate(zip(got, exp)):
            gr = tuple(map(cell, g))
            er = tuple(map(cell, e))
            if gr != er:
                for c, (a, b) in zip(cols, zip(gr, er)):
                    if a != b:
                        kind = "typed" if a[0] != b[0] else "repr"
                        issues.append((kind, i, c, a, b))
                        break
                break
        if issues:
            kind, i, c, a, b = issues[0]
            # order-only? compare as sorted multisets of (type,repr) rows
            gs = sorted(tuple(map(cell, r)) for r in got)
            es = sorted(tuple(map(cell, r)) for r in exp)
            if gs == es:
                kind = "order"
            print(f"{kind.upper():7} {key}: row {i} col {c}\n"
                  f"   spark : {a}\n   oracle: {b}")
            n_dirty += 1
        else:
            print(f"CLEAN   {key} ({len(got)} rows)")
            n_clean += 1
    print(f"\n== clean={n_clean} dirty={n_dirty}")
    sys.exit(1 if n_dirty else 0)


if __name__ == "__main__":
    main()
