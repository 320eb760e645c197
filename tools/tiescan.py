#!/usr/bin/env python3
"""Tie-exposure scan for 6dp-rounded oracle outputs (VERDICT r6 #2).

The failure class: `round(x, 6)` where x is an exact rational of two
integers can land EXACTLY on a .5 at the 6th decimal (645/3200 =
0.2015625), and different engines/builds round that tie differently
(Spark BigDecimal HALF_UP vs DuckDB's multiply-first half-even) — a
one-cell hash flip per unlucky fixture count. Structural notes:

- A rational num/den ties iff 2*10^6*num = (2k+1)*den for some k — so a
  reduced denominator dividing 10^6 (cents/100, medians of 2dp data,
  quantile interpolation at .1/.01 fractions) can NEVER tie.
- Values through sqrt/ln/exp/trig are not rationals; a 6dp tie there has
  measure zero.
- The exposed keys were converted to exact-integer HALF_UP in round 7
  (graft.T.r6) and no longer carry a `round(..., 6)` at all.

This scan verifies the REMAINING `round(x, 6)` sites are tie-free on the
actual fixtures: it rewrites each oracle's `round(X, 6)` to `(X)`,
re-runs it in DuckDB against every scale factor, and flags any DOUBLE
cell within 1e-6 of a rounding boundary (a true tie lands within ~1e-10;
the wide band also catches near-ties one fixture-row away from flipping).

Usage: python3 tools/tiescan.py <verifyOutDir-with-oracle_sql.json> [sfDir ...]
Exit 0 with "TIESCAN CLEAN" when zero cells flag.
"""
import json
import re
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# round(X, 6) with X containing nested parens up to depth 3 — covers every
# oracle in the inventory (verified: replacement count == raw count).
ROUND6 = re.compile(
    r"round\(((?:[^()]|\((?:[^()]|\((?:[^()]|\([^()]*\))*\))*\))*?),\s*6\)",
    re.IGNORECASE)

BAND = 1e-6  # boundary proximity that flags


def unround(sql: str):
    out, n = ROUND6.subn(lambda m: "(" + m.group(1) + ")", sql)
    return out, n


def main():
    out_dir = sys.argv[1]
    sf_dirs = sys.argv[2:] or [f"/root/testdata/sf{s}" for s in
                               ("0.001", "0.01", "0.1")]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    flags, scanned, skipped = 0, 0, 0
    for sf in sf_dirs:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
        for key in sorted(oracle):
            sql, n = unround(oracle[key])
            if n == 0:
                continue  # no 6dp round left — exact-int form or unrounded
            # sanity: no round(...,6) survived the rewrite
            assert not ROUND6.search(sql), key
            try:
                rel = con.sql(sql)
                cols = rel.columns
                types = [str(t) for t in rel.types]
                rows = rel.fetchall()
            except Exception as e:
                print(f"SKIP {key} @ {sf}: {str(e).splitlines()[0][:100]}")
                skipped += 1
                continue
            scanned += 1
            for r in rows:
                for c, ty, v in zip(cols, types, r):
                    if ty != "DOUBLE" or v is None:
                        continue
                    frac = (abs(v) * 1e6) % 1.0
                    if abs(frac - 0.5) < BAND:
                        print(f"TIE  {key} @ {sf}: col={c} value={v!r} "
                              f"frac6={frac:.12f}")
                        flags += 1
        con.close()
    print(f"== scanned={scanned} key-scale runs, skipped={skipped}, "
          f"tie_flags={flags}")
    print("TIESCAN CLEAN" if flags == 0 else "TIESCAN DIRTY")
    sys.exit(0 if flags == 0 else 1)


if __name__ == "__main__":
    main()
