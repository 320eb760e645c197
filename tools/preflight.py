#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/preflight.py <sfDir> <verifyOutDir> [key ...]

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), registers each
fixture parquet as a DuckDB view under its plain table name, runs every oracle
SQL, and compares row-by-row (columns sorted by name, exact value equality
with Decimal/float/datetime normalization) against the parquet graft.Verify
wrote for the same key.
"""
import sys, json, glob, os, math, datetime, decimal
import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from typegate import type_issues

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        return ("f", v)
    if isinstance(v, datetime.datetime):
        return ("dt", v.replace(tzinfo=None).isoformat())
    if isinstance(v, list):
        return ("l", tuple(norm(x) for x in v))
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # big generated fixtures (GenScale sf1 probes) can make a mis-planned
    # oracle spill the disk full; cap the spill so such an oracle FAILS
    # LOUDLY (and gets fixed) instead of taking the box down
    cap = os.environ.get("GRAFT_DUCKDB_TEMP_CAP")
    if cap:
        con.execute(f"SET max_temp_directory_size='{cap}'")
    # DuckDB's default memory_limit is 80% of PHYSICAL RAM and ignores
    # co-resident processes (a concurrent Spark JVM) — the x100 attest's
    # first run was kernel-OOM-killed at ~88 GB RSS. Optional env cap.
    mem = os.environ.get("GRAFT_DUCKDB_MEM")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
    for t in TABLES:
        # driver fixtures are single files named <t>.parquet; generated
        # fixtures (graft.GenScale) are Spark-written DIRECTORIES of the
        # same name — glob into them so either layout registers
        pat = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(pat):
            pat = f"{pat}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{pat}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for key in sorted(oracle):
        if only and key not in only:
            continue
        files = sorted(glob.glob(f"{out_dir}/{key}/*.parquet"))
        if not files:
            print(f"MISSING  {key}: no verify parquet"); n_fail += 1; continue
        try:
            exp_rel = con.sql(oracle[key])
            exp_cols = sorted(exp_rel.columns)
            exp = con.execute(
                f"SELECT {', '.join(exp_cols)} FROM exp_rel").fetchall()
        except Exception as e:
            print(f"ORAFAIL  {key}: {e}"); n_fail += 1; continue
        got_rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
        got_cols = sorted(got_rel.columns)
        if [c.lower() for c in got_cols] != [c.lower() for c in exp_cols]:
            print(f"SCHEMA   {key}: spark={got_cols} oracle={exp_cols}")
            n_fail += 1; continue
        tissues = type_issues(got_rel, exp_rel)
        if tissues:
            print(f"TYPE     {key}: " + "; ".join(tissues))
            n_fail += 1; continue
        got = con.execute(f"SELECT {', '.join(got_cols)} FROM got_rel").fetchall()
        if len(got) != len(exp):
            print(f"ROWS     {key}: spark={len(got)} oracle={len(exp)}")
            n_fail += 1; continue
        bad = None
        for i, (g, e) in enumerate(zip(got, exp)):
            if tuple(map(norm, g)) != tuple(map(norm, e)):
                bad = (i, g, e); break
        if bad:
            print(f"VALUES   {key}: first diff row {bad[0]}\n  spark : {bad[1]}\n  oracle: {bad[2]}")
            n_fail += 1
        else:
            print(f"OK       {key} ({len(got)} rows)"); n_pass += 1
    # queries without oracle: rows-only
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        key = os.path.basename(d.rstrip("/"))
        if key in oracle or (only and key not in only):
            continue
        files = sorted(glob.glob(f"{d}/*.parquet"))
        n = con.execute(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] if files else -1
        print(f"NOORACLE {key}: {n} rows"); n_skip += 1
    print(f"\n== pass={n_pass} fail={n_fail} no-oracle={n_skip}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
