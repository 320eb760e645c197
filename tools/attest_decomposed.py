#!/usr/bin/env python3
"""Single-node-feasible DuckDB oracles for the three quadratic graph keys
whose monolithic oracle plans exhaust a 65 GB temp-spill cap at the x100
fixture (VERDICT r14 "Missing" #2): graph_clustering_coeff,
graph_harmonic_centrality, graph_katz_centrality.

SEMANTICS ARE UNCHANGED. Each key's graded oracle (SparkEntry.oracleSql)
is a single SQL statement whose expensive prefix is the co-purchase
pair-support build over the lineitem self-join (and, for clustering_coeff,
the triangle 3-way self-join on top of it). This tool runs the SAME
relational algebra decomposed into orderkey- (resp. pivot-) bucketed
passes with parquet-staged intermediates, so each pass's join/aggregate
hash table is ~1/B of the monolith's and never outgrows a single node:

  pass A (xB)  sup_b  = SELECT pa, pb, count(*) FROM li self-join
                        WHERE l_orderkey % B = b GROUP BY pa, pb
  pass B       sup    = SELECT pa, pb, SUM(sup) FROM sup_* GROUP BY pa, pb
               (bucket counts are additive: the orderkey buckets partition
               the rows of the monolithic join exactly once each)
  katz/harmonic: the graded SQL verbatim with the sup CTE replaced by the
               staged table -- everything after `sup` is LIMIT-2000-bounded.
  clustering_coeff: e = sup's key set (= DISTINCT pairs); degrees from e;
               triangle credits bucketed by the wedge pivot e1.pa % B
               (each tr row belongs to exactly one pivot bucket), per-node
               credit counts appended per pass, then one additive merge.

The compare step is preflight.py's: columns sorted by name, norm()'d
exact value equality, row-for-row against the parquet graft.Verify dumped
for the same key.

usage: python3 tools/attest_decomposed.py <sfDir> <verifyOutDir>
       [--buckets N] [--stage DIR] [--keys k1,k2,...]
env:   GRAFT_DUCKDB_TEMP_CAP  (same loud-failure spill cap as preflight)
"""
import sys, os, glob, time, argparse
import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from preflight import norm

ALL_KEYS = ["graph_clustering_coeff", "graph_harmonic_centrality",
            "graph_katz_centrality"]

# Everything downstream of `sup` in the two centrality keys, verbatim from
# SparkEntry.oracleSql (GroupTen.scala) with `sup` now a staged table.
KATZ_TAIL = """
WITH sup AS (SELECT * FROM read_parquet('{stage}/sup/*.parquet')),
pr AS MATERIALIZED (SELECT pa, pb FROM sup ORDER BY sup DESC, pa, pb LIMIT 2000),
e AS (SELECT pa AS src, pb AS dst FROM pr UNION ALL SELECT pb, pa FROM pr),
v0 AS (SELECT DISTINCT src AS node, CAST(1000000 AS BIGINT) AS v FROM e),
v1 AS (SELECT e.src AS node, SUM(v0.v) // 4 AS v
  FROM e JOIN v0 ON e.dst = v0.node GROUP BY 1),
v2 AS (SELECT e.src AS node, SUM(v1.v) // 4 AS v
  FROM e JOIN v1 ON e.dst = v1.node GROUP BY 1),
v3 AS (SELECT e.src AS node, SUM(v2.v) // 4 AS v
  FROM e JOIN v2 ON e.dst = v2.node GROUP BY 1)
SELECT v1.node AS node, CAST(v1.v + v2.v + v3.v AS BIGINT) AS katz_micro
FROM v1 JOIN v2 ON v1.node = v2.node JOIN v3 ON v1.node = v3.node
ORDER BY katz_micro DESC, node LIMIT 20"""

HARMONIC_TAIL = """
WITH sup AS (SELECT * FROM read_parquet('{stage}/sup/*.parquet')),
pr AS MATERIALIZED (SELECT pa, pb FROM sup ORDER BY sup DESC, pa, pb LIMIT 2000),
e AS (SELECT pa AS s, pb AS d FROM pr UNION ALL SELECT pb, pa FROM pr),
d1 AS (SELECT DISTINCT s AS node, d AS v FROM e),
d2 AS (SELECT DISTINCT d1.node AS node, e.d AS v
  FROM d1 JOIN e ON d1.v = e.s
  WHERE e.d <> d1.node AND NOT EXISTS (SELECT 1 FROM d1 x
    WHERE x.node = d1.node AND x.v = e.d)),
d3 AS (SELECT DISTINCT d2.node AS node, e.d AS v
  FROM d2 JOIN e ON d2.v = e.s
  WHERE e.d <> d2.node
    AND NOT EXISTS (SELECT 1 FROM d1 x
      WHERE x.node = d2.node AND x.v = e.d)
    AND NOT EXISTS (SELECT 1 FROM d2 y
      WHERE y.node = d2.node AND y.v = e.d)),
c1 AS (SELECT node, CAST(count(*) AS BIGINT) AS n1 FROM d1 GROUP BY 1),
c2 AS (SELECT node, CAST(count(*) AS BIGINT) AS n2 FROM d2 GROUP BY 1),
c3 AS (SELECT node, CAST(count(*) AS BIGINT) AS n3 FROM d3 GROUP BY 1)
SELECT c1.node AS node, n1, COALESCE(n2, 0) AS n2, COALESCE(n3, 0) AS n3,
  CAST((2000000 * (6 * n1 + 3 * COALESCE(n2, 0)
      + 2 * COALESCE(n3, 0)) + 6) // 12 AS BIGINT) / 1000000.0 AS harmonic6
FROM c1 LEFT JOIN c2 ON c1.node = c2.node
  LEFT JOIN c3 ON c1.node = c3.node
ORDER BY harmonic6 DESC, node LIMIT 20"""

# clustering_coeff final select over staged degrees + merged triangle
# credits, verbatim tail of the graded oracle.
COEFF_TAIL = """
WITH t AS (SELECT node, CAST(SUM(tri) AS BIGINT) AS tri
  FROM read_parquet('{stage}/tri/*.parquet') GROUP BY 1),
dg AS (SELECT * FROM read_parquet('{stage}/dg/*.parquet'))
SELECT dg.node, dg.d, COALESCE(t.tri, 0) AS tri,
  CAST((2000000*(2*COALESCE(t.tri, 0)) + dg.d*(dg.d-1))
    // (2*(dg.d*(dg.d-1))) AS BIGINT) / 1000000.0 AS coeff
FROM dg LEFT JOIN t ON dg.node = t.node
WHERE dg.d >= 2
ORDER BY coeff DESC, dg.node LIMIT 25"""


def log(msg):
    print(f"[attest {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def stage_sup(con, stage, buckets):
    """li -> orderkey-bucketed pair-count passes -> additive sup merge."""
    os.makedirs(f"{stage}/sup_parts", exist_ok=True)
    li = f"{stage}/li.parquet"
    if not os.path.exists(li):
        log("staging li (DISTINCT l_orderkey, l_partkey) ...")
        con.execute(f"""COPY (SELECT DISTINCT l_orderkey, l_partkey
          FROM lineitem) TO '{li}' (FORMAT PARQUET)""")
    for b in range(buckets):
        part = f"{stage}/sup_parts/sup_{b:04d}.parquet"
        if os.path.exists(part):
            continue
        t0 = time.time()
        con.execute(f"""COPY (
          WITH li AS (SELECT * FROM read_parquet('{li}')
            WHERE l_orderkey % {buckets} = {b})
          SELECT a.l_partkey AS pa, b.l_partkey AS pb,
            CAST(count(*) AS BIGINT) AS sup
          FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
            AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2) TO '{part}' (FORMAT PARQUET)""")
        log(f"sup bucket {b + 1}/{buckets} done in {time.time() - t0:.1f}s")
    if not glob.glob(f"{stage}/sup/*.parquet"):
        os.makedirs(f"{stage}/sup", exist_ok=True)
        t0 = time.time()
        con.execute(f"""COPY (
          SELECT pa, pb, CAST(SUM(sup) AS BIGINT) AS sup
          FROM read_parquet('{stage}/sup_parts/*.parquet')
          GROUP BY 1, 2) TO '{stage}/sup/sup.parquet' (FORMAT PARQUET)""")
        n = con.execute(f"""SELECT count(*)
          FROM read_parquet('{stage}/sup/*.parquet')""").fetchone()[0]
        log(f"sup merge done in {time.time() - t0:.1f}s ({n} distinct pairs)")


def stage_coeff(con, stage, buckets):
    """Degrees + pivot-bucketed triangle credit passes over e = sup keys."""
    os.makedirs(f"{stage}/tri", exist_ok=True)
    os.makedirs(f"{stage}/dg", exist_ok=True)
    e = f"read_parquet('{stage}/sup/*.parquet')"
    if not glob.glob(f"{stage}/dg/*.parquet"):
        con.execute(f"""COPY (
          WITH e AS (SELECT pa, pb FROM {e})
          SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
            SELECT pa AS node FROM e UNION ALL SELECT pb FROM e)
          GROUP BY 1) TO '{stage}/dg/dg.parquet' (FORMAT PARQUET)""")
        log("degrees staged")
    for b in range(buckets):
        part = f"{stage}/tri/tri_{b:04d}.parquet"
        if os.path.exists(part):
            continue
        t0 = time.time()
        con.execute(f"""COPY (
          WITH e AS (SELECT pa, pb FROM {e}),
          tr AS (SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
            FROM (SELECT * FROM e WHERE pa % {buckets} = {b}) e1
            JOIN e e2 ON e2.pa = e1.pa AND e2.pb > e1.pb
            JOIN e e3 ON e3.pa = e1.pb AND e3.pb = e2.pb),
          cr AS (SELECT a AS node FROM tr UNION ALL SELECT b FROM tr
            UNION ALL SELECT c FROM tr)
          SELECT node, CAST(count(*) AS BIGINT) AS tri FROM cr
          GROUP BY 1) TO '{part}' (FORMAT PARQUET)""")
        log(f"tri bucket {b + 1}/{buckets} done in {time.time() - t0:.1f}s")


def compare(con, key, sql, out_dir):
    files = sorted(glob.glob(f"{out_dir}/{key}/*.parquet"))
    if not files:
        print(f"MISSING  {key}: no verify parquet")
        return False
    exp_rel = con.sql(sql)
    exp_cols = sorted(exp_rel.columns)
    exp = con.execute(f"SELECT {', '.join(exp_cols)} FROM exp_rel").fetchall()
    got_rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
    got_cols = sorted(got_rel.columns)
    if [c.lower() for c in got_cols] != [c.lower() for c in exp_cols]:
        print(f"SCHEMA   {key}: spark={got_cols} oracle={exp_cols}")
        return False
    got = con.execute(f"SELECT {', '.join(got_cols)} FROM got_rel").fetchall()
    if len(got) != len(exp):
        print(f"ROWS     {key}: spark={len(got)} oracle={len(exp)}")
        return False
    for i, (g, e) in enumerate(zip(got, exp)):
        if tuple(map(norm, g)) != tuple(map(norm, e)):
            print(f"VALUES   {key}: first diff row {i}\n"
                  f"  spark : {g}\n  oracle: {e}")
            return False
    print(f"OK       {key} ({len(got)} rows)")
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--stage", default=None)
    ap.add_argument("--keys", default=",".join(ALL_KEYS))
    args = ap.parse_args()
    keys = [k for k in args.keys.split(",") if k]
    stage = args.stage or os.path.join(args.out_dir, "_attest_stage")
    os.makedirs(stage, exist_ok=True)
    con = duckdb.connect()
    cap = os.environ.get("GRAFT_DUCKDB_TEMP_CAP")
    if cap:
        con.execute(f"SET max_temp_directory_size='{cap}'")
    # DuckDB's default memory_limit is 80% of PHYSICAL RAM and ignores
    # co-resident processes: at the x100 fixture the katz tail grew to
    # ~88 GB RSS beside a 48 GB Spark JVM and the kernel OOM-killed the
    # attest (2026-08-16). Cap it explicitly so DuckDB spills to the
    # (already-capped) temp dir instead of dying.
    mem = os.environ.get("GRAFT_DUCKDB_MEM", "40GB")
    con.execute(f"SET memory_limit='{mem}'")
    pat = f"{args.sf_dir}/lineitem.parquet"
    if os.path.isdir(pat):
        pat = f"{pat}/*.parquet"
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{pat}'")
    stage_sup(con, stage, args.buckets)
    ok = True
    if "graph_katz_centrality" in keys:
        ok &= compare(con, "graph_katz_centrality",
                      KATZ_TAIL.format(stage=stage), args.out_dir)
    if "graph_harmonic_centrality" in keys:
        ok &= compare(con, "graph_harmonic_centrality",
                      HARMONIC_TAIL.format(stage=stage), args.out_dir)
    if "graph_clustering_coeff" in keys:
        stage_coeff(con, stage, args.buckets)
        ok &= compare(con, "graph_clustering_coeff",
                      COEFF_TAIL.format(stage=stage), args.out_dir)
    print(f"\n== attest {'PASS' if ok else 'FAIL'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
