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
            "graph_katz_centrality",
            # r15 full-board x100 sweep additions: the same quadratic
            # pair-support prefix (4 graph keys) and the shingle pair
            # stream (dedup_cluster_components) exhausted the monolithic
            # oracle's spill cap at x100 -- same decomposition, new tails.
            "graph_triangle_count", "graph_common_neighbors",
            "graph_modularity", "graph_rich_club",
            "dedup_cluster_components"]

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

# graph_triangle_count: n_nodes from the staged li projection, n_edges =
# |sup| (e is sup's key set), n_triangles = the pivot-bucketed per-node
# triangle credits summed / 3 (each triangle credits its 3 corners once).
TRIANGLE_TAIL = """
SELECT (SELECT count(DISTINCT l_partkey)
    FROM read_parquet('{stage}/li.parquet')) AS n_nodes,
  (SELECT count(*) FROM read_parquet('{stage}/sup/*.parquet')) AS n_edges,
  (SELECT CAST(SUM(tri) // 3 AS BIGINT)
    FROM read_parquet('{stage}/tri/*.parquet')) AS n_triangles"""

# graph_common_neighbors / graph_rich_club: the graded SQL verbatim with
# the sup CTE replaced by the staged table; everything past pr is
# LIMIT-2000-bounded. pr MATERIALIZED for the same inlining reason as katz.
COMMON_TAIL = """
WITH sup AS (SELECT * FROM read_parquet('{stage}/sup/*.parquet')),
pr AS MATERIALIZED (SELECT pa, pb FROM sup ORDER BY sup DESC, pa, pb
  LIMIT 2000),
e AS (SELECT pa AS src, pb AS dst FROM pr
  UNION ALL SELECT pb, pa FROM pr),
deg AS (SELECT src AS node, count(*) AS d FROM e GROUP BY 1),
w AS (SELECT e1.src AS a, e2.dst AS c, count(*) AS cn
  FROM e e1 JOIN e e2 ON e1.dst = e2.src
  WHERE e1.src < e2.dst GROUP BY 1, 2),
nw AS (SELECT a, c, cn FROM w
  WHERE NOT EXISTS (SELECT 1 FROM pr
    WHERE pr.pa = w.a AND pr.pb = w.c))
SELECT a AS pa, c AS pb, CAST(cn AS BIGINT) AS common_n,
  CAST(da.d AS BIGINT) AS deg_a, CAST(dc.d AS BIGINT) AS deg_b,
  CAST((2000000 * cn + (da.d + dc.d - cn))
    // (2 * (da.d + dc.d - cn)) AS BIGINT) / 1000000.0 AS jaccard
FROM nw JOIN deg da ON nw.a = da.node JOIN deg dc ON nw.c = dc.node
ORDER BY common_n DESC, pa, pb LIMIT 20"""

RICH_CLUB_TAIL = """
WITH sup AS (SELECT * FROM read_parquet('{stage}/sup/*.parquet')),
pr AS MATERIALIZED (SELECT pa, pb FROM sup ORDER BY sup DESC, pa, pb
  LIMIT 2000),
e AS (SELECT pa AS s, pb AS d FROM pr
  UNION ALL SELECT pb, pa FROM pr),
deg AS (SELECT s AS node, CAST(count(*) AS BIGINT) AS dg FROM e
  GROUP BY 1),
ks AS (SELECT unnest([2, 4, 8, 16]) AS k),
nk AS (SELECT k, CAST(count(*) AS BIGINT) AS n_k
  FROM deg CROSS JOIN ks WHERE dg > k GROUP BY 1),
ek AS (SELECT k, CAST(count(*) AS BIGINT) AS e_k
  FROM pr JOIN deg da ON pr.pa = da.node
    JOIN deg db ON pr.pb = db.node
  CROSS JOIN ks WHERE da.dg > k AND db.dg > k GROUP BY 1)
SELECT CAST(ks.k AS BIGINT) AS k, COALESCE(n_k, 0) AS n_k,
  COALESCE(e_k, 0) AS e_k,
  CASE WHEN COALESCE(n_k, 0) <= 1 THEN 0.0 ELSE
    CAST((2000000 * 2 * COALESCE(e_k, 0) + n_k * (n_k - 1))
      // (2 * n_k * (n_k - 1)) AS BIGINT) / 1000000.0
  END AS phi6
FROM ks LEFT JOIN nk ON ks.k = nk.k
  LEFT JOIN ek ON ks.k = ek.k ORDER BY ks.k"""

# graph_modularity: pr here is sup's KEY SET (no LIMIT) -- linear joins
# over the staged table + part brands; everything aggregates to brands.
MODULARITY_TAIL = """
WITH pr AS MATERIALIZED (SELECT pa, pb
  FROM read_parquet('{stage}/sup/*.parquet')),
mm AS (SELECT count(*) AS m FROM pr),
bb AS MATERIALIZED (SELECT p_partkey, p_brand FROM part),
e2 AS (SELECT a.p_brand AS ba, b.p_brand AS bbr FROM pr
  JOIN bb a ON pr.pa = a.p_partkey
  JOIN bb b ON pr.pb = b.p_partkey),
intra AS (SELECT ba AS p_brand, count(*) AS ei FROM e2
  WHERE ba = bbr GROUP BY 1),
deg AS (SELECT node, count(*) AS d FROM (
    SELECT pa AS node FROM pr UNION ALL SELECT pb FROM pr)
  GROUP BY 1),
bd AS (SELECT p_brand, sum(d) AS dc FROM deg
  JOIN bb ON node = p_partkey GROUP BY 1),
j AS (SELECT bd.p_brand, coalesce(ei, 0) AS ei, dc, m
  FROM bd LEFT JOIN intra ON bd.p_brand = intra.p_brand
  CROSS JOIN mm)
SELECT p_brand, CAST(ei AS BIGINT) AS n_intra,
  CAST(dc AS BIGINT) AS deg_sum,
  (CASE WHEN 4*CAST(m AS HUGEINT)*ei - CAST(dc AS HUGEINT)*dc < 0
    THEN -1 ELSE 1 END) *
  CAST((2000000 * abs(4*CAST(m AS HUGEINT)*ei
        - CAST(dc AS HUGEINT)*dc)
      + 4*CAST(m AS HUGEINT)*m)
    // (2 * (4*CAST(m AS HUGEINT)*m)) AS BIGINT) / 1000000.0
    AS contrib
FROM j ORDER BY p_brand"""

# dedup_cluster_components: the expensive stage is the shingle-inverted-
# index pair stream (sum C(df,2) join rows). Decompose it by SHINGLE
# bucket: each co-occurrence row belongs to exactly one shingle, so
# bucketing the keep-joined self-join on hash(sh) % B partitions the
# stream exactly once each and the per-pair counts merge by additive SUM.
# The closure tail (pairs -> recursive reach) runs verbatim on the merged
# common table.
CLUSTER_TAIL = """
WITH RECURSIVE common AS (SELECT ia, ib, CAST(SUM(c) AS BIGINT) AS c
  FROM read_parquet('{stage}/common_parts/*.parquet') GROUP BY 1, 2),
sizes AS (SELECT * FROM read_parquet('{stage}/doc_sizes/*.parquet')),
pairs AS (SELECT ia, ib
  FROM common JOIN sizes sa ON sa.doc_id = ia JOIN sizes sb ON sb.doc_id = ib
  WHERE CAST(c AS DOUBLE)/(sa.n + sb.n - c) >= 0.8),
nodes AS (SELECT DISTINCT x AS id FROM (
  SELECT ia AS x FROM pairs UNION SELECT ib FROM pairs)),
edges AS (SELECT ia AS a, ib AS b FROM pairs UNION SELECT ib, ia FROM pairs),
reach(a, b) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
SELECT a AS doc_id, min(b) AS cluster_rep FROM reach
GROUP BY 1 ORDER BY 1"""


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


def stage_cluster(con, stage, buckets):
    """documents -> staged shingle table -> df-capped keep set ->
    shingle-bucketed pair-count passes -> additive merge (CLUSTER_TAIL)."""
    sh = f"{stage}/sh.parquet"
    if not os.path.exists(sh):
        t0 = time.time()
        con.execute(f"""COPY (
          WITH dd AS (SELECT doc_id, string_split(text,' ') AS arr
            FROM documents)
          SELECT DISTINCT doc_id,
            unnest(list_transform(range(len(arr)-2),
              i -> arr[i+1]||' '||arr[i+2]||' '||arr[i+3])) AS sh
          FROM dd) TO '{sh}' (FORMAT PARQUET)""")
        log(f"shingles staged in {time.time() - t0:.1f}s")
    if not glob.glob(f"{stage}/doc_sizes/*.parquet"):
        os.makedirs(f"{stage}/doc_sizes", exist_ok=True)
        con.execute(f"""COPY (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
          FROM read_parquet('{sh}') GROUP BY 1)
          TO '{stage}/doc_sizes/sizes.parquet' (FORMAT PARQUET)""")
    keep = f"{stage}/keep.parquet"
    if not os.path.exists(keep):
        con.execute(f"""COPY (SELECT sh FROM read_parquet('{sh}')
          GROUP BY sh HAVING count(*) BETWEEN 2 AND 10000)
          TO '{keep}' (FORMAT PARQUET)""")
        log("keep set staged")
    os.makedirs(f"{stage}/common_parts", exist_ok=True)
    for b in range(buckets):
        part = f"{stage}/common_parts/common_{b:04d}.parquet"
        if os.path.exists(part):
            continue
        t0 = time.time()
        con.execute(f"""COPY (
          WITH k AS (SELECT sh FROM read_parquet('{keep}')
            WHERE hash(sh) % {buckets} = {b}),
          s AS (SELECT doc_id, t.sh FROM read_parquet('{sh}') t
            JOIN k ON t.sh = k.sh)
          SELECT a.doc_id AS ia, b.doc_id AS ib,
            CAST(count(*) AS BIGINT) AS c
          FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2) TO '{part}' (FORMAT PARQUET)""")
        log(f"common bucket {b + 1}/{buckets} done in {time.time() - t0:.1f}s")


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
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        pat = f"{args.sf_dir}/{t}.parquet"
        if os.path.isdir(pat):
            pat = f"{pat}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{pat}'")
    sup_keys = {"graph_clustering_coeff", "graph_harmonic_centrality",
                "graph_katz_centrality", "graph_triangle_count",
                "graph_common_neighbors", "graph_modularity",
                "graph_rich_club"}
    if sup_keys & set(keys):
        stage_sup(con, stage, args.buckets)
    ok = True
    if "graph_katz_centrality" in keys:
        ok &= compare(con, "graph_katz_centrality",
                      KATZ_TAIL.format(stage=stage), args.out_dir)
    if "graph_harmonic_centrality" in keys:
        ok &= compare(con, "graph_harmonic_centrality",
                      HARMONIC_TAIL.format(stage=stage), args.out_dir)
    if "graph_clustering_coeff" in keys or "graph_triangle_count" in keys:
        stage_coeff(con, stage, args.buckets)
    if "graph_clustering_coeff" in keys:
        ok &= compare(con, "graph_clustering_coeff",
                      COEFF_TAIL.format(stage=stage), args.out_dir)
    if "graph_triangle_count" in keys:
        ok &= compare(con, "graph_triangle_count",
                      TRIANGLE_TAIL.format(stage=stage), args.out_dir)
    if "graph_common_neighbors" in keys:
        ok &= compare(con, "graph_common_neighbors",
                      COMMON_TAIL.format(stage=stage), args.out_dir)
    if "graph_rich_club" in keys:
        ok &= compare(con, "graph_rich_club",
                      RICH_CLUB_TAIL.format(stage=stage), args.out_dir)
    if "graph_modularity" in keys:
        ok &= compare(con, "graph_modularity",
                      MODULARITY_TAIL.format(stage=stage), args.out_dir)
    if "dedup_cluster_components" in keys:
        stage_cluster(con, stage, args.buckets)
        ok &= compare(con, "dedup_cluster_components",
                      CLUSTER_TAIL.format(stage=stage), args.out_dir)
    print(f"\n== attest {'PASS' if ok else 'FAIL'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
