#!/usr/bin/env python3
"""Compare two graft.Verify dump directories key-by-key.

Usage: dumpdiff.py <dirA> <dirB> [key ...]

For every key present in either dir (a key = a subdirectory holding the
coalesce(1) parquet), reports the strongest equality level that holds:

  bytes    the part-*.parquet files are byte-identical
  ordered  rows equal, with types, IN PRODUCED ORDER (parquet bytes may
           differ via writer metadata, but any driver hash matches)
  multiset rows equal as a multiset only — produced order differs
           (an order-SENSITIVE driver hash would flag this key)
  DIFF     row content differs (count or values) — a real divergence
  MISSING  key present in only one dir

Exit 0 iff every key reaches at least `ordered` (the multi-JVM attest
bar: local-cluster dumps must be hash-equal to local-mode dumps under
any plausible driver compare). `multiset` keys are listed loudly —
partition-count-independence work (BASELINE.md r13) pinned produced
order board-wide, so any multiset-only key is a finding, not noise.
"""
import sys, os, glob
import duckdb


def rows_of(con, path):
    files = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
    if not files:
        return None, None
    # one file per dump (Verify coalesce(1)); read in file order
    q = ", ".join(f"'{f}'" for f in files)
    cur = con.execute(f"SELECT * FROM read_parquet([{q}])")
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    return cols, rows


def typed(rows):
    return [tuple((type(v).__name__, repr(v)) for v in r) for r in rows]


def main():
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    keys = sorted(
        {d for d in os.listdir(a_dir) if os.path.isdir(os.path.join(a_dir, d))}
        | {d for d in os.listdir(b_dir) if os.path.isdir(os.path.join(b_dir, d))})
    if only:
        keys = [k for k in keys if k in only]
    con = duckdb.connect()
    counts = {"bytes": 0, "ordered": 0, "multiset": 0, "DIFF": 0, "MISSING": 0}
    bad = []
    for k in keys:
        pa, pb = os.path.join(a_dir, k), os.path.join(b_dir, k)
        if not (os.path.isdir(pa) and os.path.isdir(pb)):
            counts["MISSING"] += 1
            bad.append((k, "MISSING"))
            print(f"MISSING  {k}")
            continue
        fa = sorted(glob.glob(os.path.join(pa, "part-*.parquet")))
        fb = sorted(glob.glob(os.path.join(pb, "part-*.parquet")))
        if (len(fa) == len(fb)
                and all(open(x, "rb").read() == open(y, "rb").read()
                        for x, y in zip(fa, fb))):
            counts["bytes"] += 1
            continue
        ca, ra = rows_of(con, pa)
        cb, rb = rows_of(con, pb)
        if ca != cb:
            counts["DIFF"] += 1
            bad.append((k, f"schema {ca} vs {cb}"))
            print(f"DIFF     {k}: schema {ca} vs {cb}")
            continue
        ta, tb = typed(ra), typed(rb)
        if ta == tb:
            counts["ordered"] += 1
            print(f"ordered  {k} ({len(ta)} rows; parquet bytes differ)")
        elif sorted(ta) == sorted(tb):
            counts["multiset"] += 1
            bad.append((k, "order differs"))
            print(f"multiset {k}: {len(ta)} rows equal but produced order differs")
        else:
            counts["DIFF"] += 1
            sa, sb = set(ta), set(tb)
            onlya, onlyb = list(sa - sb)[:2], list(sb - sa)[:2]
            bad.append((k, f"{len(ta)} vs {len(tb)} rows"))
            print(f"DIFF     {k}: {len(ta)} vs {len(tb)} rows; "
                  f"onlyA={onlya} onlyB={onlyb}")
    total = sum(counts.values())
    print(f"\n{total} keys: {counts['bytes']} byte-identical, "
          f"{counts['ordered']} ordered-equal, {counts['multiset']} multiset-only, "
          f"{counts['DIFF']} DIFF, {counts['MISSING']} missing")
    hard_bad = [b for b in bad if b[1] != "order differs"]
    sys.exit(1 if (hard_bad or counts["multiset"]) else 0)


if __name__ == "__main__":
    main()
