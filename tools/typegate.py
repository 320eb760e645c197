"""Shared type gate for preflight.py / strictdiff.py.

The driver's hash-compare is TYPE-SENSITIVE: a DuckDB HUGEINT (int128, the
result type of SUM(integer)) hashes differently from the BIGINT Spark writes,
even when every value is equal — fetchall()-based compares normalize both to
Python int and are structurally blind to it (the round-7 8-key red).

Two checks, both hard failures:
  1. HUGEINT lint: the oracle result relation must not contain HUGEINT at
     all — cast to BIGINT (or VARCHAR for true 128-bit checksums) in the SQL.
  2. Column-type equality: the DuckDB type of every oracle output column must
     textually equal the DuckDB type of the Spark parquet column of the same
     (case-insensitive) name.

Known-benign pairs that hash identically under the driver can be added to
EQUIV as ("spark_type", "oracle_type") — keep it empty until proven needed.
"""

EQUIV = set()


def type_issues(got_rel, exp_rel):
    """Return a list of human-readable issue strings (empty = clean)."""
    issues = []
    exp_t = {c.lower(): str(t) for c, t in zip(exp_rel.columns, exp_rel.types)}
    got_t = {c.lower(): str(t) for c, t in zip(got_rel.columns, got_rel.types)}
    for c, t in sorted(exp_t.items()):
        if "HUGEINT" in t.upper():
            issues.append(f"col {c}: oracle type {t} — HUGEINT is banned in "
                          f"oracle output; CAST(... AS BIGINT) in the SQL")
    for c in sorted(set(exp_t) & set(got_t)):
        if exp_t[c] != got_t[c] and (got_t[c], exp_t[c]) not in EQUIV:
            issues.append(f"col {c}: spark={got_t[c]} oracle={exp_t[c]}")
    return issues
