#!/usr/bin/env python3
"""Potency A/B for the round-10 sqlLouvainLevels contraction fix.

Usage: python3 tools/louvain_ab.py <toyTablesDir> <toyOutDir>
       (the two dirs graft.LouvainOracleDump writes)

The round-9 ADVICE bug: the level-chain contraction joined the
ACCUMULATED map (one row per fine community) on the level-(i-1) label
instead of the per-label step map, inflating SUM(w)/SUM(k) by
non-uniform group-size products once a level accepts uneven merges.
`tools/check.py` proves the FIXED oracle equals the engine on the
uneven toy; this script proves that net is POTENT — it textually
regenerates the pre-fix map-join contraction from the dumped clean
oracle text, runs both in DuckDB over the same toy tables, and requires
them to DISAGREE (and agree everywhere except the post-contraction
level rows). Evidence lands at $CHECK_OUT (default
tools/check_louvain_r10_ab.json).
"""
import duckdb, glob, json, os, sys

tables, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in sorted(glob.glob(f"{tables}/*.parquet")):
    name = os.path.basename(f).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

clean = json.load(open(f"{out}/oracle_sql.json"))["graph_louvain_levels"]


def clean_block(i):
    return f"""wgt{i} AS MATERIALIZED (
  SELECT a.nxt AS cs, b.nxt AS cd, CAST(SUM(w.w) AS BIGINT) AS w
  FROM wgt{i-1} w
  JOIN stlv{i} a ON w.cs = a.lab
  JOIN stlv{i} b ON w.cd = b.lab
  GROUP BY a.nxt, b.nxt
), kc{i} AS MATERIALIZED (
  SELECT s.nxt AS lab, CAST(SUM(k.k) AS BIGINT) AS k
  FROM kc{i-1} k
  JOIN stlv{i} s ON k.lab = s.lab
  GROUP BY s.nxt
)"""


def buggy_block(i):
    # the pre-round-10 text: contract through the accumulated map
    key = "c" if i == 1 else f"l{i-1}"
    return f"""wgt{i} AS MATERIALIZED (
  SELECT a.l{i} AS cs, b.l{i} AS cd, CAST(SUM(w.w) AS BIGINT) AS w
  FROM wgt{i-1} w
  JOIN map{i} a ON w.cs = a.{key}
  JOIN map{i} b ON w.cd = b.{key}
  GROUP BY a.l{i}, b.l{i}
), kc{i} AS MATERIALIZED (
  SELECT m.l{i} AS lab, CAST(SUM(k.k) AS BIGINT) AS k
  FROM kc{i-1} k
  JOIN map{i} m ON k.lab = m.{key}
  GROUP BY m.l{i}
)"""


buggy = clean
swapped = 0
for i in (1, 2):  # level 3 emits no contraction (it is the last level)
    cb = clean_block(i)
    n = buggy.count(cb)
    assert n == 1, f"clean contraction block {i} not found ({n} hits) — " \
        "sqlLevelChainCtes text changed; update this regenerator"
    buggy = buggy.replace(cb, buggy_block(i))
    swapped += 1


def rows(text):
    return sorted(map(tuple, con.execute(text).fetchall()))


rc, rb = rows(clean), rows(buggy)
# the i=1 contraction is 1:1 either way (map1 is keyed by the fine c),
# so levels 0..1 must AGREE and only post-contraction levels may differ
agree = [a for a, b in zip(rc, rb) if a == b]
diverged = rc != rb
neg_gain = any(r[4] < 0 for r in rb)
fails = 0 if (diverged and len(agree) >= 2) else 1
evidence = {
    "tables": tables,
    "out": out,
    "fails": fails,
    "blocks_swapped": swapped,
    "diverged": diverged,
    "levels_agreeing": len(agree),
    "buggy_reports_negative_gain": neg_gain,
    "clean": [list(r) for r in rc],
    "buggy": [list(r) for r in rb],
}
dst = os.environ.get("CHECK_OUT", "tools/check_louvain_r10_ab.json")
with open(dst, "w") as fh:
    json.dump(evidence, fh, indent=1)
print(f"{'PASS' if fails == 0 else 'FAIL'}: clean-vs-buggy diverged="
      f"{diverged}, {len(agree)} level rows agree, buggy negative gain="
      f"{neg_gain} -> {dst}")
sys.exit(fails)
