#!/usr/bin/env python3
"""Execute the PostgreSQL upsert grammar for real, against DuckDB.

Usage: python3 tools/check_pg.py <pgDumpDir>

<pgDumpDir> is the output of `runMain graft.PgDialect <sfDir> <out>`:
one subdirectory per grammar case — `rates` (the reference's 2-col-key
Type-1 upsert, merged state from q8_upsert_type1), `bank` (the
reference's 1-col bank key, with NULL timestamps riding both the INSERT
and DO UPDATE arms), `rates3` (3-col composite key, nullable value).
Each case holds seed/ and rows/ parquet, statement.sql (the EXACT
Postgres-dialect `INSERT … ON CONFLICT DO UPDATE` text
Sinks.upsertStatements generates), and meta.json (bind order + keys).

The check per case: create the keyed target table, insert the seed
(stale values for update keys, insert keys absent), execute the
statement text once per row — the real jdbcUpsert execution order — and
assert the table now equals the merged state. Then REPLAY the whole
batch and assert it again: the reference's procedure is an idempotent
upsert, so a re-run of the same batch must be a no-op.

PASS/FAIL per (case, phase); exit 0 iff all pass.
"""
import duckdb, glob, json, os, sys

import pandas as pd

root = sys.argv[1]
# one meta.json at the top level = a single-case legacy dump
cases = ([root] if os.path.exists(f"{root}/meta.json") else
         sorted(p for p in glob.glob(f"{root}/*") if os.path.isdir(p)))
if not cases:
    print(f"no cases under {root}")
    sys.exit(1)

fails = 0
for out in cases:
    case = os.path.basename(out.rstrip("/"))
    meta = json.load(open(f"{out}/meta.json"))
    sql = open(f"{out}/statement.sql").read()
    table, bind, keys = meta["table"], meta["bind_order"], meta["key_cols"]

    con = duckdb.connect()
    seed = pd.concat([pd.read_parquet(p)
                      for p in sorted(glob.glob(f"{out}/seed/*.parquet"))],
                     ignore_index=True)
    rows = pd.concat([pd.read_parquet(p)
                      for p in sorted(glob.glob(f"{out}/rows/*.parquet"))],
                     ignore_index=True)

    # keyed DDL: ON CONFLICT needs the unique constraint, exactly like the
    # reference's Postgres table (SQL:188-248 PRIMARY KEY)
    con.register("seed_v", seed)
    types = {r[0]: r[1] for r in
             con.execute("DESCRIBE SELECT * FROM seed_v").fetchall()}
    ddl_cols = ", ".join(f'"{c}" {types[c]}' for c in seed.columns)
    pk = ", ".join(f'"{k}"' for k in keys)
    con.execute(f'CREATE TABLE "{table}" ({ddl_cols}, PRIMARY KEY ({pk}))')
    con.execute(f'INSERT INTO "{table}" SELECT * FROM seed_v')

    # None for NaN/NaT so nullable columns bind as SQL NULL, not floats
    params = [tuple(None if pd.isna(v) else v for v in r)
              for r in rows[bind].itertuples(index=False, name=None)]
    nulls = sum(any(v is None for v in p) for p in params)

    for phase in ("upsert", "idempotent replay"):
        con.executemany(sql, params)
        got = (con.execute(f'SELECT * FROM "{table}" ORDER BY {pk}').df()
               .reset_index(drop=True))
        exp = (rows.reindex(got.columns, axis=1)
               .sort_values(keys).reset_index(drop=True))
        if got.equals(exp):
            print(f"PASS {case}/{phase}: table matches merged state "
                  f"({len(got)} rows, {len(keys)}-col key, "
                  f"{nulls} NULL-bound rows) after the ON CONFLICT text")
        else:
            diff = (got != exp).any(axis=1)
            print(f"FAIL {case}/{phase}: {int(diff.sum())} mismatching "
                  f"rows, first:")
            print(got[diff].head(3))
            print(exp[diff].head(3))
            fails += 1
    print(f"statement executed ({case}):\n" + sql)

sys.exit(1 if fails else 0)
