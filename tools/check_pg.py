#!/usr/bin/env python3
"""Execute the PostgreSQL upsert grammar for real, against DuckDB.

Usage: python3 tools/check_pg.py <pgDumpDir>

<pgDumpDir> is the output of `runMain graft.PgDialect <sfDir> <out>`:
seed/ and rows/ parquet, statement.sql (the EXACT Postgres-dialect
`INSERT … ON CONFLICT DO UPDATE` text Sinks.upsertStatements generates),
and meta.json (bind order + key columns).

The check: create the keyed target table, insert the seed (stale values
for update keys, insert keys absent), execute the statement text once per
row — the real jdbcUpsert execution order — and assert the table now
equals the merged Type-1 state. Then REPLAY the whole batch and assert it
again: the reference's procedure is an idempotent upsert, so a re-run of
the same batch must be a no-op.

PASS/FAIL per phase; exit 0 iff all pass.
"""
import duckdb, glob, json, sys

import pandas as pd

out = sys.argv[1]
meta = json.load(open(f"{out}/meta.json"))
sql = open(f"{out}/statement.sql").read()
table, bind, keys = meta["table"], meta["bind_order"], meta["key_cols"]

con = duckdb.connect()
seed = pd.concat([pd.read_parquet(p) for p in sorted(glob.glob(f"{out}/seed/*.parquet"))],
                 ignore_index=True)
rows = pd.concat([pd.read_parquet(p) for p in sorted(glob.glob(f"{out}/rows/*.parquet"))],
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

params = [tuple(r) for r in rows[bind].itertuples(index=False, name=None)]

fails = 0
for phase in ("upsert", "idempotent replay"):
    con.executemany(sql, params)
    got = (con.execute(f'SELECT * FROM "{table}" ORDER BY {pk}').df()
           .reset_index(drop=True))
    exp = (rows.reindex(got.columns, axis=1)
           .sort_values(keys).reset_index(drop=True))
    if got.equals(exp):
        print(f"PASS {phase}: table matches merged Type-1 state "
              f"({len(got)} rows) after executing the ON CONFLICT text")
    else:
        diff = (got != exp).any(axis=1)
        print(f"FAIL {phase}: {int(diff.sum())} mismatching rows, first:")
        print(got[diff].head(3))
        print(exp[diff].head(3))
        fails += 1

print("statement executed:\n" + sql)
sys.exit(1 if fails else 0)
