#!/usr/bin/env python3
"""Execute the PostgreSQL procedure grammars for real, against DuckDB.

Usage: python3 tools/check_pg.py <pgDumpDir>

<pgDumpDir> is the output of `runMain graft.PgDialect <sfDir> <out>`:
one subdirectory per grammar case. Upsert cases (`rates` — the
reference's 2-col-key Type-1 upsert, `bank` — 1-col bank key with NULL
timestamps riding both arms, `rates3` — 3-col composite key) hold seed/
and rows/ parquet, statement.sql (the EXACT Postgres-dialect
`INSERT … ON CONFLICT DO UPDATE` text Sinks.upsertStatements generates),
and meta.json (bind order + keys). Round 9 adds the two remaining
procedure grammars:

  - `deact` (kind=deactivate): the stale-record deactivation UPDATE
    (SQL/etl_world_banks.sql:126-140) — seed covers current-batch,
    stale, same-day-shield, NULL-timestamp and already-inactive rows;
    the check executes the UPDATE with the injected clock binds and
    asserts the table equals the expected post state, twice (replay is
    a no-op: flipped rows fail the `active = TRUE` arm).
  - `summary` (kind=summary): the batch-summary SELECTs + counter reset
    (SQL:147-177) — the check runs the COUNT(*) over the dumped target,
    the batch's counter SELECT (asserted against the seed row), the
    reset UPDATE (asserted zeroed), and the reset again (idempotent).

The upsert check per case: create the keyed target table, insert the
seed (stale values for update keys, insert keys absent), execute the
statement text once per row — the real jdbcUpsert execution order — and
assert the table now equals the merged state. Then REPLAY the whole
batch and assert it again: the reference's procedure is an idempotent
upsert, so a re-run of the same batch must be a no-op.

PASS/FAIL per (case, phase); exit 0 iff all pass. Set CHECK_PG_OUT to a
path to also write the machine-readable evidence artifact (the list of
(case, phase, result) checks) — the committed `tools/check_pg_r10.json`
is that artifact for the round-10 run, so the grammar-execution claim
is auditable from the repo alone.
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
results = []
out_json = os.environ.get("CHECK_PG_OUT")


def record(case, phase, ok, detail=""):
    """One PASS/FAIL line of the evidence artifact (CHECK_PG_OUT)."""
    results.append({"case": case, "phase": phase,
                    "result": "PASS" if ok else "FAIL",
                    "detail": detail})


def read_parquet_dir(d):
    return pd.concat([pd.read_parquet(p)
                      for p in sorted(glob.glob(f"{d}/*.parquet"))],
                     ignore_index=True)


def make_table(con, table, df, keys):
    # keyed DDL: ON CONFLICT needs the unique constraint, exactly like the
    # reference's Postgres table (SQL:188-248 PRIMARY KEY)
    con.register("seed_v", df)
    types = {r[0]: r[1] for r in
             con.execute("DESCRIBE SELECT * FROM seed_v").fetchall()}
    ddl_cols = ", ".join(f'"{c}" {types[c]}' for c in df.columns)
    pk = ", ".join(f'"{k}"' for k in keys)
    con.execute(f'CREATE TABLE "{table}" ({ddl_cols}, PRIMARY KEY ({pk}))')
    con.execute(f'INSERT INTO "{table}" SELECT * FROM seed_v')
    con.unregister("seed_v")
    return pk


def check_upsert(out, case, meta):
    global fails
    sql = open(f"{out}/statement.sql").read()
    table, bind, keys = meta["table"], meta["bind_order"], meta["key_cols"]
    con = duckdb.connect()
    seed = read_parquet_dir(f"{out}/seed")
    rows = read_parquet_dir(f"{out}/rows")
    pk = make_table(con, table, seed, keys)

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
        ok = got.equals(exp)
        record(case, phase, ok,
               f"{len(got)} rows, {len(keys)}-col key, "
               f"{nulls} NULL-bound rows")
        if ok:
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


def check_deactivate(out, case, meta):
    global fails
    sql = open(f"{out}/statement.sql").read()
    table, keys = meta["table"], meta["key_cols"]
    b = meta["binds"]
    # clock_date binds as midnight TIMESTAMP: `ts < DATE 'd'` and
    # `ts < TIMESTAMP 'd 00:00:00'` are the same predicate, and DuckDB's
    # TIMESTAMP_NS (parquet nanos) refuses the implicit DATE comparison
    # Postgres would accept
    params = (pd.Timestamp(b["clock_ts"]), b["batch_id"],
              pd.Timestamp(b["clock_date"]))
    con = duckdb.connect()
    seed = read_parquet_dir(f"{out}/seed")
    rows = read_parquet_dir(f"{out}/rows")
    pk = make_table(con, table, seed, keys)
    n_flip = int((seed.active & ~rows.active).sum())
    for phase in ("deactivate", "idempotent replay"):
        con.execute(sql, params)
        got = (con.execute(f'SELECT * FROM "{table}" ORDER BY {pk}').df()
               .reset_index(drop=True))
        exp = (rows.reindex(got.columns, axis=1)
               .sort_values(keys).reset_index(drop=True))
        ok = got.equals(exp)
        record(case, phase, ok,
               f"{n_flip} stale rows deactivated, {len(got)} rows")
        if ok:
            print(f"PASS {case}/{phase}: {n_flip} stale rows deactivated, "
                  f"shields held ({len(got)} rows) after the UPDATE text")
        else:
            diff = (got != exp).any(axis=1)
            print(f"FAIL {case}/{phase}: {int(diff.sum())} mismatching "
                  f"rows, first:")
            print(got[diff].head(3))
            print(exp[diff].head(3))
            fails += 1
    print(f"statement executed ({case}):\n" + sql)


def check_summary(out, case, meta):
    global fails
    count_sql = open(f"{out}/count.sql").read()
    select_sql = open(f"{out}/select.sql").read()
    reset_sql = open(f"{out}/reset.sql").read()
    log_table, keys = meta["table"], meta["key_cols"]
    b = meta["binds"]
    params = (b["batch_id"], b["table_name"])
    con = duckdb.connect()
    seed = read_parquet_dir(f"{out}/seed")
    target = read_parquet_dir(f"{out}/target")
    make_table(con, log_table, seed, keys)
    con.register("target_v", target)
    con.execute(f'CREATE TABLE "{meta["target_table"]}" AS '
                "SELECT * FROM target_v")

    total = con.execute(count_sql).fetchone()[0]
    ok_total = total == len(target)

    got = con.execute(select_sql, params).fetchone()
    exp_row = seed[(seed.batch_id == b["batch_id"]) &
                   (seed.table_name == b["table_name"])].iloc[0]
    exp = (exp_row.no_update_count, exp_row.update_count,
           exp_row.new_inserts_count)
    ok_sel = tuple(got) == exp

    record(case, "readout", ok_total and ok_sel,
           f"total_records {total}, counters {tuple(got)}")
    if ok_total and ok_sel:
        print(f"PASS {case}/readout: total_records {total}, counters "
              f"{tuple(got)} match the log row")
    else:
        print(f"FAIL {case}/readout: total {total} vs {len(target)}, "
              f"counters {got} vs {exp}")
        fails += 1

    for phase in ("reset", "idempotent replay"):
        con.execute(reset_sql, params)
        after = con.execute(select_sql, params).fetchone()
        others = con.execute(
            f'SELECT COUNT(*) FROM "{log_table}" '
            "WHERE no_update_count <> 0 AND batch_id <> ?",
            (b["batch_id"],)).fetchone()[0]
        ok = tuple(after) == (0, 0, 0) and others == len(seed) - 1
        record(case, phase, ok,
               f"counters {tuple(after)}, {others} untouched rows")
        if ok:
            print(f"PASS {case}/{phase}: batch counters zeroed, other "
                  f"batches untouched after the reset text")
        else:
            print(f"FAIL {case}/{phase}: counters {after}, "
                  f"{others} untouched rows")
            fails += 1
    print(f"statements executed ({case}):\n{count_sql}\n{select_sql}\n"
          + reset_sql)


for out in cases:
    case = os.path.basename(out.rstrip("/"))
    meta = json.load(open(f"{out}/meta.json"))
    kind = meta.get("kind", "upsert")
    if kind == "deactivate":
        check_deactivate(out, case, meta)
    elif kind == "summary":
        check_summary(out, case, meta)
    else:
        check_upsert(out, case, meta)

if out_json:
    with open(out_json, "w") as f:
        json.dump({"source": os.path.abspath(root),
                   "n_cases": len(cases), "fails": fails,
                   "checks": results}, f, indent=1)
        f.write("\n")
    print(f"evidence artifact written: {out_json}")

sys.exit(1 if fails else 0)
