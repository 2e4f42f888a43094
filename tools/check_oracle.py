#!/usr/bin/env python3
"""Local pre-check of SparkEntry.oracleSql vs the Verify parquet dumps.

Mimics the driver's t2 gate: for each query with an oracle, run the SQL in
DuckDB over views of the scale-factor parquet tables, sort columns by name,
and compare against the Spark result parquet (values + schema + row order).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import functools
import json
import sys

import duckdb
import pyarrow.parquet as pq
import pandas as pd

# stream results even through a pipe (heavy oracles at larger SFs run for
# minutes; buffered output hides which query is grinding)
print = functools.partial(print, flush=True)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).fetch_df()
            got = pq.read_table(f"{out_dir}/{name}").to_pandas()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        exp = exp.reindex(sorted(exp.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs oracle {list(exp.columns)}")
            n_fail += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows {len(got)} vs oracle {len(exp)}")
            n_fail += 1
            continue
        bad = []
        for c in exp.columns:
            ev, gv = exp[c], got[c]
            try:
                if ev.dtype.kind == "f" or gv.dtype.kind == "f":
                    import numpy as np
                    e_arr = ev.astype(float).to_numpy()
                    g_arr = gv.astype(float).to_numpy()
                    neq = ~((e_arr == g_arr) | (pd.isna(e_arr) & pd.isna(g_arr)))
                else:
                    neq = ~((ev == gv) | (ev.isna() & gv.isna()))
            except Exception as e:
                bad.append((c, f"compare error {e}"))
                continue
            if neq.any():
                i = int(neq.to_numpy().nonzero()[0][0]) if hasattr(neq, "to_numpy") else int(neq.nonzero()[0][0])
                bad.append((c, f"first diff row {i}: got={got[c].iloc[i]!r} exp={exp[c].iloc[i]!r} ({int(neq.sum())} diffs)"))
        # dtype check (schema part of the gate). The driver hashes values
        # per-dtype, so int64-vs-float64 drift (e.g. an un-cast DuckDB window
        # sum coming back HUGEINT->float64) is a hard FAIL there — mirror it.
        dt = [(c, str(got[c].dtype), str(exp[c].dtype)) for c in exp.columns
              if str(got[c].dtype) != str(exp[c].dtype)]
        hard_dt = [(c, g, e) for c, g, e in dt
                   if ({got[c].dtype.kind, exp[c].dtype.kind} & {"i", "u"})
                   and ({got[c].dtype.kind, exp[c].dtype.kind} & {"f"})]
        if hard_dt:
            bad.extend((c, f"dtype drift spark={g} oracle={e} (int vs float "
                           f"fails the driver hash gate)") for c, g, e in hard_dt)
        if bad:
            print(f"FAIL {name}: " + "; ".join(f"{c}: {m}" for c, m in bad[:3]))
            n_fail += 1
        else:
            note = f"  [dtype diffs: {dt}]" if dt else ""
            print(f"PASS {name} ({len(got)} rows){note}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len(set(json.loads(open(f'{out_dir}/oracle_sql.json').read()).keys()))} oracled")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
