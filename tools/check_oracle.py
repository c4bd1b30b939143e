#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles, mimicking the driver's
DuckDB compare: run `graft.Verify` first (sbt "runMain graft.Verify
<sfDir> <outDir>"), then this script loads each dumped parquet and the
oracle SQL, executes the SQL in DuckDB against the sf tables, sorts
columns by name, and compares row-by-row.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    n_ok = n_bad = 0
    for name in sorted(oracle):
        qdir = Path(out_dir) / name
        if not qdir.exists():
            print(f"MISSING  {name}: no spark output dumped")
            n_bad += 1
            continue
        got = pq.read_table(str(qdir))
        got = got.select(sorted(got.column_names))
        try:
            exp = con.execute(oracle[name]).arrow()
        except Exception as e:
            print(f"SQLERR   {name}: {e}")
            n_bad += 1
            continue
        exp = exp.select(sorted(exp.column_names))
        ok = True
        if got.column_names != exp.column_names:
            print(f"COLS     {name}: spark={got.column_names} duckdb={exp.column_names}")
            ok = False
        elif got.num_rows != exp.num_rows:
            print(f"ROWS     {name}: spark={got.num_rows} duckdb={exp.num_rows}")
            ok = False
        else:
            gs = got.to_pylist()
            es = exp.to_pylist()
            # schema check (arrow types)
            for c in got.column_names:
                tg, te = got.schema.field(c).type, exp.schema.field(c).type
                if str(tg) != str(te):
                    print(f"TYPE     {name}.{c}: spark={tg} duckdb={te}")
                    ok = False
            for i, (g, e) in enumerate(zip(gs, es)):
                for c in got.column_names:
                    if norm(g[c]) != norm(e[c]):
                        print(f"VAL      {name} row {i} col {c}: spark={g[c]!r} duckdb={e[c]!r}")
                        ok = False
                        break
                if not ok:
                    break
        if ok:
            n_ok += 1
            print(f"OK       {name} ({got.num_rows} rows)")
        else:
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
