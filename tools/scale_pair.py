#!/usr/bin/env python3
"""SCALE.md pairing helper (dev tooling, not part of the engine).

Times a named subset of the Verify dump's oracle SQLs in DuckDB
against one corpus dir (warm views, min-of-N, 32 threads) — the
same-session denominator side of a SCALE.md row:

  python3 tools/scale_pair.py <oracle_sql.json> <corpusDir> [reps] [query ...]

Prints one `DUCK <name> <seconds>` line per query (min over reps) so
the output diffs cleanly against the Spark probe's PROBE lines.
"""
import json
import os
import sys
import time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> None:
    import duckdb
    oracle_file, sf_dir = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    names = sys.argv[4:]
    sqls = json.load(open(oracle_file))
    con = duckdb.connect()
    con.execute("SET threads=32")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(p):
            continue
        src = os.path.join(p, "*.parquet") if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    for name in names or sorted(sqls):
        if name not in sqls:
            print(f"DUCK {name} MISSING")
            continue
        best = None
        for _ in range(reps):
            t0 = time.time()
            try:
                con.execute(sqls[name]).fetchall()
            except Exception as e:  # record, never abort the sweep
                print(f"DUCK {name} error: {str(e)[:120]}")
                best = None
                break
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        if best is not None:
            print(f"DUCK {name} {best:.3f}")


if __name__ == "__main__":
    main()
