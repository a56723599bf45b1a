#!/usr/bin/env python3
"""Round-close bench archiver (dev tooling, not part of the engine).

The driver captures only the last ~2000 chars of Bench's stdout, which
has truncated the per-query map in three rounds' committed BENCH_r*.json
artifacts. Bench already writes its full JSON lines to bench_out.json
(gitignored — it churns every run); this tool condenses that file into a
COMMITTED, diff-friendly summary so "which query regressed" is
answerable from the repo alone:

  python3 tools/bench_summary.py <round> [bench_out.json] [--duckdb oracle_sql.json]

writes BENCH_SUMMARY_r<round>.json with, per benchmarked SF, the
total/calibration fields plus every per-query time rounded to
milliseconds (one compact line per SF).

With --duckdb <oracle_sql.json> (a Verify dump's oracle file), each
row also carries the SAME-BOX DuckDB denominators: every oracle run
against the row's sf dir (warm views, min-of-2, 32 threads) as
`duckdb_ms` plus `duckdb_total_sec` — so "which query is >2x" is
answerable from the committed artifact alone, no judge-side rerun.

Schema note (r17): `calib_mt_ms` is a [start, end] pair bracketing the
timing window (it was a single end-of-run sample in r16's artifact);
this script copies the field verbatim either way.
"""
import json
import os
import sys
import time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duckdb_times(oracle_file: str, sf_dir: str) -> dict:
    import duckdb
    sqls = json.load(open(oracle_file))
    con = duckdb.connect()
    con.execute("SET threads=32")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(p):
            continue
        src = os.path.join(p, "*.parquet") if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    out = {}
    for name in sorted(sqls):
        best = None
        for _ in range(2):
            t0 = time.time()
            try:
                con.execute(sqls[name]).fetchall()
            except Exception as e:  # record, never abort the sweep
                out[name] = f"error: {e}"[:120]
                best = None
                break
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        if best is not None:
            out[name] = int(round(best * 1000))
    return out


def main() -> None:
    args = sys.argv[1:]
    oracle_file = None
    if "--duckdb" in args:
        i = args.index("--duckdb")
        oracle_file = args[i + 1]
        args = args[:i] + args[i + 2:]
    rnd = args[0]
    src = args[1] if len(args) > 1 else "bench_out.json"
    lines = [json.loads(l) for l in open(src) if l.strip()]
    totals = {l["sf"]: l for l in lines
              if l.get("metric") in ("total", "detail_sf2")}
    compacts = {l["sf"]: l for l in lines if l.get("metric") == "total_compact"}
    out = []
    for sf in sorted(set(totals) | set(compacts)):
        t, c = totals.get(sf, {}), compacts.get(sf, {})
        row = {
            "sf": sf,
            "total_sec": round(t.get("value", c.get("value", 0.0)), 3),
            "total_per_calib": c.get("total_per_calib"),
            "n_oracled": c.get("n_oracled"),
            "n_errors": c.get("n_errors"),
            "load_avg": c.get("load_avg"),
            "calib_ms": c.get("calib_ms"),
            "calib_mt_ms": c.get("calib_mt_ms"),
            "queries_ms": {k: int(round(v * 1000))
                           for k, v in sorted(t.get("queries", {}).items())},
        }
        # per-query job count + GC delta of the reported (min) rep —
        # r17 verdict item 3: makes in-run vs isolated discrepancies
        # self-attributing (jobs pins plan shape, gc_ms memory pressure)
        # r20: per-query rep spread ((max-min)/min %, -1 = single rep)
        # — lets adjudication tell a noisy pass from a real regression
        if t.get("spread_pct"):
            row["spread_pct"] = dict(sorted(t["spread_pct"].items()))
        if t.get("jobs"):
            row["jobs"] = dict(sorted(t["jobs"].items()))
        if t.get("gc_ms") is not None:
            row["gc_ms"] = dict(sorted(t["gc_ms"].items()))
        if t.get("unoracled"):
            row["unoracled_ms"] = {k: int(round(v * 1000))
                                   for k, v in sorted(t["unoracled"].items())}
        # r19: Bench is self-denominating — its detail lines carry the
        # same-run duckdb_ms measured in the same process/hour. Prefer
        # those (they are the numbers the adjudication should pair);
        # --duckdb remains as the fallback for older bench_out files.
        if t.get("duckdb_ms"):
            row["duckdb_ms"] = t["duckdb_ms"]
            row["duckdb_total_sec"] = t.get("duckdb_total_sec")
            row["duckdb_same_run"] = True
            if t.get("spark_vs_duckdb") is not None:
                row["spark_vs_duckdb"] = t["spark_vs_duckdb"]
            # r20: matched-set ratio excluding contract rungs (their
            # DuckDB side is a constant table, ~0 ms) + the count of
            # queries whose DuckDB side errored (excluded from both
            # sides of the ratios)
            if t.get("spark_vs_duckdb_oracled") is not None:
                row["spark_vs_duckdb_oracled"] = t["spark_vs_duckdb_oracled"]
            if t.get("n_duckdb_errors") is not None:
                row["n_duckdb_errors"] = t["n_duckdb_errors"]
        elif oracle_file:
            d = duckdb_times(oracle_file, sf)
            row["duckdb_ms"] = d
            row["duckdb_total_sec"] = round(
                sum(v for v in d.values() if isinstance(v, int)) / 1000.0, 3)
        out.append(row)
    dst = f"BENCH_SUMMARY_r{rnd}.json"
    with open(dst, "w") as f:
        for row in out:
            f.write(json.dumps(row, separators=(",", ":")) + "\n")
    print(f"wrote {dst}: {[r['sf'] for r in out]}")


if __name__ == "__main__":
    main()
