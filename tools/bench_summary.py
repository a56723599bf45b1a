#!/usr/bin/env python3
"""Round-close bench archiver (dev tooling, not part of the engine).

The driver captures only the last ~2000 chars of Bench's stdout, which
has truncated the per-query map in three rounds' committed BENCH_r*.json
artifacts. Bench already writes its full JSON lines to bench_out.json
(gitignored — it churns every run); this tool condenses that file into a
COMMITTED, diff-friendly summary so "which query regressed" is
answerable from the repo alone:

  python3 tools/bench_summary.py <round> [bench_out.json]

writes BENCH_SUMMARY_r<round>.json with, per benchmarked SF, the
total/calibration fields plus every per-query time rounded to
milliseconds (one compact line per SF).
"""
import json
import sys


def main() -> None:
    rnd = sys.argv[1]
    src = sys.argv[2] if len(sys.argv) > 2 else "bench_out.json"
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
            "queries_ms": {k: int(round(v * 1000))
                           for k, v in sorted(t.get("queries", {}).items())},
        }
        if t.get("unoracled"):
            row["unoracled_ms"] = {k: int(round(v * 1000))
                                   for k, v in sorted(t["unoracled"].items())}
        out.append(row)
    dst = f"BENCH_SUMMARY_r{rnd}.json"
    with open(dst, "w") as f:
        for row in out:
            f.write(json.dumps(row, separators=(",", ":")) + "\n")
    print(f"wrote {dst}: {[r['sf'] for r in out]}")


if __name__ == "__main__":
    main()
