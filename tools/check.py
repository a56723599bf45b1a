#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (NOT part of the engine;
dev tooling only). Runs graft.Verify output against DuckDB oracles and
diffs: column set, row count, and exact values (sorted by name-sorted
columns, rows sorted).

Usage:
  python3 tools/check.py <verifyOutDir> <sfDir> [query ...]
      oracle diff (also runs the *.md sanity check first)
  python3 tools/check.py --md
      *.md sanity only: every markdown file must be valid UTF-8 with no
      NUL bytes (SURVEY.md went binary TWICE — r14 and r16 — from a
      literal NUL pasted into the row documenting the previous fix)
  python3 tools/check.py --round-close <N> [oracleSqlJson]
      round-close pairing contract: BENCH_SUMMARY_r<N>.json must exist,
      carry per-query duckdb_ms denominators + calib fields, and its
      n_oracled must match the Verify dump's oracle_sql.json (or, if no
      dump is given, the newest CORRECTNESS_r*.json). Fails the close
      when the bench artifact is missing or counts drifted.
"""
import glob
import json
import os
import re
import sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: "pd.DataFrame") -> "pd.DataFrame":
    df = df[sorted(df.columns)]
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def md_check(root: str = ".") -> int:
    """Every *.md must be NUL-free, valid UTF-8. Returns #failures."""
    bad = 0
    for p in sorted(glob.glob(os.path.join(root, "**", "*.md"),
                              recursive=True)):
        if os.sep + "target" + os.sep in p:
            continue
        data = open(p, "rb").read()
        nul = b"\x00"
        if nul in data:
            print(f"FAIL md {p}: NUL byte at offset {data.index(nul)}")
            bad += 1
            continue
        try:
            data.decode("utf-8")
        except UnicodeDecodeError as e:
            print(f"FAIL md {p}: invalid UTF-8 ({e})")
            bad += 1
    if not bad:
        print("PASS md sanity (all *.md NUL-free, valid UTF-8)")
    return bad


def round_close(rnd: str, oracle_file: str or None) -> int:
    """Pairing contract for the round-close flow. Returns #failures."""
    bad = 0
    dst = f"BENCH_SUMMARY_r{rnd}.json"
    if not os.path.exists(dst):
        print(f"FAIL round-close: {dst} missing — run Bench + "
              f"tools/bench_summary.py {rnd} bench_out.json --duckdb "
              f"<verifyOut>/oracle_sql.json before closing the round")
        return 1
    rows = [json.loads(l) for l in open(dst) if l.strip()]
    if not rows:
        print(f"FAIL round-close: {dst} is empty")
        return 1
    for row in rows:
        sf = row.get("sf")
        if not row.get("duckdb_ms"):
            print(f"FAIL round-close: {dst} sf={sf} has no duckdb_ms "
                  "denominators (rerun bench_summary.py with --duckdb)")
            bad += 1
        if row.get("calib_mt_ms") is None:
            print(f"FAIL round-close: {dst} sf={sf} missing calib_mt_ms")
            bad += 1
        # r18: every row must carry the per-query jobs + gc_ms census
        # (r17 verdict item 3 — in-run numbers must self-attribute)
        for field in ("jobs", "gc_ms"):
            if not isinstance(row.get(field), dict) or not row[field]:
                print(f"FAIL round-close: {dst} sf={sf} missing per-query "
                      f"'{field}' (rerun Bench + bench_summary.py — Bench "
                      f"emits them since r18)")
                bad += 1
    # n_oracled must match the oracle set the driver will gate against.
    n_want = None
    want_src = None
    if oracle_file:
        n_want = len(json.load(open(oracle_file)))
        want_src = oracle_file
    else:
        cands = sorted(glob.glob("CORRECTNESS_r*.json"),
                       key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
        if cands:
            want_src = cands[-1]
            d = json.load(open(want_src))
            qs = d.get("queries", d)
            n_want = sum(1 for v in qs.values()
                         if isinstance(v, dict) and v.get("err") != "no_oracle")
    if n_want is not None:
        ns = {row.get("n_oracled") for row in rows}
        if ns != {n_want}:
            print(f"FAIL round-close: {dst} n_oracled={sorted(ns)} != "
                  f"{n_want} oracled queries in {want_src}")
            bad += 1
    # r20: advice-staleness guard (r18 verdict item 8, carried through
    # r19 item 7). ADVICE.md is written by the advisor against a past
    # snapshot; once the round fixes its items, the file at HEAD lists
    # only already-fixed defects and misleads every later reader. The
    # round-close contract: if ADVICE.md has file:line bullets, it must
    # ALSO carry a "## Disposition (round <N>)" section that cites every
    # bulleted file:line with its outcome (fixed @ commit / carried /
    # rejected + why) — so HEAD is self-describing. Each cited path must
    # still exist and be long enough for its line number (a refactor
    # that moves the code must update the disposition, not orphan it).
    adv = "ADVICE.md"
    if os.path.exists(adv):
        text = open(adv, encoding="utf-8", errors="replace").read()
        cites = re.findall(r"(?m)^- \*\*\w+\*\* (\S+?):(\d+)", text)
        if cites:
            m = re.search(rf"(?m)^## Disposition \(round {rnd}\)\s*$", text)
            if not m:
                print(f"FAIL round-close: ADVICE.md has {len(cites)} advice "
                      f"bullets but no '## Disposition (round {rnd})' "
                      "section — record each item's outcome before closing")
                bad += 1
            else:
                disp = text[m.end():]
                for path, _ in cites:
                    if path not in disp:
                        print("FAIL round-close: ADVICE.md disposition "
                              f"section does not mention {path} — every "
                              "advice bullet needs an outcome")
                        bad += 1
            for path, line in cites:
                if not os.path.exists(path):
                    print(f"FAIL round-close: ADVICE.md cites {path}:{line} "
                          "but the file no longer exists")
                    bad += 1
                elif sum(1 for _ in open(path, "rb")) < int(line):
                    print(f"FAIL round-close: ADVICE.md cites {path}:{line} "
                          "past the file's end — refresh the disposition")
                    bad += 1
    # r18: clean-tree contract — a round must not close with stale
    # probe/advice artifacts lying around uncommitted (r17 verdict
    # item 8). Ignored files (bench_out.json etc.) don't count.
    import subprocess
    try:
        dirty = subprocess.run(
            ["git", "status", "--porcelain"], capture_output=True,
            text=True, check=True).stdout.strip()
        if dirty:
            print("FAIL round-close: working tree not clean — commit or "
                  "remove before closing:\n" + dirty)
            bad += 1
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print(f"WARN round-close: could not check git status ({e})")
    if not bad:
        print(f"PASS round-close pairing ({dst}: {len(rows)} sf rows, "
              f"n_oracled={rows[0].get('n_oracled')}, clean tree)")
    return bad


def main() -> None:
    if sys.argv[1] == "--md":
        sys.exit(1 if md_check() else 0)
    if sys.argv[1] == "--round-close":
        oracle = sys.argv[3] if len(sys.argv) > 3 else None
        sys.exit(1 if round_close(sys.argv[2], oracle) else 0)
    import duckdb
    import pandas as pd
    globals()["duckdb"], globals()["pd"] = duckdb, pd
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    n_md_fail = md_check()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = duckdb.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'",
                connection=con).df()
            want = con.sql(sql).df()
            g, w = normalize(got), normalize(want)
            assert list(g.columns) == list(w.columns), \
                f"columns {list(g.columns)} != {list(w.columns)}"
            assert len(g) == len(w), f"rows {len(g)} != {len(w)}"
            pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                          check_exact=True)
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        except Exception as e:  # noqa: BLE001
            msg = str(e).replace("\n", " | ")[:400]
            print(f"FAIL {name}: {msg}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_md_fail} md fail")
    sys.exit(1 if (n_fail or n_md_fail) else 0)


if __name__ == "__main__":
    main()
