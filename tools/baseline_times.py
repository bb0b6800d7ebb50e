#!/usr/bin/env python3
"""Publish the per-query baseline the "within 2x" gate needs
(VERDICT r13 task 2): time every DuckDB oracle at a given SF on this
box (median of 3; single run if the first exceeds the budget) and
write BASELINE_TIMES.json. Optionally join a BENCH_FULL.json to
report spark_wall / duckdb_wall per query, worst first.

DuckDB replaying the oracle SQL over the same parquet is the honest
single-node reference: same semantics, same data, same machine. It
will win most small scans outright — the point is a FALSIFIABLE
per-query number, not a flattering one.

Usage:
  python3 tools/baseline_times.py <sfDir> <verifyDumpDir> \
      [--bench BENCH_FULL.json] [--out BASELINE_TIMES.json] \
      [--hard-budget SECONDS]

--hard-budget interrupts any single oracle past SECONDS and records it
as skipped (needed at sf>=1, where the deliberately quadratic
baselines — fuzzy_join's all-pairs levenshtein — would hold the run
hostage for hours; a skip is reported, never silently averaged).
"""
import json, math, statistics, sys, threading, time
import duckdb

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()
BUDGET_S = 60.0   # if one cold run exceeds this, don't run it 3x
ITERS = 3

def main():
    sf_dir = sys.argv[1]
    dump = sys.argv[2]
    bench = None
    out = "BASELINE_TIMES.json"
    hard_budget = 0.0
    args = sys.argv[3:]
    while args:
        a = args.pop(0)
        if a == "--bench":
            bench = json.load(open(args.pop(0)))
        elif a == "--out":
            out = args.pop(0)
        elif a == "--hard-budget":
            hard_budget = float(args.pop(0))

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{dump}/oracle_sql.json"))

    def timed_run(sql):
        """One run; returns (seconds, interrupted). Per-run cursor so a
        late interrupt can't poison the next statement (the crosscheck
        fix)."""
        cur = con.cursor() if hard_budget > 0 else con
        timer = None
        if hard_budget > 0:
            timer = threading.Timer(hard_budget, cur.interrupt)
            timer.start()
        t0 = time.time()
        try:
            cur.sql(sql).fetchall()
            return time.time() - t0, False
        except Exception as ex:
            el = time.time() - t0
            if "INTERRUPT" in str(ex).upper() and el >= hard_budget * 0.9:
                return el, True
            raise
        finally:
            if timer is not None:
                timer.cancel()
            if cur is not con:
                cur.close()

    times, notes, skipped = {}, {}, []
    for name, sql in sorted(oracle.items()):
        first, interrupted = timed_run(sql)
        if interrupted:
            skipped.append(name)
            notes[name] = (f"SKIP: exceeded the {hard_budget:.0f}s hard "
                           "budget (quadratic-by-contract baseline)")
            print(f"{'skip':>8}   {name}  [{notes[name]}]", flush=True)
            continue
        samples = [first]
        if first <= BUDGET_S:
            for _ in range(ITERS - 1):
                s, _ = timed_run(sql)
                samples.append(s)
        else:
            notes[name] = f"single run (first {first:.1f}s > {BUDGET_S}s budget)"
        times[name] = statistics.median(samples)
        print(f"{times[name]:8.3f}s  {name}"
              + (f"  [{notes[name]}]" if name in notes else ""), flush=True)

    artifact = {"sf_dir": sf_dir, "iters": ITERS, "budget_s": BUDGET_S,
                "hard_budget_s": hard_budget, "skipped": skipped,
                "unit": "sec", "times": times, "notes": notes,
                "total": sum(times.values())}
    json.dump(artifact, open(out, "w"), indent=1)
    print(f"\nwrote {out}: {len(times)} oracles, duckdb total "
          f"{artifact['total']:.1f}s")

    if bench:
        qs = bench.get("queries", {})
        rows = []
        for name, dt in times.items():
            if name in qs and dt > 0:
                rows.append((qs[name] / dt, qs[name], dt, name))
        rows.sort(reverse=True)
        print(f"\nspark_wall / duckdb_wall (worst {min(15, len(rows))} of "
              f"{len(rows)} common):")
        print(f"{'ratio':>8} {'spark':>8} {'duckdb':>8}  query")
        for r, s, d, n in rows[:15]:
            print(f"{r:8.2f} {s:8.3f} {d:8.3f}  {n}")
        wins = sum(1 for r, *_ in rows if r <= 1.0)
        under2 = sum(1 for r, *_ in rows if r <= 2.0)
        print(f"\nspark <= duckdb: {wins}/{len(rows)}; "
              f"within 2x: {under2}/{len(rows)}; "
              f"spark total {sum(s for _, s, _, _ in rows):.1f}s vs "
              f"duckdb total {sum(d for _, _, d, _ in rows):.1f}s")

if __name__ == "__main__":
    main()
