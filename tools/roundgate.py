#!/usr/bin/env python3
"""One-command end-of-round gate (VERDICT r14 task 9): the evidence
sequence that previously lived only in session memory, as one script
the builder runs before the end-of-round commit.

Checks, in order:
  1. crosscheck at sf0.01 (runs Spark Verify + DuckDB oracle compare)
     — skipped with --no-crosscheck if a fresh dump already passed.
  2. keydiff: SURVEY §2 rows == registry keys == oracle keys.
  3. Bench headline self-check artifacts: BENCH_FULL.json parses, is
     non-empty, and reports zero failed queries.

Exit 0 iff every gate holds.

Usage:
  python3 tools/roundgate.py [--dump /tmp/graft_verify] [--no-crosscheck]
"""
import json, os, subprocess, sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

def main():
    dump = "/tmp/graft_verify"
    run_crosscheck = True
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--dump":
            dump = args.pop(0)
        elif a == "--no-crosscheck":
            run_crosscheck = False

    failures = []

    if run_crosscheck:
        print("== gate 1: crosscheck @ sf0.01 ==", flush=True)
        r = subprocess.run(
            [sys.executable, os.path.join(HERE, "crosscheck.py"),
             "/root/testdata/sf0.01", dump])
        if r.returncode != 0:
            failures.append("crosscheck failed")
    else:
        print("== gate 1: crosscheck SKIPPED (--no-crosscheck) ==")

    print("== gate 2: keydiff (SURVEY §2 vs registry vs oracles) ==",
          flush=True)
    r = subprocess.run(
        [sys.executable, os.path.join(HERE, "keydiff.py"), dump])
    if r.returncode != 0:
        failures.append("keydiff drift")

    print("== gate 3: BENCH_FULL.json health ==", flush=True)
    try:
        b = json.load(open(os.path.join(REPO, "BENCH_FULL.json")))
        nq = len(b.get("queries", {}))
        nf = len(b.get("failed", []))
        print(f"BENCH_FULL.json: {nq} queries, {nf} failed, "
              f"total {b.get('value', 0):.1f}s @ {b.get('sf')} "
              f"heap={b.get('heap_mb', '?')}mb")
        if nq == 0:
            failures.append("BENCH_FULL.json has no queries")
        if nf:
            failures.append(f"BENCH_FULL.json reports {nf} failed queries")
    except Exception as ex:
        failures.append(f"BENCH_FULL.json unreadable: {ex}")

    # Gate 4 (round-15 verdict #9): BASELINE_TIMES keys must track the
    # registry — a query missing from the baseline is invisible to the
    # per-query perf gate (that is exactly how round-15's slowest query
    # escaped it). Documented skips (oracle too slow to time at the
    # baseline SF) are allowed but must be listed here.
    print("== gate 4: BASELINE_TIMES keys vs registry ==", flush=True)
    BASELINE_SKIPS = {"fuzzy_join"}  # all-pairs levenshtein oracle
    try:
        oracle = json.load(open(os.path.join(dump, "oracle_sql.json")))
        bt = json.load(open(os.path.join(REPO, "BASELINE_TIMES.json")))
        bkeys = set(bt.get("times", bt) if isinstance(bt, dict) else bt)
        missing = sorted(set(oracle) - bkeys - BASELINE_SKIPS)
        extra = sorted(bkeys - set(oracle))
        print(f"baseline {len(bkeys)} keys vs oracle {len(oracle)} "
              f"(skips: {sorted(BASELINE_SKIPS)})")
        if missing:
            failures.append(
                f"BASELINE_TIMES missing {len(missing)} keys: {missing[:8]}")
        if extra:
            failures.append(
                f"BASELINE_TIMES has {len(extra)} stale keys: {extra[:8]}")
    except Exception as ex:
        failures.append(f"baseline keydiff failed: {ex}")

    # Gate 5 (round-16 verdict #1): the FULL `sbt test` suite must have
    # run, at exit 0, on EXACTLY the current source tree. Round 16
    # closed on 47/700 tests and shipped a red EmptyInputSpec; this gate
    # makes that impossible — SBT_TEST.json (written by tools/testgate
    # .py) must exist, record exit 0, and its src_hash must match a
    # fresh recomputation over src/ + build.sbt.
    print("== gate 5: full sbt-test record (SBT_TEST.json) ==", flush=True)
    try:
        import testgate
        rec = json.load(open(os.path.join(REPO, "SBT_TEST.json")))
        now = testgate.src_hash()
        print(f"recorded exit={rec.get('exit')} "
              f"tests={rec.get('tests_succeeded')}/{rec.get('tests_run')} "
              f"at {rec.get('when')}")
        if rec.get("exit") != 0:
            failures.append(f"sbt test record is RED (exit {rec.get('exit')})")
        if rec.get("src_hash") != now:
            failures.append(
                "sbt test record is STALE: src/ changed since the recorded "
                "run — re-run tools/testgate.py")
    except FileNotFoundError:
        failures.append(
            "no SBT_TEST.json — run tools/testgate.py (full sbt test) first")
    except Exception as ex:
        failures.append(f"sbt-test gate failed: {ex}")

    if failures:
        print("\nROUNDGATE FAIL:\n  - " + "\n  - ".join(failures))
        sys.exit(1)
    print("\nROUNDGATE OK")

if __name__ == "__main__":
    main()
