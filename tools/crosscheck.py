#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's correctness gate:
runs graft.Verify at a given SF, then replays oracle_sql.json in
DuckDB over the same parquet tables and compares (schema-insensitive
to column order: columns sorted by name; rows sorted)."""
import json, subprocess, sys, math
import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
SKIP_RUN = "--no-run" in sys.argv
# Per-oracle wall budget (seconds; 0 = none). At sf>=1 the deliberate
# quadratic DuckDB baselines (fuzzy_join's all-pairs levenshtein is
# ~4h at sf1) starve the gate; an interrupted oracle is reported as
# SKIP, not FAIL — the Spark side still ran, and the oracle stays
# verified at the smaller SFs.
ORACLE_TIMEOUT = 0.0
if "--oracle-timeout" in sys.argv:
    ORACLE_TIMEOUT = float(sys.argv[sys.argv.index("--oracle-timeout") + 1])

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

if not SKIP_RUN:
    r = subprocess.run(
        ["sbt", f'runMain graft.Verify {SF_DIR} {OUT}'],
        cwd="/root/repo", capture_output=True, text=True, timeout=1800)
    if r.returncode != 0:
        print(r.stdout[-4000:]); print(r.stderr[-4000:]); sys.exit(1)
    for line in r.stdout.splitlines():
        if "[verify]" in line: print(line)

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
fails = 0
times = []  # (oracle replay seconds, name) — the driver replays these
            # same SQLs; one pathological oracle (graph_hits' inlined
            # scalar-subquery CTEs: 563 s at sf0.01) can starve the
            # whole external gate, so surface the slowest at the end.
import threading
import time as _time
skipped = []
for name, sql in sorted(oracle.items()):
    _t0 = _time.time()
    timer = None
    # The timed oracle runs on a PER-ORACLE cursor (a duplicated
    # connection sharing the catalog): interrupting the shared `con`
    # could fire AFTER the oracle finished and abort the pandas-side
    # parquet read or the NEXT oracle's first statement, mislabeling a
    # healthy query. A late interrupt now lands on a cursor that is
    # about to be closed, and only an interrupt whose elapsed time
    # actually reached the budget classifies as SKIP.
    cur = con.cursor() if ORACLE_TIMEOUT > 0 else con
    if ORACLE_TIMEOUT > 0:
        timer = threading.Timer(ORACLE_TIMEOUT, cur.interrupt)
        timer.start()
    try:
        got = con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'")
        exp = cur.sql(sql)
        # Sort case-insensitively so the pairing below matches the
        # lowercased name gate — a casing difference between engines
        # must not zip types of different columns.
        gcols = sorted(got.columns, key=str.lower)
        ecols = sorted(exp.columns, key=str.lower)
        if [c.lower() for c in gcols] != [c.lower() for c in ecols]:
            print(f"FAIL {name}: columns {gcols} vs {ecols}"); fails += 1; continue
        # Type check: the driver hashes typed values, so DuckDB promoting
        # integer sum() to HUGEINT while Spark stays BIGINT is a real FAIL
        # even when the numeric values compare equal through pandas.
        gtypes = {c: str(t) for c, t in zip(got.columns, got.types)}
        etypes = {c: str(t) for c, t in zip(exp.columns, exp.types)}
        tmis = [(gc, gtypes[gc], etypes[ec]) for gc, ec in zip(gcols, ecols)
                if gtypes[gc] != etypes[ec]]
        if tmis:
            print(f"FAIL {name}: type mismatch (col, spark, duckdb) {tmis}")
            fails += 1; continue
        g = got.df()[gcols].sort_values(gcols).values.tolist()
        e = exp.df()[ecols].sort_values(ecols).values.tolist()
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); fails += 1; continue
        bad = None
        for i, (rg, re_) in enumerate(zip(g, e)):
            for a, b in zip(rg, re_):
                same = (a == b) or (isinstance(a, float) and isinstance(b, float)
                                    and (math.isnan(a) and math.isnan(b) or a == b))
                try:
                    import pandas as pd
                    if pd.isna(a) and pd.isna(b): same = True
                except Exception: pass
                if not same:
                    bad = (i, rg, re_); break
            if bad: break
        if bad:
            print(f"FAIL {name}: first diff row {bad[0]}\n  got {bad[1]}\n  exp {bad[2]}"); fails += 1
        else:
            print(f"OK   {name}: {len(g)} rows")
    except Exception as ex:
        msg = str(ex)
        if (ORACLE_TIMEOUT > 0 and "INTERRUPT" in msg.upper()
                and _time.time() - _t0 >= ORACLE_TIMEOUT * 0.9):
            skipped.append(name)
            print(f"SKIP {name}: oracle exceeded {ORACLE_TIMEOUT:.0f}s budget")
        else:
            print(f"FAIL {name}: {msg[:300]}"); fails += 1
    finally:
        if timer is not None:
            timer.cancel()
        if cur is not con:
            cur.close()
    times.append((_time.time() - _t0, name))
times.sort(reverse=True)
slow = [(t, n) for t, n in times[:8] if t > 2.0]
if slow:
    print("\nslowest oracle replays (driver pays these too):")
    for t, n in slow:
        print(f"  {t:7.2f}s  {n}")
if skipped:
    print(f"\nskipped {len(skipped)} oracle(s) over the "
          f"{ORACLE_TIMEOUT:.0f}s budget: {', '.join(skipped)}")
print(f"\n{len(oracle) - fails - len(skipped)}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
