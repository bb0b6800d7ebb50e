#!/usr/bin/env python3
"""Cross-round bench comparison that respects measurement noise.

Compares two BENCH_FULL-style artifacts (complete per-query median +
[min,max] spread bands, written by graft.Bench) and flags a query as a
REGRESSION only when its spread bands are disjoint upward — new.min >
old.max — i.e. every iteration of the new run was slower than every
iteration of the old one. Anything overlapping is local[32]
scheduler/GC luck (SURVEY §7 documents ±70% swings on sub-second
queries) and is reported only under --all.

Each argument is a JSON file path, or GIT_REV:PATH (e.g.
'HEAD~5:BENCH_FULL.json') resolved via `git show` in the repo root —
so comparing the current run against any prior round is one command:

    python3 tools/benchdiff.py e82b4ed:BENCH_FULL.json BENCH_FULL.json

CONTENTION FILTER (round 12): when both artifacts carry per-query
process-CPU bands ("cpu_spread", written by graft.Bench since r12), a
wall-band regression whose CPU band still overlaps the old run's CPU
band is reclassified CONTENDED — the query burned the same CPU but
waited for the machine, so the plan did not regress. Only wall+CPU
jointly-disjoint rows count as real regressions (exit 1). Artifacts
without CPU bands fall back to wall-only classification, flagged as
such in the header.
"""
import json, subprocess, sys, os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(ref):
    if os.path.exists(ref):
        with open(ref) as f:
            return json.load(f)
    if ":" in ref:
        out = subprocess.run(["git", "show", ref], cwd=REPO,
                             capture_output=True, text=True)
        if out.returncode == 0:
            return json.loads(out.stdout)
        sys.exit(f"cannot resolve {ref}: {out.stderr.strip()}")
    sys.exit(f"no such file or git ref: {ref}")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    show_all = "--all" in sys.argv
    if len(args) != 2:
        sys.exit(__doc__)
    old, new = load(args[0]), load(args[1])
    oq, nq = old["queries"], new["queries"]
    osp, nsp = old.get("spread", {}), new.get("spread", {})
    ocs, ncs = old.get("cpu_spread", {}), new.get("cpu_spread", {})
    have_cpu = bool(ocs) and bool(ncs)

    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    reg, imp, noise, contended = [], [], [], []
    for k in sorted(set(oq) & set(nq)):
        o_lo, o_hi = osp.get(k, [oq[k], oq[k]])
        n_lo, n_hi = nsp.get(k, [nq[k], nq[k]])
        row = (k, oq[k], nq[k], nq[k] / oq[k] if oq[k] else float("inf"))
        if n_lo > o_hi:
            # Wall bands disjoint upward. If CPU bands still overlap,
            # the query did the same work and waited for the box.
            if have_cpu and k in ocs and k in ncs and ncs[k][0] <= ocs[k][1]:
                contended.append(row)
            else:
                reg.append(row)
        elif n_hi < o_lo:
            imp.append(row)
        else:
            noise.append(row)

    def show(title, rows):
        if not rows:
            return
        print(f"\n{title}")
        for k, o, n, r in sorted(rows, key=lambda x: -x[3]):
            print(f"  {k:32s} {o:7.3f}s -> {n:7.3f}s  ({r:5.2f}x)")

    print(f"old: {args[0]}  total={old['value']:.1f}s  n={len(oq)}  "
          f"mode={old.get('mode')} iters={old.get('iters')}")
    print(f"new: {args[1]}  total={new['value']:.1f}s  n={len(nq)}  "
          f"mode={new.get('mode')} iters={new.get('iters')}")
    if not have_cpu:
        print("(no CPU bands in one or both artifacts - wall-only "
              "classification; contention cannot be ruled out)")
    show(f"REGRESSIONS (wall AND cpu bands disjoint upward): {len(reg)}", reg)
    show(f"contended (wall regressed, cpu steady - machine, not plan): "
         f"{len(contended)}", contended)
    show(f"improvements (bands disjoint downward): {len(imp)}", imp)
    if show_all:
        show(f"within spread (noise): {len(noise)}", noise)
    else:
        print(f"\nwithin spread (noise, not shown): {len(noise)}")
    if added:
        print(f"new queries: {', '.join(added)}")
    if removed:
        print(f"removed queries: {', '.join(removed)}")
    sys.exit(1 if reg else 0)


if __name__ == "__main__":
    main()
