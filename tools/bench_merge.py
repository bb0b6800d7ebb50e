#!/usr/bin/env python3
"""Merge a focused re-run's per-query entries into a full BENCH_FULL
artifact (round-16: dedup_containment failed at sf10 under the old
32-partition shuffle config; the fix re-ran its family, and the final
artifact records which keys came from the patch run).

The merged artifact keeps the base run's metadata, replaces/adds the
patch run's queries/spread/cpu/cpu_spread/load entries, recomputes
"value" as the sum of per-query medians, drops patched keys from
"failed", and records {"patched": {keys, from_sf, note}} so a reviewer
can see exactly which numbers came from the second run.

Usage:
  python3 tools/bench_merge.py BASE.json PATCH.json --out MERGED.json \
      --note "why the patch run exists"
"""
import json, sys

def main():
    base = json.load(open(sys.argv[1]))
    patch = json.load(open(sys.argv[2]))
    args = sys.argv[3:]
    out, note = None, ""
    while args:
        a = args.pop(0)
        if a == "--out":
            out = args.pop(0)
        elif a == "--note":
            note = args.pop(0)

    assert base.get("sf") == patch.get("sf"), \
        f"refusing to merge different SFs: {base.get('sf')} vs {patch.get('sf')}"
    keys = sorted(patch.get("queries", {}))
    for field in ("queries", "spread", "cpu", "cpu_spread", "load"):
        base.setdefault(field, {}).update(patch.get(field, {}))
    # A query that succeeded in the base but failed in the patch re-run
    # must not silently keep its stale base timing: union the patch's
    # own failed list in (minus keys the patch DID re-time), and drop
    # the stale base entries for those keys.
    patch_failed = set(patch.get("failed", [])) - set(keys)
    for k in patch_failed:
        for field in ("queries", "spread", "cpu", "cpu_spread", "load"):
            base.get(field, {}).pop(k, None)
    base["failed"] = sorted(
        (set(base.get("failed", [])) - set(keys)) | patch_failed)
    base["value"] = sum(base["queries"].values())
    # fixture builds from the patch run are appended, not replaced —
    # they are per-build ledger entries, not per-query medians.
    bf = base.setdefault("fixtures", {})
    for k, v in patch.get("fixtures", {}).items():
        bf[k] = bf.get(k, []) + v
    base["fixture_sec"] = base.get("fixture_sec", 0) + patch.get("fixture_sec", 0)
    base["patched"] = {"keys": keys, "note": note,
                       "patch_iters": patch.get("iters"),
                       "patch_heap_mb": patch.get("heap_mb")}
    dest = out or sys.argv[1]
    json.dump(base, open(dest, "w"))
    print(f"merged {len(keys)} keys into {dest}: "
          f"total {base['value']:.1f}s, failed={base['failed']}")

if __name__ == "__main__":
    main()
