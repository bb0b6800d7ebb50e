#!/usr/bin/env python3
"""SURVEY §2 hygiene check: the backtick-quoted keys in the §2 table
must equal SparkEntry's registry exactly, and the spec-only row count
must match what §6.x prose claims.

Registry keys come from a Verify dump dir (one subdir per query, the
same artifact crosscheck compares), default /tmp/graft_verify.

Exit 0 iff zero drift. Prints the three numbers the SURVEY prose must
agree with: total §2 rows, driver-checked keys, spec-only rows.
"""
import json, os, re, sys

SURVEY = os.path.join(os.path.dirname(__file__), "..", "SURVEY.md")
DUMP = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_verify"

rows = []          # all §2 numbered table rows
keys = []          # backtick-quoted query keys among them
spec_rows = []     # rows whose oracle column is "spec"
in_s2 = False
for line in open(SURVEY):
    if line.startswith("## "):
        in_s2 = line.startswith("## §2")
        continue
    if not in_s2:
        continue
    m = re.match(r"\|\s*(\d+)\s*\|\s*(.+?)\s*\|", line)
    if not m:
        continue
    rows.append(int(m.group(1)))
    cells = [c.strip() for c in line.strip().strip("|").split("|")]
    key = re.match(r"`([a-z0-9_]+)`$", cells[1])
    if cells[-1] == "spec":
        spec_rows.append(cells[1])
    if key:
        keys.append(key.group(1))

dump_keys = sorted(d for d in os.listdir(DUMP)
                   if os.path.isdir(os.path.join(DUMP, d)))
oracle = json.load(open(os.path.join(DUMP, "oracle_sql.json")))

dup = sorted({r for r in rows if rows.count(r) > 1})
missing = sorted(set(dump_keys) - set(keys))
stale = sorted(set(keys) - set(dump_keys))
print(f"§2 rows: {len(rows)} (numbered {min(rows)}..{max(rows)}"
      + (f", DUPLICATE #s {dup}" if dup else "") + ")")
print(f"driver-checked keys: survey {len(keys)}, dump {len(dump_keys)}, "
      f"oracles {len(oracle)}")
print(f"spec-only rows: {len(spec_rows)}")
ok = True
if missing:
    ok = False
    print(f"DRIFT: in registry dump but not SURVEY §2: {missing}")
if stale:
    ok = False
    print(f"DRIFT: in SURVEY §2 but not registry dump: {stale}")
no_oracle = sorted(set(dump_keys) - set(oracle))
if no_oracle:
    print(f"note: dump keys without SQL oracle (rows-only): {no_oracle}")
sys.exit(0 if ok else 1)
