#!/usr/bin/env python3
"""Run the FULL `sbt test` suite and record the result as an artifact
roundgate can verify (VERDICT r16 task 1: round 16 shipped on 47/700
tests because the full suite was never run and nothing refused to close
the round without it).

Writes SBT_TEST.json:
  {"exit": 0, "src_hash": "...", "tests": "699", "suites": "43",
   "duration_sec": N, "when": "...", "log": "/tmp/sbt_test_r17.log"}

src_hash is a sha256 over (relative path, file sha256) of every file
under src/ plus build.sbt — the inputs that determine what `sbt test`
tests. Roundgate recomputes it: a record made before a source edit does
NOT count as having run the suite.

Usage:
  python3 tools/testgate.py [--log /tmp/sbt_test.log]
  python3 tools/testgate.py --hash-only    # print src_hash and exit
"""
import hashlib, json, os, re, subprocess, sys, time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def src_hash():
    h = hashlib.sha256()
    files = [os.path.join(REPO, "build.sbt")]
    for root, dirs, names in os.walk(os.path.join(REPO, "src")):
        dirs.sort()
        for n in sorted(names):
            files.append(os.path.join(root, n))
    for f in sorted(files):
        rel = os.path.relpath(f, REPO)
        h.update(rel.encode())
        with open(f, "rb") as fh:
            h.update(hashlib.sha256(fh.read()).digest())
    return h.hexdigest()


def main():
    log = "/tmp/sbt_test.log"
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--log":
            log = args.pop(0)
        elif a == "--hash-only":
            print(src_hash())
            return

    sh = src_hash()
    t0 = time.time()
    with open(log, "w") as lf:
        r = subprocess.run(["sbt", "test"], cwd=REPO, stdout=lf,
                           stderr=subprocess.STDOUT)
    dur = time.time() - t0
    tail = open(log).read()[-6000:]
    m = re.search(r"Tests: succeeded (\d+), failed (\d+)", tail)
    suites = re.search(r"Total number of tests run: (\d+)", tail)
    rec = {
        "exit": r.returncode,
        "src_hash": sh,
        "tests_succeeded": int(m.group(1)) if m else None,
        "tests_failed": int(m.group(2)) if m else None,
        "tests_run": int(suites.group(1)) if suites else None,
        "duration_sec": round(dur, 1),
        "when": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "log": log,
    }
    json.dump(rec, open(os.path.join(REPO, "SBT_TEST.json"), "w"), indent=1)
    print(json.dumps(rec))
    sys.exit(r.returncode)


if __name__ == "__main__":
    main()
