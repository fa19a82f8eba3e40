#!/usr/bin/env python3
"""Diff two VERIFY_SELF.json fingerprints (or the working one against
the last committed version) and report result drift per query.

VERIFY_SELF.json exists so correctness trends survive driver-side
artifact loss (the round-9 failure mode: a regenerated events.parquet
zeroed 45 queries with no committed trace). This differ makes the
fingerprint actionable: run it after any change that should NOT move
results — a refactor, a plan-level optimization, a dependency-free
cleanup — and anything but an intentional surface change shows up as
ADDED / REMOVED / ROWS / SCHEMA / VALUES lines.

Usage:
  python3 tools/verify_diff.py                 # HEAD's committed vs working tree
  python3 tools/verify_diff.py OLD.json NEW.json
Exit code: 0 = no drift (additions are reported but not drift), 1 = drift.
"""
import json
import subprocess
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    if len(sys.argv) == 3:
        old, new = load(sys.argv[1]), load(sys.argv[2])
        old_name, new_name = sys.argv[1], sys.argv[2]
    else:
        blob = subprocess.run(
            ["git", "show", "HEAD:VERIFY_SELF.json"],
            capture_output=True, text=True, check=True).stdout
        old, new = json.loads(blob), load("VERIFY_SELF.json")
        old_name, new_name = "HEAD:VERIFY_SELF.json", "VERIFY_SELF.json"

    oq, nq = old.get("queries", old), new.get("queries", new)
    drift = False
    for name in sorted(set(oq) | set(nq)):
        if name not in oq:
            print(f"ADDED   {name}")
            continue
        if name not in nq:
            print(f"REMOVED {name}")
            drift = True
            continue
        a, b = oq[name], nq[name]
        for field, label in (("rows", "ROWS"), ("cols", "SCHEMA"),
                             ("hash", "VALUES")):
            if a.get(field) != b.get(field):
                # rows-only queries (oracle: false) carry sketch/model
                # randomness — KLL compaction is rank-randomized per
                # run — so their VALUE drift is informational; their
                # row counts and schemas must still hold
                info = field == "hash" and not b.get("oracle", True)
                tag = f"{label}?" if info else label
                print(f"{tag:7s} {name}: {a.get(field)} -> {b.get(field)}")
                if not info:
                    drift = True
    if not drift:
        print(f"no drift: {new_name} matches {old_name} "
              f"({len(nq)} queries)")
    sys.exit(1 if drift else 0)


if __name__ == "__main__":
    main()
