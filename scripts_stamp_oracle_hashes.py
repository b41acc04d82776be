"""Stamp ORACLE_HASHES.json from the latest driver CORRECTNESS file.

Run this as the FIRST action of a round — after the driver commits
CORRECTNESS_r{N}.json and BEFORE any oracle edits — so the current
registry oracle text is byte-identical to what the driver verified.

Only rows in the NEWEST CORRECTNESS file are stamped — the driver ran
that round against the current oracle text, so a clean row certifies
the current hash. Older rows certified OLDER text; their sidecar
entries are left untouched (overwriting them with the current hash
would silently erase an oracle-changed-since-green flag). For each
clean row in the newest file:
  - hash-checked row (err is None)   -> stamp sha256(current oracle)
  - rows-only row (err == no_oracle) -> stamp null IF the registry
    still has no oracle for it; otherwise keep the prior entry so the
    query stays flagged until the driver hash-checks the new oracle.

__spark_entry__._driver_verified treats any query whose current oracle
hash differs from its stamped hash as never-verified, forcing it to
the front of the driver rotation. This makes "oracle edited after its
green row" (the round-8 verdict's stale-verification class — 17 cases
found by round-snapshot archaeology) structurally impossible to hide.
The clean-row predicate and the hash computation are IMPORTED from
__spark_entry__ so stamping and verification can never drift apart.
"""
import glob
import json
import os
import sys

here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, here)

from __spark_entry__ import REGISTRY, _oracle_hash, _row_clean

paths = sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json")))
if not paths:
    raise SystemExit("no CORRECTNESS_r*.json found — nothing to stamp")
newest = paths[-1]
print(f"stamping from {os.path.basename(newest)}")
latest: dict[str, tuple[bool, object]] = {}
for name, row in json.load(open(newest)).items():
    if not isinstance(row, dict):
        continue
    latest[name] = (_row_clean(row), row.get("err"))

sidecar_path = os.path.join(here, "ORACLE_HASHES.json")
try:
    side = json.load(open(sidecar_path))
except (OSError, ValueError):
    side = {}

changed = 0
for name, (clean, err) in sorted(latest.items()):
    if not clean or name not in REGISTRY:
        continue
    has_oracle = REGISTRY[name].oracle is not None
    if err is None:
        new = _oracle_hash(name)
    elif not has_oracle:  # rows-only row, still oracle-less: covered
        new = None
    else:  # rows-only row but an oracle exists now: keep it flagged
        continue
    if side.get(name, "<absent>") != new:
        changed += 1
    side[name] = new

# prune entries whose query left the registry: _driver_verified guards
# with `name in REGISTRY` so they were harmless, but the sidecar would
# accrete dead names forever (r9 ADVICE)
dead = [name for name in side if name not in REGISTRY]
for name in dead:
    del side[name]

json.dump(side, open(sidecar_path, "w"), indent=0, sort_keys=True)
print(
    f"stamped {len(side)} entries ({changed} changed, {len(dead)} pruned)"
)
