"""Round-close gate-integrity check: every registry entry must have a
row in the driver's correctness record.

Round 6 exposed the failure mode this guards: the driver's
CORRECTNESS_r06.json held exactly 50 rows for a 51-entry registry —
codec_matrix (registered last) silently fell out of the hard
correctness signal while remaining healthy, so a future regression in
it would have been invisible. This tool makes that gap LOUD.

Usage:
    python tools/check_gate.py [CORRECTNESS_rNN.json]

With no argument, picks the newest CORRECTNESS_r*.json in the repo
root. Exit status: 0 = every queries() key has a record row and every
row matches; 1 = keys missing from the record, extra unknown keys, or
any non-green row; 2 = usage/load error.
"""

from __future__ import annotations

import glob
import json
import sys

sys.path.insert(0, ".")


def main() -> int:
    if len(sys.argv) > 1:
        path = sys.argv[1]
    else:
        candidates = sorted(glob.glob("CORRECTNESS_r*.json"))
        if not candidates:
            print("check_gate: no CORRECTNESS_r*.json found", file=sys.stderr)
            return 2
        path = candidates[-1]
    try:
        record = json.load(open(path))
    except (OSError, ValueError) as e:
        print(f"check_gate: cannot load {path}: {e}", file=sys.stderr)
        return 2

    import __spark_entry__ as entry

    keys = set(entry.queries())
    rows = set(record)
    missing = sorted(keys - rows)
    unknown = sorted(rows - keys)
    bad = sorted(
        name
        for name, r in record.items()
        if isinstance(r, dict)
        and (
            r.get("err") is not None
            or r.get("rows_match") is False
            or r.get("schema_match") is False
            or r.get("hash_match") is False
        )
    )

    print(f"check_gate: {path}: {len(rows)} rows vs {len(keys)} registry entries")
    ok = True
    if missing:
        ok = False
        print(
            f"GATE HOLE: {len(missing)} registry entries have NO row in the "
            f"driver record (a regression there would be invisible): {missing}"
        )
    if unknown:
        # renamed/merged entries leave stale rows behind in OLD records;
        # always informational (exit stays 0): the gate's job is "no
        # registry entry is unrecorded/red", and a stale extra row in
        # any record cannot hide a regression — it can only overstate
        # historical coverage, which the note surfaces
        print(f"note: {len(unknown)} record rows not in the live registry: {unknown}")
    if bad:
        ok = False
        print(f"RED ROWS: {len(bad)} entries not fully green: {bad}")
    if ok:
        print("gate OK: every registry entry recorded and green")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
