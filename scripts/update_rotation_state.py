"""Refresh rotation_contracts.json from the latest CORRECTNESS round.

Run at ROUND START, right after the driver's new CORRECTNESS_r{N}.json
is committed and BEFORE editing any oracle: every key the driver just
checked gets its current contract_hash recorded as "validated by a
driver row". Keys not in the latest round keep their previous record
(or stay absent). __spark_entry__._ordered_keys sorts keys whose
current hash differs from the record into the re-check tier, so a
contract edit (re-masking, schema change) automatically re-enters the
driver window — the r9 static-rotation hazard (VERDICT r9 item 2).

Usage: python scripts/update_rotation_state.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402


def main() -> None:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = sorted(
        glob.glob(os.path.join(here, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )
    if not rounds:
        print("no CORRECTNESS files; nothing to record")
        return
    latest = rounds[-1]
    with open(latest) as f:
        checked = set(json.load(f))
    path = os.path.join(here, "rotation_contracts.json")
    try:
        with open(path) as f:
            state = json.load(f)
    except Exception:
        state = {}
    updated = 0
    for k in checked:
        if k not in entry.QUERIES:
            continue
        h = entry.contract_hash(k)
        if state.get(k) != h:
            state[k] = h
            updated += 1
    # Drop keys that left the registry.
    state = {k: v for k, v in state.items() if k in entry.QUERIES}
    with open(path, "w") as f:
        json.dump(dict(sorted(state.items())), f, indent=1)
        f.write("\n")
    print(
        f"recorded {os.path.basename(latest)}: {len(checked)} checked keys,"
        f" {updated} hashes updated, {len(state)} total"
    )


if __name__ == "__main__":
    main()
