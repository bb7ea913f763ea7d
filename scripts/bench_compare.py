"""Compare two bench_out.json payloads key-by-key — the r8 bench
trustworthiness gate: two consecutive full runs should agree within
25% on every key slower than 1s (VERDICT r7 item 1's done criterion).

Usage: python scripts/bench_compare.py runA.json runB.json [--gate 0.25]
Prints offenders and a summary line; exit code 1 if any key >1s
disagrees past the gate.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    gate = 0.25
    if "--gate" in sys.argv:
        gate = float(sys.argv[sys.argv.index("--gate") + 1])
    a = json.load(open(args[0]))["queries"]
    b = json.load(open(args[1]))["queries"]
    common = sorted(set(a) & set(b))
    offenders = []
    for k in common:
        lo, hi = sorted((a[k], b[k]))
        if hi <= 1.0:
            continue  # sub-second keys: absolute noise floor dominates
        rel = (hi - lo) / max(lo, 1e-9)
        if rel > gate:
            offenders.append((k, a[k], b[k], round(rel, 2)))
    for k, va, vb, rel in sorted(offenders, key=lambda t: -t[3]):
        print(f"DISAGREE {k}: {va}s vs {vb}s  ({rel:.0%})")
    n_gt1 = sum(1 for k in common if max(a[k], b[k]) > 1.0)
    print(
        f"{len(common)} common keys, {n_gt1} over 1s, "
        f"{len(offenders)} disagree past {gate:.0%}"
    )
    return 1 if offenders else 0


if __name__ == "__main__":
    raise SystemExit(main())
