"""Boundary-margin audit as a gate (r8 verdict item 3): no oracle-
backed key may carry a floor/ceil whose argument is libm-derived and
sits within ULP_EPS ulps of the integer lattice at the driver's gate
scale (sf0.01) — the kaplan_meier r8 driver-FAIL class, caught before
the driver sees it. DuckDB-only (no Spark session), but a full oracle
sweep, so it lives in the full lane."""

import subprocess
import sys

import pytest


@pytest.mark.full
def test_margins_safe_at_gate_scale():
    proc = subprocess.run(
        [sys.executable, "scripts/margin_audit.py", "/root/testdata/sf0.01"],
        capture_output=True,
        text=True,
        timeout=900,
    )
    tail = "\n".join(proc.stdout.splitlines()[-25:])
    assert proc.returncode == 0, f"margin audit failed:\n{tail}\n{proc.stderr[-2000:]}"
    assert "ALL MARGINS SAFE" in proc.stdout
