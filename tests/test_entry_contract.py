"""Driver-contract invariants: the bits the grading harness depends
on, pinned so refactors can't silently break them."""

import os
import re

import __spark_entry__ as entrymod


def test_oracle_keys_subset_of_queries():
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 50
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and s.strip() for s in os_.values())


def test_every_query_is_in_survey_inventory():
    """SURVEY.md §2 is the judged checklist — every registered operator
    must appear there (as `name`), and stay there."""
    survey = open(
        os.path.join(os.path.dirname(__file__), "..", "SURVEY.md")
    ).read()
    documented = set(re.findall(r"`([a-z0-9_]+)`", survey))
    missing = set(entrymod.queries()) - documented
    assert not missing, f"queries not documented in SURVEY.md §2: {sorted(missing)}"


def test_queries_return_fresh_dict():
    a = entrymod.queries()
    a["__mutated__"] = None
    assert "__mutated__" not in entrymod.queries()


def test_bench_headline_is_superset_of_last_round():
    """BENCH_r{N} keys must be ⊇ every earlier round's (the judge
    compares rounds key-by-key; silently dropping a benched query would
    hide a regression)."""
    import glob
    import json
    import os

    import bench

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # Keys demoted to the sf0.01 A/B section still count as benched.
    current = (
        set(bench.HEADLINE) | set(bench.SMALL_SF_AB) | {"streaming_pipeline_agg"}
    )
    for path in sorted(glob.glob(os.path.join(here, "BENCH_r*.json"))):
        with open(path) as f:
            recorded = set(json.load(f).get("queries", {}))
        missing = recorded - current
        assert not missing, f"{os.path.basename(path)} keys dropped: {missing}"


def test_bench_covers_whole_registry():
    """r6 verdict item 3: every registry key has a bench number or a
    named exclusion reason; exclusions must still exist in the registry
    (the key + oracle stay registered, only the bench slot moves)."""
    import bench

    from sql_flow_spark.operators import QUERIES

    assert set(bench.HEADLINE) | set(bench.EXCLUDED) == set(QUERIES)
    assert not set(bench.HEADLINE) & set(bench.EXCLUDED)
    for key, reason in bench.EXCLUDED.items():
        assert key in QUERIES, f"excluded key {key!r} not in registry"
        assert reason.strip(), f"excluded key {key!r} needs a reason"


def test_never_checked_keys_rotate_to_window_front():
    """The driver checks only the first 50 queries() keys; keys whose
    latest driver row FAILED must sort first (a fix needs its green
    row), then contract-changed keys, then operators without any prior
    CORRECTNESS row, so every fix, every re-masked contract, and every
    new operator gets a driver row next round."""
    import __spark_entry__ as m

    checked, failing, _ = m._driver_history()
    recorded = m._recorded_contracts()
    keys = list(m.queries())
    changed = {
        k
        for k in keys
        if k in checked
        and k not in failing
        and recorded.get(k) != m.contract_hash(k)
    }
    front = [k for k in keys if k in failing or k in changed or k not in checked]
    assert front == keys[: len(front)], (
        "failing/changed/never-checked keys are not at the front"
    )
    fail_keys = [k for k in keys if k in failing]
    assert fail_keys == keys[: len(fail_keys)], (
        "latest-FAIL keys must sort before contract-changed keys"
    )
    changed_keys = [k for k in keys if k in changed]
    assert changed_keys == keys[len(fail_keys) : len(fail_keys) + len(changed_keys)], (
        "contract-changed keys must sort directly after failing keys"
    )


def test_latest_fail_keys_in_window():
    """Regression guard for the r5→r6 hazard: corpus_report and
    mix_weights failed the r5 driver hash check; after the oracle fix
    they must re-enter the 50-key window to land a green row."""
    import __spark_entry__ as m

    _, failing, _ = m._driver_history()
    window = list(m.queries())[:50]
    for k in failing:
        assert k in window, f"latest-FAIL key {k!r} rotated out of the window"


def test_proven_keys_cycle_by_staleness():
    """R9 verdict item 2: with every key driver-checked and the
    registry frozen, registration-order tiers froze the window on the
    same 49 keys forever. Tiers 4/5 must instead sort previously-proven
    keys by last-checked round ASCENDING so all keys cycle through the
    50-key window every ~4 rounds."""
    import __spark_entry__ as m

    checked, failing, last_round = m._driver_history()
    recorded = m._recorded_contracts()
    keys = list(m.queries())
    proven = [
        k
        for k in keys
        if k in checked
        and k not in failing
        and recorded.get(k) == m.contract_hash(k)
    ]
    rounds = [last_round.get(k, 0) for k in proven]
    assert rounds == sorted(rounds), (
        "proven keys must sort oldest-driver-row first"
    )
    # rows-only keys share the proven tier (staleness governs; they
    # must not starve behind every oracle-backed key)
    stalest = proven[: len(proven) // 4]
    assert any(k not in m.ORACLES for k in stalest) or all(
        last_round.get(k, 0) >= min(rounds or [0]) for k in m.QUERIES
        if k not in m.ORACLES and k in proven
    )


def test_contract_change_reenters_window():
    """A key whose oracle text changes after its last driver row must
    sort into the re-check tier even though its last row was green
    (the r9 bm25 re-masking hazard), ahead of every previously-proven
    key."""
    import __spark_entry__ as m

    checked, failing, _ = m._driver_history()
    recorded = m._recorded_contracts()
    # pick a mid-registry proven key and simulate a contract edit by
    # stripping its recorded hash
    victim = next(
        k
        for k in m.QUERIES
        if k in checked
        and k not in failing
        and recorded.get(k) == m.contract_hash(k)
    )
    import unittest.mock as mock

    tampered = {k: v for k, v in recorded.items() if k != victim}
    with mock.patch.object(m, "_recorded_contracts", lambda: tampered):
        keys = m._ordered_keys()
    n_front = len(failing) + sum(
        1
        for k in m.QUERIES
        if (k in checked and k not in failing and recorded.get(k) != m.contract_hash(k))
        or k not in checked
    )
    assert keys.index(victim) <= n_front, (
        f"contract-changed {victim!r} did not re-enter the front tiers"
    )
