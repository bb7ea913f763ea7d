"""REGISTRY.md (the generated per-key reference page, r9 verdict item
5/r8 item 7) must stay in sync with the live @query registry: any new
key, docstring rewrite, or bench-slot move regenerates the page via
`python -m sql_flow_spark.cli docs`. Deterministic — derived only from
code, never from per-round driver output."""

import os


def test_registry_md_in_sync():
    from sql_flow_spark.docs import generate_registry_md

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "REGISTRY.md")
    assert os.path.exists(path), (
        "REGISTRY.md missing — run: python -m sql_flow_spark.cli docs"
    )
    with open(path) as f:
        committed = f.read()
    assert committed == generate_registry_md(), (
        "REGISTRY.md is stale — run: python -m sql_flow_spark.cli docs"
    )


def test_registry_md_covers_every_key():
    from sql_flow_spark.docs import generate_registry_md
    from sql_flow_spark.operators import QUERIES

    page = generate_registry_md()
    missing = [k for k in QUERIES if f"`{k}`" not in page]
    assert not missing, f"keys missing from REGISTRY.md: {missing}"
