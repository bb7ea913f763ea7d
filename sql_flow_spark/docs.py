"""Registry documentation generator (`cli docs` → REGISTRY.md).

The 197-key `@query` registry outgrew SURVEY.md §2's hand-written
tables (the r8/r9 reviews had to reconstruct the inventory by script).
This module generates a deterministic per-key reference page straight
from the live registry: key, one-line contract (docstring first
sentence), file:line, scale shape (the docstring's "Scale shape:"
paragraph when present), correctness mode (DuckDB oracle vs rows-only)
and bench slot (headline / named exclusion). Everything is derived
from code, so tests/test_registry_docs.py can pin REGISTRY.md ==
generate_registry_md() without depending on per-round driver output.
"""

from __future__ import annotations

import inspect
import os
import re

_HEADER = """# Operator registry

GENERATED — do not edit by hand. Regenerate with:

    python -m sql_flow_spark.cli docs

One row per `@query` key (the driver-checked operator inventory;
SURVEY.md §2 stays the judged narrative checklist, this page is the
per-key reference). "oracle" keys are hash-checked against the DuckDB
SQL committed next to the builder; "rows-only" keys are
non-SQL-expressible (sketches, LSH permutations, iterative folds) and
carry semantic pins in tests/test_approx_quality.py instead.
"""


def _first_sentence(doc: str | None, limit: int = 220) -> str:
    if not doc:
        return "(no docstring)"
    text = " ".join(doc.strip().split())
    # first sentence = up to the first period followed by a space/EOL
    m = re.search(r"\.(?:\s|$)", text)
    s = text[: m.end()].strip() if m else text
    if len(s) > limit:
        s = s[: limit - 1].rstrip() + "…"
    return s.replace("|", "\\|")


def _scale_shape(doc: str | None, limit: int = 220) -> str:
    if not doc:
        return "—"
    m = re.search(
        r"Scale shape:\s*(.*?)(?:\n\s*\n|$)", doc, re.DOTALL | re.IGNORECASE
    )
    if not m:
        return "—"
    text = " ".join(m.group(1).split())
    if len(text) > limit:
        text = text[: limit - 1].rstrip() + "…"
    return text.replace("|", "\\|")


def _location(fn) -> str:
    try:
        path = inspect.getsourcefile(fn)
        line = inspect.getsourcelines(fn)[1]
    except (OSError, TypeError):
        return "?"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rel = os.path.relpath(path, root)
    return f"{rel}:{line}"


def generate_registry_md() -> str:
    # Imported here so `import sql_flow_spark.docs` stays cheap.
    import bench
    from sql_flow_spark.operators import ORACLES, QUERIES

    by_module: dict[str, list[str]] = {}
    for key, fn in QUERIES.items():
        mod = _location(fn).split(":")[0]
        by_module.setdefault(mod, []).append(key)

    lines = [_HEADER]
    total = len(QUERIES)
    n_oracle = sum(1 for k in QUERIES if k in ORACLES)
    lines.append(
        f"**{total} keys** — {n_oracle} oracle-backed, "
        f"{total - n_oracle} rows-only; bench: {len(bench.HEADLINE)} "
        f"headline, {len(bench.EXCLUDED)} named exclusions "
        f"(sf0.01 A/B slots).\n"
    )
    for mod in sorted(by_module):
        keys = by_module[mod]
        lines.append(f"\n## {mod} — {len(keys)} keys\n")
        lines.append("| key | contract | check | bench | scale shape |")
        lines.append("|---|---|---|---|---|")
        for key in keys:  # registration order within the module
            fn = QUERIES[key]
            doc = inspect.getdoc(fn)
            check = "oracle" if key in ORACLES else "rows-only"
            if key in bench.EXCLUDED:
                slot = "sf0.01 A/B"
            else:
                slot = "headline"
            loc = _location(fn)
            lines.append(
                f"| `{key}` ({loc.split('/')[-1]}) "
                f"| {_first_sentence(doc)} "
                f"| {check} | {slot} | {_scale_shape(doc)} |"
            )
    lines.append("")
    excl = [
        f"- `{k}` — {v}" for k, v in sorted(bench.EXCLUDED.items())
    ]
    lines.append("\n## Bench exclusions (full reasons)\n")
    lines.extend(excl)
    lines.append("")
    return "\n".join(lines)


def write_registry_md(path: str | None = None) -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = path or os.path.join(root, "REGISTRY.md")
    content = generate_registry_md()
    with open(path, "w") as f:
        f.write(content)
    return path
