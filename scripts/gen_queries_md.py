"""Regenerate QUERIES.md from the live catalog registry.

Run from the repo root: ``python scripts/gen_queries_md.py``. Keeps the
checked-in catalog reference in sync with the code -- the registry is the
single source of truth, this file just renders it.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from taxi_data_pipeline_pset2_spark.queries import registry  # noqa: E402


def main() -> None:
    reg = registry()
    lines = [
        "# QUERIES — the driver-facing catalog",
        "",
        "Auto-generated from `taxi_data_pipeline_pset2_spark/queries` "
        "(one entry per implemented operator, SURVEY.md §2). Each entry "
        "pairs the Spark implementation with the DuckDB oracle SQL the "
        "driver hash-compares it against at sf=0.01; `rows-only` entries "
        "are the non-SQL-expressible ops (pinned in pytest instead).",
        "",
        f"Total: **{len(reg)}** entries, "
        f"{sum(1 for e in reg.values() if e.oracle)} with oracle SQL.",
        "",
    ]
    for name, e in reg.items():
        tags = ", ".join(e.tags) if e.tags else "-"
        lines += [f"## `{name}`", "", f"*tags: {tags}*", ""]
        doc = (e.doc or "").strip()
        if doc:
            lines += [doc, ""]
        if e.oracle:
            lines += ["```sql", e.oracle.strip(), "```"]
        else:
            lines.append(
                "*rows-only (non-SQL-expressible); semantics pinned in pytest.*"
            )
        lines.append("")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUERIES.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {len(reg)} entries to {out}")


if __name__ == "__main__":
    main()
