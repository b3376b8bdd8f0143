"""Physical-plan introspection shared by the BENCH/PLANS.md generator
(tools/plan_audit.py) and the plan-shape regression tests
(tests/test_plan_shapes.py). The tests turn the audit artifact's claims —
exchange counts, join strategies, scan pruning — into ENFORCED
invariants: a change that adds a shuffle to a headline query fails the
suite instead of silently updating a Markdown file.
"""

from __future__ import annotations

import contextlib
import io
import re


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def condense(plan: str) -> dict:
    """Scan schemas / pushed filters, exchange count, join strategies, and
    Python (Arrow) stage count from a formatted plan string."""
    scans = []
    for m in re.finditer(r"\(\d+\) Scan parquet ?(\S*)\n((?:.+\n)+?)\n", plan):
        block = m.group(2)
        entry = {"table": m.group(1) or "(path)"}
        for key in ("ReadSchema", "PushedFilters", "Location"):
            km = re.search(rf"{key}: (.+)", block)
            if km:
                v = km.group(1)
                if key == "Location":
                    v = v.split("/")[-1].rstrip("]")
                entry[key] = v[:160]
        scans.append(entry)
    joins = re.findall(
        r"\(\d+\) (BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)", plan)
    return {
        "scans": scans,
        "exchanges": len(re.findall(r"\(\d+\) Exchange", plan)),
        # NB: codegen-span ids are not rendered in AQE's pre-execution
        # formatted plan, so they are deliberately NOT reported here —
        # "0 spans" would be misleading; python_stages counts the
        # operators that are genuinely outside codegen by construction
        "joins": joins,
        "python_stages": len(re.findall(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", plan)),
    }


def shape(df) -> dict:
    """Condensed plan shape of a DataFrame (the unit the tests pin)."""
    return condense(formatted_plan(df))
