"""Physical-plan assertions — the scale properties as testable strings.

The engine's 100 TB viability rests on plan shapes Catalyst must keep
producing: term-predicate pushdown into the postings parquet scan,
column-pruned ReadSchemas, and broadcast joins for the small sides.
These helpers capture ``explain("formatted")`` so tests can regress on
them (tests/test_plans.py); ``tools/explain_plans.py`` prints the same
for eyeballing.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def assert_pushed_filter(df: DataFrame, fragment: str) -> str:
    plan = formatted_plan(df)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any(fragment in l for l in pushed), (
        f"expected pushed filter containing {fragment!r}; got {pushed}\n{plan}"
    )
    return plan


def assert_broadcast_join(df: DataFrame) -> str:
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    return plan
