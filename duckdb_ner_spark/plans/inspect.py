"""Plan introspection helpers (SURVEY.md C40) — the engine's EXPLAIN surface
plus assertions used by tests and perf reviews.

``plan_report`` extracts the facts that matter at 100 TB: whether filters
reached the parquet scan (PushedFilters), which columns are read
(ReadSchema), how many exchanges (shuffles) the plan contains, whether
joins broadcast, and the WholeStageCodegen span count.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def simple_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")


@dataclass
class PlanReport:
    n_exchanges: int
    n_broadcasts: int
    n_codegen_spans: int
    pushed_filters: list[str]
    read_schemas: list[str]
    has_python_udf: bool

    def summary(self) -> str:
        return (
            f"exchanges={self.n_exchanges} broadcasts={self.n_broadcasts} "
            f"codegen={self.n_codegen_spans} pushed={len(self.pushed_filters)} "
            f"python_udf={self.has_python_udf}"
        )


def global_windows(df: DataFrame) -> list[str]:
    """Every PARTITION-LESS Window node in the optimized logical plan —
    each one serializes its whole input through a single task, so any
    occurrence over an unbounded table is a scale bug (VERDICT r6 #4).

    Detection: a Window node prints ``Window [exprs], [partitionSpec],
    [orderSpec]``, OMITTING empty trailing specs — so a global ordered
    window shows two top-level bracket groups whose second is the ORDER
    spec (its entries carry ASC/DESC), while a partitioned-but-unordered
    window also shows two groups whose second is the bare partition
    column list. Returns the window expression text of each global node
    so tests can pin WHICH bounded table crosses one."""
    out = []
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    for line in plan.splitlines():
        stripped = line.lstrip(" +-:")
        if not stripped.startswith("Window ["):
            continue
        groups, depth = [], 0
        for ch in stripped[len("Window ") :]:
            if ch == "[":
                if depth == 0:
                    groups.append("")
                depth += 1
            elif ch == "]":
                depth -= 1
            elif depth >= 1:
                groups[-1] += ch
        if len(groups) >= 3:
            partition = groups[1]
        elif len(groups) == 2:
            g1 = groups[1]
            is_order = " ASC" in g1 or " DESC" in g1 or not g1.strip()
            partition = "" if is_order else g1
        else:
            partition = ""
        if not partition.strip():
            out.append(groups[0][:200])
    return out


def plan_report(df: DataFrame) -> PlanReport:
    plan = formatted_plan(df)
    simple = simple_plan(df)
    # formatted mode prints each node in the tree AND as a "(N) Node" detail
    # section — count only the numbered detail sections
    return PlanReport(
        n_exchanges=len(re.findall(r"\(\d+\) Exchange", plan)),
        n_broadcasts=len(re.findall(r"\(\d+\) Broadcast(Exchange|HashJoin|NestedLoopJoin)", plan)),
        # codegen span ids ( *(N) ... ) only appear in simple mode
        n_codegen_spans=len(set(re.findall(r"\*\((\d+)\)", simple))),
        pushed_filters=re.findall(r"PushedFilters: \[(.*?)\]", plan),
        read_schemas=re.findall(r"ReadSchema: (.*)", plan),
        has_python_udf="Python" in plan or "ArrowEvalPython" in plan,
    )
