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
