"""Physical-plan audit: assert the plan Catalyst produced is the plan we
want at 100 TB — filters pushed to the scan, columns pruned, whole-stage
codegen on the hot path, broadcasts where expected.

The reference delegates all of this to DataFusion and never verifies it;
here it's a testable contract (tests/test_plans.py) so a regression that
silently un-pushes a filter or breaks codegen fails CI, not a cluster run.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def _formatted(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def plan_audit(df: DataFrame) -> dict:
    """Inspect the optimized physical plan. Returns:
    - pushed_filters:   list of filters reaching a file scan
    - read_schema_cols: columns actually read per scan (pruning evidence)
    - codegen_stages:   number of WholeStageCodegen spans
    - broadcast_joins / sortmerge_joins / shuffle_exchanges: counts
    - python_udf_nodes: ArrowEvalPython / BatchEvalPython node counts
      (BatchEval = row-at-a-time Python — should ALWAYS be zero here)
    """
    txt = _formatted(df)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", txt)
    read_schema = re.findall(r"ReadSchema: struct<([^>]*)>", txt)
    return {
        "pushed_filters": [p for p in pushed if p.strip()],
        "read_schema_cols": [
            [c.split(":")[0] for c in rs.split(",") if c] for rs in read_schema
        ],
        "codegen_stages": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", txt))),
        "broadcast_joins": len(re.findall(r"BroadcastHashJoin", txt)),
        "sortmerge_joins": len(re.findall(r"SortMergeJoin", txt)),
        "shuffle_exchanges": len(re.findall(r"\bExchange\b", txt)),
        "arrow_udf_nodes": len(re.findall(r"ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas|FlatMapCoGroupsInPandas", txt)),
        "rowwise_python_nodes": len(re.findall(r"BatchEvalPython", txt)),
        "plan": txt,
    }
