"""Dump .explain("formatted") for catalog queries + a plan-shape summary.

Usage:
    python scripts/dump_plans.py OUTDIR [SF_DIR] [name ...]

Writes OUTDIR/<name>.txt per query and prints one summary line per query:
exchanges, joins by strategy, python-eval nodes, scans without pushed
filters. Used to produce the plans/r16/ evidence files and to sweep the
whole catalog for plan smells (guide §1: measure first, read the plan).

Plan capture only *plans* the query, but building some catalog DataFrames
executes bounded prework by design (localCheckpoint pins, stream drains,
codebook collects); run at a small SF.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fund_data_pipeline_spark import queries as Q  # noqa: E402
from fund_data_pipeline_spark.session import get_spark  # noqa: E402


def explain_formatted(df) -> str:
    sess = df.sparkSession
    return sess._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
        df._jdf.queryExecution(), "formatted"
    )


_JOINS = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)
_PY = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "PythonMapInArrow",
    "FlatMapGroupsInPandas",
    "FlatMapCoGroupsInPandas",
)


def summarize(plan: str) -> str:
    # operator headers look like "(3) Exchange" / "(7) SortMergeJoin ..."
    ops = re.findall(r"^\(\d+\)\s+(\S+)", plan, flags=re.M)
    n_ex = sum(1 for o in ops if o.startswith("Exchange"))
    joins = [o for o in ops if any(j in o for j in _JOINS)]
    pynodes = [o for o in ops if any(p in o for p in _PY)]
    scans = plan.count("Scan parquet")
    nopush = len(re.findall(r"PushedFilters: \[\]", plan))
    sort_global = sum(1 for i, o in enumerate(ops) if o == "Sort")
    return (
        f"exchanges={n_ex} scans={scans} scans_nofilter={nopush} "
        f"joins={','.join(joins) or '-'} py={','.join(pynodes) or '-'} sorts={sort_global}"
    )


def main() -> None:
    outdir = Path(sys.argv[1])
    outdir.mkdir(parents=True, exist_ok=True)
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    names = sys.argv[3:] or list(Q.QUERIES)
    spark = get_spark("dump_plans")
    for name in names:
        spec = Q.QUERIES.get(name)
        if spec is None:
            print(f"{name}: UNKNOWN", flush=True)
            continue
        try:
            df = spec.spark(spark, sf_dir)
            plan = explain_formatted(df)
            (outdir / f"{name}.txt").write_text(plan)
            print(f"{name}: {summarize(plan)}", flush=True)
        except Exception as e:  # noqa: BLE001 — sweep must report, not die
            print(f"{name}: ERROR {type(e).__name__}: {e}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
