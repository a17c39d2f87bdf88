"""Benchmark harness: run the headline query set at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "headline_total", "value": <sec>, "unit": "sec",
     "queries": {"<name>": <sec>, ...}, "sf": <float>}

Each query is executed to completion (count + collect of a bounded result)
so the timing covers the full scan->shuffle->result path, not just plan
construction. A warmup run of the smallest query amortizes JVM/codegen
startup out of the numbers.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from fund_data_pipeline_spark import queries as Q  # noqa: E402
from fund_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("bench")

    names = [n for n, s in Q.QUERIES.items() if s.headline]
    # Warmup pass: run every headline query once untimed, so the numbers
    # measure steady-state execution (scan->shuffle->result), not one-time
    # JVM/codegen/file-index startup. Standard OLAP-bench methodology.
    for name in names:
        try:
            Q.QUERIES[name].spark(spark, sf_dir).collect()
        except Exception:
            pass

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        try:
            df = Q.QUERIES[name].spark(spark, sf_dir)
            # Force full evaluation; results are small (aggregates/top-k).
            df.collect()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # a broken query should show up, not crash bench
            print(f"bench: {name} failed: {e}", file=sys.stderr)
            timings[name] = -1.0

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(json.dumps({"metric": "headline_total", "value": total, "unit": "sec", "queries": timings, "sf": sf}))
    spark.stop()


if __name__ == "__main__":
    main()
