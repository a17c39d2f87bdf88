"""Benchmark harness: run the headline query set at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "headline_total", "value": <sec>, "unit": "sec",
     "queries": {"<name>": <sec>, ...}, "sf": <float>}

Each query is executed to completion (collect of a bounded result) so the
timing covers the full scan->shuffle->result path, not just plan
construction. A warmup pass runs EVERY headline query once untimed, so
the min-of-n numbers measure steady state rather than one-time
JVM/codegen/file-index startup.

Scale coverage: the container ships sf0.001 / sf0.01 / sf0.1 only, so the
largest recordable point is sf0.1 (set SPARK_GRAFT_SF_DIR to any of them).
The 0.001 -> 0.01 -> 0.1 series spans two orders of magnitude; headline
totals should scale sub-linearly in it (scans dominate; aggregates and
top-k stay small) — a super-linear jump between adjacent SFs is the
regression signal an sf1 run would otherwise give.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from fund_data_pipeline_spark import queries as Q  # noqa: E402
from fund_data_pipeline_spark.session import get_spark  # noqa: E402


def _merge_bench(spark, sf_dir: str, n_runs: int) -> list[float]:
    """Time the signature operator: a hash-guarded, partition-pruned merge of
    one month's modified batch into a month-partitioned price table built
    from lineitem. The build of the target is untimed; each timed section is
    exactly the daily-upsert path (prune -> full-outer merge -> rewrite only
    the touched partition). Every run merges a batch with a DIFFERENT price
    bump (pre-landed untimed) so each one rewrites the partition for real —
    re-merging an identical batch would hash-match everything and time the
    no-op path instead of the upsert."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from fund_data_pipeline_spark.hashing import row_hash_safe
    from fund_data_pipeline_spark.merge import merge_upsert

    def snapshot(df):
        # the engine's own collision-safe hash kernel, not a hand-rolled
        # concat (which would NULL-collapse fields)
        return df.withColumn("row_hash", row_hash_safe(["k1", "k2", "dt", "price"]))

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rows = li.select(
        F.col("l_orderkey").alias("k1"),
        F.col("l_linenumber").alias("k2"),
        F.date_format("l_shipdate", "yyyy-MM").alias("dt"),
        F.col("l_extendedprice").alias("price"),
    )
    root = tempfile.mkdtemp(prefix="bench_merge_")
    path = f"{root}/prices"
    try:
        merge_upsert(
            spark, path, snapshot(rows), keys=["k1", "k2", "dt"], partition_col="dt"
        )  # untimed target build
        # land each batch as a real file first (a daily batch arrives as
        # landed data, not a lazy recompute over the whole history)
        month = rows.filter(F.col("dt") == "1998-06")
        for i in range(n_runs):
            snapshot(month.withColumn("price", F.col("price") + float(i + 1))).write.parquet(
                f"{root}/batch{i}"
            )
        # untimed warmup merge: the target build above takes the CREATE
        # path (plain write, no full-outer join), so without this the
        # first timed run carries the merge-join plan's one-time codegen
        # and the emitted spread misreads as container jitter (review
        # r10; same rationale as the minhash warmup below). A distinct
        # price delta keeps every timed batch a real update.
        snapshot(month.withColumn("price", F.col("price") + 0.5)).write.parquet(
            f"{root}/batch_warm"
        )
        merge_upsert(
            spark,
            path,
            spark.read.parquet(f"{root}/batch_warm"),
            keys=["k1", "k2", "dt"],
            partition_col="dt",
        )
        runs: list[float] = []
        for i in range(n_runs):
            batch = spark.read.parquet(f"{root}/batch{i}")
            t0 = time.perf_counter()
            merge_upsert(spark, path, batch, keys=["k1", "k2", "dt"], partition_col="dt")
            runs.append(time.perf_counter() - t0)
        return runs
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _canary(n_runs: int = 3) -> dict[str, float]:
    """Fixed CPU-bound single-core numpy kernel (~0.2 s settled): the
    environment-interference witness (r14 verdict item 6). The machine's
    documented co-tenant spikes inflate EVERY query uniformly 1.3-5x
    (SCALING.md r13/r14: 4.4 -> 12.8 s on an unchanged tree); this kernel
    does constant work, so a before/after reading far above its settled
    band adjudicates a slow bench as environment from the artifact alone,
    no interleaved worktree A/B needed. Single-threaded on purpose: the
    spikes crater per-core throughput, which is what Spark's 32 executor
    threads feel."""
    import numpy as np

    a = np.arange(4_000_000, dtype=np.float64)
    runs = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        s = 0.0
        for _ in range(8):
            s += float(np.sin(a).sum())
        runs.append(time.perf_counter() - t0)
    runs.sort()
    return {
        "min": round(runs[0], 3),
        "median": round(statistics.median(runs), 3),
        "max": round(runs[-1], 3),
    }


def _loadavg() -> list[float]:
    try:
        with open("/proc/loadavg") as f:
            return [float(x) for x in f.read().split()[:3]]
    except OSError:  # non-Linux fallback: absent, not fake zeros
        return []


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf(\d+(?:\.\d+)?)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    load_before = _loadavg()
    canary_before = _canary()
    spark = get_spark("bench")

    names = [n for n, s in Q.QUERIES.items() if s.headline]
    # Warmup pass: run every headline query once untimed, so the numbers
    # measure steady-state execution (scan->shuffle->result), not one-time
    # JVM/codegen/file-index startup. Standard OLAP-bench methodology.
    # Failures are loud — a query broken at warmup must show up in stderr,
    # not surface later as a mystery timing.
    for name in names:
        try:
            Q.QUERIES[name].spark(spark, sf_dir).collect()
        except Exception as e:
            print(f"bench: warmup {name} failed: {e}", file=sys.stderr)

    # n=3 timed runs per query. The headline number stays min-of-n (steady-
    # state capability, comparable with earlier rounds' best-of-2); the full
    # per-query min/median/max distribution is emitted alongside so a round-
    # over-round delta is attributable from the artifact alone (plan change
    # moves the min; co-tenant noise widens the spread). This container
    # showed 1.5x jitter between identical runs (r2) and a uniform +27%
    # drift (r3) — without spread, those are indistinguishable from
    # regressions.
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))

    def _dist(runs: list[float]) -> tuple[float, dict[str, float]]:
        """min-of-n + spread, the one recording shape for every series."""
        runs = sorted(runs)
        return round(runs[0], 3), {
            "min": round(runs[0], 3),
            "median": round(statistics.median(runs), 3),
            "max": round(runs[-1], 3),
        }

    timings: dict[str, float] = {}
    stats: dict[str, dict[str, float]] = {}
    for name in names:
        runs: list[float] = []
        try:
            for _ in range(n_runs):
                t0 = time.perf_counter()
                df = Q.QUERIES[name].spark(spark, sf_dir)
                # Force full evaluation; results are small (aggregates/top-k).
                df.collect()
                runs.append(time.perf_counter() - t0)
            timings[name], stats[name] = _dist(runs)
        except Exception as e:  # a broken query should show up, not crash bench
            print(f"bench: {name} failed: {e}", file=sys.stderr)
            timings[name] = -1.0

    # signature write operator + LLM-dedup path, tracked separately:
    # headline_total stays the read-query sum so it is comparable
    # round-over-round. Same min-of-n + spread methodology as the headline
    # set (r7's single-sample aux made a 4.2->6.9s minhash swing
    # unadjudicable against this container's documented ~1.5x jitter).
    aux: dict[str, float] = {}
    aux_stats: dict[str, dict[str, float]] = {}

    def _record_aux(name: str, runs: list[float]) -> None:
        aux[name], aux_stats[name] = _dist(runs)

    try:
        _record_aux("merge_partition_pruned", _merge_bench(spark, sf_dir, n_runs))
    except Exception as e:
        print(f"bench: merge_partition_pruned failed: {e}", file=sys.stderr)
        aux["merge_partition_pruned"] = -1.0
    try:
        # fuzzy-dedup candidate generation through the skew-bounded band
        # join (shingle explode -> minhash signatures -> grid self-join).
        # One untimed warmup run so the numbers are steady-state execution,
        # not one-time codegen cost (measured: 12-21s cold vs ~5s warm for
        # this query's plan size).
        Q.QUERIES["minhash_lsh_candidates"].spark(spark, sf_dir).collect()
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            Q.QUERIES["minhash_lsh_candidates"].spark(spark, sf_dir).collect()
            runs.append(time.perf_counter() - t0)
        _record_aux("minhash_lsh_candidates", runs)
    except Exception as e:
        print(f"bench: minhash_lsh_candidates failed: {e}", file=sys.stderr)
        aux["minhash_lsh_candidates"] = -1.0

    # A failed query must not make the benchmark look faster: with any -1.0
    # sentinel present the headline total is reported as null (and the
    # failures named) instead of silently summing only the surviving queries.
    failed = sorted(n for n, t in timings.items() if t < 0)
    total = None if failed else round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "failed": failed,
                "unit": "sec",
                "queries": timings,
                "stats": stats,
                "runs": n_runs,
                "aux": aux,
                "aux_stats": aux_stats,
                "sf": sf,
                # environment adjudication (r14 verdict item 6): constant-
                # work canary + loadavg bracketing the run. The canary does
                # identical work every round, so its min is directly
                # comparable across BENCH_r*.json artifacts: a reading
                # >=1.3x the series' settled floor brands THIS artifact
                # environment-contended — read these BEFORE comparing
                # headline_total across rounds.
                "env": {
                    "canary_before": canary_before,
                    "canary_after": _canary(),
                    "loadavg_before": load_before,
                    "loadavg_after": _loadavg(),
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
