"""Scaling-curve harness: the headline query set timed at every available
scale factor, in one Spark session.

The container ships sf0.001 / sf0.01 / sf0.1 — two orders of magnitude.
`bench.py` records the single-SF headline number the driver tracks; this
script records how that number MOVES with data size, which is the signal an
sf1/sf100 run would give: scans dominate a well-planned query set, so
headline totals should grow clearly sub-linearly in SF (fixed per-job
overhead + parallel scan). A query whose time grows ~linearly-or-worse in
SF here has a term that will dominate at 100 TB (per-row Python, driver
collects, quadratic joins) and is a regression signal even while the
absolute numbers stay small.

Prints one JSON line PER COMPLETED (query, SF) point as the sweep runs —
    {"metric": "scaling_point", "query": name, "sf": sf, "sec": best|null}
— flushed immediately, so a time-boxed kill keeps every measurement taken
(the r12 3-hour sf10 chain sweep lost all of its in-memory results to the
old print-once-at-the-end shape). The final summary line is still last:
    {"metric": "headline_scaling", "sfs": [...],
     "totals": {sf: sec}, "queries": {name: {sf: sec}},
     "exponents": {name: p}}   # t ~ SF^p between smallest and largest SF

Method matches bench.py: per-query warmup run, then min-of-n timed runs.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from fund_data_pipeline_spark import queries as Q  # noqa: E402
from fund_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIRS = {
    0.001: "/root/testdata/sf0.001",
    0.01: "/root/testdata/sf0.01",
    0.1: "/root/testdata/sf0.1",
    # third decade: locally generated (scripts/gen_sf1.py — key-remapped
    # 10x sf0.1 with shingle-safe document copies); skipped if absent
    1.0: str(Path(__file__).resolve().parents[1] / ".localdata" / "sf1"),
    # fourth decade (r12): scripts/gen_sf10.py — 100x sf0.1, distinct
    # per-length permutation tables so even 10-token documents cannot
    # collide across the 99 copies; skipped if absent
    10.0: str(Path(__file__).resolve().parents[1] / ".localdata" / "sf10"),
}


#: heaviest non-headline catalog queries: their growth exponents are the
#: evidence their docstrings' scale claims rest on (calendar_gap_fill is
#: linear in customers x avg-span by construction; minhash re-reads its
#: localCheckpoint). Timed and reported per-query, NOT summed into the
#: headline totals (those stay comparable round-over-round).
EXTRA_QUERIES = [
    "calendar_gap_fill",
    "minhash_lsh_candidates",
    # late-r9 additions with non-trivial shuffles: span dedup shuffles one
    # row per 15-token window on md5(span); quantization posexplodes for
    # the 64-group per-dim stats then rescans with the broadcast row
    "duplicated_span_dedup",
    "embedding_int8_quantization",
    # r10: the BPE merge loop — after the one corpus-sized word count,
    # every round is vocabulary-sized, so its exponent should collapse
    # toward the scan term as SF grows (vocabulary saturates)
    "bpe_train_merges",
    # r11: the LM-quality capstone — BPE train + encode + bigram LM +
    # per-doc scoring + percentile gate. Corpus-sized terms: the word
    # count and the per-doc word-tf shuffle; everything else is
    # vocabulary-sized, so its exponent should sit near bpe_train's
    # plus a small linear scoring term
    "bigram_lm_quality_gate",
    # r13: the capped gap fill became a registered catalog query
    # (gap_fill_locf_capped); it replaces the ad-hoc EXTRA_FNS twin
    # measured through r12 under the name gap_fill_locf_capped_90d —
    # same kernel, plus the n_gap_days agg column. Its exponent should
    # stay near the r12 measurement (p=0.76, scan-linear with the
    # 90-day bound keeping the spine proportional to keys, not history)
    "gap_fill_locf_capped",
]


def _counted(name):
    """Heavy-chain timing wrapper (r12): executes the full catalog chain but
    reduces the result to one COUNT row. The chains' cost is the upstream
    shuffles/joins (signature build, band join, hamming/cosine filters),
    all of which a count still executes; what it skips is materializing a
    10^8-row pair relation onto the driver — at sf10 simhash emits ~10^8
    candidate pairs, and collect() would time driver deserialization (and
    OOM), not the engine."""

    def fn(spark, sf_dir):
        from pyspark.sql import functions as F

        return Q.QUERIES[name].spark(spark, sf_dir).agg(F.count(F.lit(1)).alias("n"))

    return fn


#: non-catalog extras timed alongside EXTRA_QUERIES: name -> (spark, sf_dir)
EXTRA_FNS: dict = {}  # r13: the capped gap fill graduated to the catalog (EXTRA_QUERIES)

#: opt-in heavies, NOT part of the default grid (they would triple its
#: wall-clock): the heavy dedup chains plus the two corpus-sized production
#: forms, count-shaped (see _counted). Run via
#: SPARK_GRAFT_SCALING_ONLY=...,SPARK_GRAFT_SCALING_SFS=... in a dedicated
#: invocation. The _scaled timers measured the production forms as ad-hoc
#: functions at r13 (SCALING.md: semantic p=0.24, simhash pairs x8.6 fewer
#: at sf10-wide); both graduated to oracle-paired catalog rows
#: (semantic_dedup_scaled r14, simhash_wide_pairs r13), so the timers now
#: point at the REGISTERED query forms — same kernels, and the timer names
#: stay stable so the curve history remains comparable round-over-round.
HEAVY_FNS = {
    "corpus_dedup_pipeline_n": _counted("corpus_dedup_pipeline"),
    "simhash_near_dup_n": _counted("simhash_near_dup"),
    "semantic_dedup_cells_n": _counted("semantic_dedup_cells"),
    "semantic_dedup_scaled_n": _counted("semantic_dedup_scaled"),
    "simhash_scaled_n": _counted("simhash_wide_pairs"),
    # count-shaped twin of the EXTRA_QUERIES entry, for the wide-fixture
    # decades where collecting the per-customer spine would time driver
    # deserialization instead of the engine (r13 verdict item 6)
    "gap_fill_locf_capped_n": _counted("gap_fill_locf_capped"),
}


def main() -> None:
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    spark = get_spark("bench_scaling")
    # SPARK_GRAFT_SCALING_MPB: opt-in scan-split cap (bytes). The local
    # fixtures are single parquet files small enough that Spark's
    # bytes-per-core split heuristic yields FEWER splits than cores at
    # every SF (r13: sf1wide scanned as 2 splits, sf10wide as 15 on 32
    # cores), so scan-bound stages run parallelism-starved and cross-SF
    # exponents confound data growth with utilization. A 100 TB table has
    # thousands of splits and no such regime. Default unchanged — the
    # knob exists for targeted fair-parallelism sweeps; numbers taken
    # with it are marked as such in SCALING.md.
    mpb = os.environ.get("SPARK_GRAFT_SCALING_MPB")
    if mpb:
        spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
    headline = [n for n, s in Q.QUERIES.items() if s.headline]
    missing = [n for n in EXTRA_QUERIES if n not in Q.QUERIES]
    if missing:
        # a renamed extra must fail loudly — its growth exponent is the
        # evidence its docstring's scale claims rest on (review r10)
        print(f"bench_scaling: EXTRA_QUERIES not registered: {missing}", file=sys.stderr)
    names = headline + [n for n in EXTRA_QUERIES if n in Q.QUERIES] + list(EXTRA_FNS)
    # subset hooks for targeted sweeps (r12: the heavy dedup chains are
    # timed at the big SFs in their own single-run invocation instead of
    # tripling the full-grid wall-clock):
    #   SPARK_GRAFT_SCALING_ONLY=q1,q2  — time only these catalog queries
    #   SPARK_GRAFT_SCALING_SFS=1.0,10.0 — restrict the SF grid
    only = os.environ.get("SPARK_GRAFT_SCALING_ONLY")
    if only:
        names = [n.strip() for n in only.split(",") if n.strip()]
        unknown = [
            n
            for n in names
            if n not in Q.QUERIES and n not in EXTRA_FNS and n not in HEAVY_FNS
        ]
        if unknown:
            print(f"bench_scaling: unknown ONLY queries: {unknown}", file=sys.stderr)
            sys.exit(2)
        headline = [n for n in names if n in headline]

    def plan(name, sf_dir):
        fn = EXTRA_FNS.get(name) or HEAVY_FNS.get(name)
        return fn(spark, sf_dir) if fn else Q.QUERIES[name].spark(spark, sf_dir)

    # an sf enters only with the COMPLETE table set: a dir left behind by
    # an interrupted gen_sf1 run must not contribute skewed partial totals
    from fund_data_pipeline_spark.oracle import TABLES as expected  # one list, three consumers (review r10)
    # SPARK_GRAFT_SCALING_DIRS="sf=dir[,sf=dir...]" replaces the default SF
    # grid — used to sweep ALTERNATIVE fixtures at a known SF (r13: the
    # wide-regime sf10 chain fixture, scripts/gen_sf10_wide.py)
    sf_dirs = dict(SF_DIRS)
    dirs_override = os.environ.get("SPARK_GRAFT_SCALING_DIRS")
    if dirs_override:
        sf_dirs = {}
        for entry in (e for e in dirs_override.split(",") if e.strip()):
            sf, sep, d = entry.partition("=")
            # a malformed entry must fail LOUDLY and name itself — without
            # '=' the dir is '' and the complete-table-set gate below would
            # silently drop the point (ADVICE r13)
            if not sep or not sf.strip() or not d.strip():
                raise SystemExit(
                    f"bench_scaling: malformed SPARK_GRAFT_SCALING_DIRS entry "
                    f"{entry!r} (expected sf=dir)"
                )
            try:
                sf_dirs[float(sf)] = d
            except ValueError:
                raise SystemExit(
                    f"bench_scaling: non-numeric sf in SPARK_GRAFT_SCALING_DIRS "
                    f"entry {entry!r}"
                ) from None
    sfs = [
        sf
        for sf, d in sorted(sf_dirs.items())
        if all((Path(d) / f"{t}.parquet").exists() for t in expected)
    ]
    sf_filter = os.environ.get("SPARK_GRAFT_SCALING_SFS")
    if sf_filter:
        wanted = {float(x) for x in sf_filter.split(",") if x.strip()}
        sfs = [sf for sf in sfs if sf in wanted]
    per_query: dict[str, dict[float, float]] = {n: {} for n in names}
    totals: dict[float, float | None] = {}
    failed: dict[float, list[str]] = {}
    for sf in sfs:
        sf_dir = sf_dirs[sf]
        total = 0.0
        # Per-query warmup-then-measure, with one JSON line FLUSHED per
        # (query, SF) as it completes: the r12 sf10 heavy-chain sweep ran
        # 3 hours, was time-box killed, and lost EVERY in-memory
        # measurement because the harness printed one JSON at the end
        # (r12 verdict item 5). A killed sweep now keeps every completed
        # point in its log.
        for name in names:
            # SPARK_GRAFT_SCALING_WARMUP=0 skips the warmup execution: for
            # the time-boxed heavy-chain sweeps a 20-minute warmup halves
            # how many chains fit the box; the (slightly cold-inflated)
            # single-run numbers are conservative and marked as such in
            # SCALING.md. Default keeps bench.py's warm steady-state method.
            if os.environ.get("SPARK_GRAFT_SCALING_WARMUP", "1") != "0":
                try:  # warmup: steady-state, not codegen cost
                    plan(name, sf_dir).collect()
                except Exception as e:
                    print(f"scaling: warmup {name}@{sf} failed: {e}", file=sys.stderr)
            runs = []
            for _ in range(n_runs):
                t0 = time.perf_counter()
                # a query failing mid-measurement loses its own timing, not
                # every measurement the harness already took across SFs
                try:
                    plan(name, sf_dir).collect()
                except Exception as e:
                    print(f"scaling: timed {name}@{sf} failed: {e}", file=sys.stderr)
                    runs = []
                    break
                runs.append(time.perf_counter() - t0)
            if not runs:
                failed.setdefault(sf, []).append(name)
                print(
                    json.dumps({"metric": "scaling_point", "query": name, "sf": sf, "sec": None}),
                    flush=True,
                )
                continue
            best = min(runs)
            per_query[name][sf] = round(best, 3)
            print(
                json.dumps(
                    {"metric": "scaling_point", "query": name, "sf": sf, "sec": round(best, 3)}
                ),
                flush=True,
            )
            if name in headline:
                total += best
        # a total missing a headline query would fabricate sub-linear
        # growth — the exact signal this harness measures (review r9);
        # bench.py's null-total-on-failure invariant applies here too
        if any(n in headline for n in failed.get(sf, [])):
            totals[sf] = None
        else:
            totals[sf] = round(total, 3)

    # t ~ SF^p between the smallest and largest measured SF; p = 1 is
    # linear growth, p near 0 is overhead-dominated (ideal at small SF).
    # Needs two distinct SFs — with fewer, report the timings without
    # exponents instead of dying after all the measurement work is done.
    exponents = {}
    if len(sfs) >= 2:
        lo, hi = sfs[0], sfs[-1]
        for name in names:
            t_lo = per_query[name].get(lo, 0.0)
            t_hi = per_query[name].get(hi, 0.0)
            if t_lo > 0 and t_hi > 0:
                exponents[name] = round(math.log(t_hi / t_lo) / math.log(hi / lo), 3)
    print(
        json.dumps(
            {
                "metric": "headline_scaling",
                "sfs": sfs,
                "totals": {str(k): v for k, v in totals.items()},
                "queries": {n: {str(k): v for k, v in d.items()} for n, d in per_query.items()},
                "exponents": exponents,
                "failed": {str(k): v for k, v in failed.items()},
                "runs": n_runs,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
