"""Deterministic hash-based sampling and dataset splits.

Training-data pipelines need samples and train/val/test splits that are
(a) reproducible run-over-run, (b) stable under re-partitioning and
cluster-size changes, and (c) consistent across engines. RNG-based
``df.sample`` gives none of these; hashing a stable key gives all three.

Bucketing: ``bucket = first 8 hex chars of md5(key) mod n_buckets``.
md5 is available in Spark, DuckDB, Postgres, and Python hashlib, so the
same row lands in the same bucket everywhere — the catalog queries
(train_val_test_split, stratified_hash_sample) oracle-check this exact
property against DuckDB.

Scale: one map-side expression, no shuffle, no state. A 100 TB split is
exactly as cheap as a filter.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: buckets used by the split; 1e4 gives 0.01% split resolution
N_BUCKETS = 10_000


def hash_bucket(key: Column | str, n_buckets: int = N_BUCKETS, salt: str = "") -> Column:
    """Stable bucket in [0, n_buckets): conv(substr(md5(salt|key),1,8)) % n.

    ``salt`` decorrelates bucket assignments between DIFFERENT uses of the
    same key: the unsalted default is the co-sampling contract (same key →
    same bucket everywhere), but composing two unsalted operations on one
    key is fully correlated — e.g. an unsalted 20% sample followed by an
    unsalted 80/10/10 split puts every sampled row in 'train'. Give each
    independent decision its own salt (``shuffled_shards`` already salts
    with its seed).

    NULL keys: md5(NULL) is NULL, so the bucket is NULL and every
    downstream comparison is three-valued-false — a NULL-key row is
    DROPPED by every sampler and labeled NULL by split_column, matching
    the oracles' identical md5-based SQL exactly (both engines agree;
    pinned as the contract in r10). Sample on a non-null key (synthesize
    one upstream if needed); the samplers intentionally do not coalesce,
    because an invented sentinel key would silently co-locate all NULL
    rows in one bucket and skew small splits.

    ``salt`` must not contain ``'|'``: the namespacing is ``salt|key``,
    and a pipe inside the salt would let distinct (salt, key) pairs
    collide (salt='a|b', key='c' vs salt='a', key='b|c') — correlating
    decisions the salt exists to decorrelate (review r11). With
    pipe-free salts the encoding is injective for ARBITRARY key data
    (the prefix up to the first '|' is exactly the salt)."""
    if "|" in salt:
        raise ValueError(f"salt must not contain '|': {salt!r}")
    c = F.col(key) if isinstance(key, str) else key
    keyed = F.concat(F.lit(f"{salt}|"), c.cast("string")) if salt else c.cast("string")
    h = F.conv(F.substring(F.md5(keyed), 1, 8), 16, 10).cast("long")
    return h % F.lit(n_buckets)


def deterministic_sample(df: DataFrame, key: str, fraction: float, salt: str = "") -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash — reproducible and
    (with the default empty salt) co-sampled: the same keys survive in
    every table sampled on that key, so sampled fact/dim tables still
    join. Pass a ``salt`` when this sample must be INDEPENDENT of another
    hash-based decision on the same key (see :func:`hash_bucket`)."""
    if not 0.0 <= fraction <= 1.0:
        # siblings (mixture_sample, split_column) raise on the identical
        # mistake; a swapped-operand fraction like 50.0 would otherwise
        # silently return the full corpus as the "sample" (review r11)
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(hash_bucket(key, salt=salt) < int(round(fraction * N_BUCKETS)))


def split_column(key: Column | str, weights: Sequence[float], labels: Sequence[str]) -> Column:
    """Label each row train/val/test (etc.) by cumulative hash-bucket range.

    NULL keys get a NULL label (see :func:`hash_bucket`)."""
    if len(weights) != len(labels):
        raise ValueError("weights and labels must align")
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w <= 0 for w in weights):
        # a zero/negative weight silently collapses splits (review r10)
        raise ValueError(f"weights must be positive, got {list(weights)}")
    total = sum(weights)
    bounds = []
    acc = 0.0
    for w in weights:
        acc += w / total
        bounds.append(int(round(acc * N_BUCKETS)))
    collapsed = [
        label
        for label, lo, hi in zip(labels, [0, *bounds], bounds)
        if hi <= lo
    ]
    if collapsed:
        # a positive weight below the bucket resolution rounds to an empty
        # range — the same silent-collapse failure the w <= 0 guard closes
        # (review r11); raise instead of emitting an unreachable when-arm
        raise ValueError(
            f"weights round to empty bucket ranges for labels {collapsed} "
            f"(resolution is 1/{N_BUCKETS} of the total weight)"
        )
    bucket = hash_bucket(key)
    expr = None
    for bound, label in zip(bounds, labels):
        cond = bucket < F.lit(bound)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    return expr  # last bound == N_BUCKETS, so no otherwise needed


def train_val_test(
    df: DataFrame,
    key: str,
    weights: Sequence[float] = (0.8, 0.1, 0.1),
    labels: Sequence[str] = ("train", "val", "test"),
    split_col: str = "split",
) -> DataFrame:
    """Attach a deterministic split label; same key => same split, always."""
    if split_col in df.columns:
        # same reserved-name contract as temperature_sample/cap_per_stratum:
        # silently overwriting a caller's column destroys data (review r11)
        raise ValueError(f"output column {split_col!r} already exists in the input")
    return df.withColumn(split_col, split_column(key, weights, labels))


def shuffled_shards(
    df: DataFrame,
    key: str,
    n_shards: int = 16,
    seed: str = "42",
    shard_col: str = "shard",
    pos_col: str = "shard_pos",
) -> DataFrame:
    """Deterministic corpus shuffle for training-data serialization.

    Training order must be (a) shuffled, (b) reproducible given a seed, and
    (c) computable without a single global sort. The standard sharded form:
    ``shard = md5(seed|key) bucket`` picks the output file, and the
    position *within* a shard is the rank of the same hash — together a
    seeded permutation of the corpus (read shards in order, rows in
    shard_pos order). Changing the seed re-permutes everything; re-running
    with the same seed is byte-stable.

    Scale: the shard assignment is map-side; the within-shard rank is one
    window per shard — n_shards independent partitions, each
    corpus/n_shards rows, instead of the single-partition global
    ROW_NUMBER a naive "ORDER BY random()" serializer needs. Size n_shards
    so a shard fits one task (e.g. 10k shards at 100 TB -> ~10 GB each,
    then raise it); the writer maps one shard to one output file.

    ``key`` must be UNIQUE per row (a doc id): duplicate key values tie on
    (skey, key) and row_number breaks the tie by partition arrival order,
    which is not reproducible. The rank is over the hash, so uniqueness of
    the key is the entire determinism contract.
    """
    from pyspark.sql import Window

    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    clash = {shard_col, pos_col} & set(df.columns)
    if clash:
        # same reserved-name contract as temperature_sample/cap_per_stratum
        # (review r11): 'shard' is a common upstream column name
        raise ValueError(f"output columns already exist in the input: {sorted(clash)}")
    if "|" in seed:
        # seed|key namespacing — same injectivity argument as hash_bucket
        raise ValueError(f"seed must not contain '|': {seed!r}")
    c = F.col(key).cast("string")
    skey = F.md5(F.concat(F.lit(f"{seed}|"), c))
    shard = (F.conv(F.substring(skey, 1, 8), 16, 10).cast("long") % n_shards).cast("int")
    w = Window.partitionBy(shard).orderBy(skey, c)
    return df.withColumn(shard_col, shard).withColumn(
        pos_col, F.row_number().over(w).cast("long")
    )


def temperature_sample(
    df: DataFrame,
    key: str,
    stratum_col: str,
    alpha: float = 0.5,
    salt: str = "",
    thr_col: str | None = None,
) -> DataFrame:
    """Temperature-scaled mixture sampling: keep rates DERIVED from the
    corpus itself so the sampled stratum sizes follow ``n_l ** alpha``
    (the multinomial alpha/temperature sampling used to rebalance
    language mixtures in multilingual-corpus construction — alpha=1
    keeps the natural distribution, alpha=0 equalizes strata, 0.5 is
    the canonical compromise).

    Derivation: target size per stratum is proportional to
    ``n_l ** alpha``, so the keep RATE is ``C * n_l ** (alpha-1)``;
    normalizing so the rarest stratum keeps 100% gives
    ``rate_l = (n_min / n_l) ** (1 - alpha)``. The membership decision is
    the same md5 bucket as :func:`deterministic_sample` — reproducible and
    partition-stable. Unlike the fixed-rate samplers, thresholds here are
    corpus-derived, so two different tables do NOT co-sample in general;
    what does hold (unsalted) is nesting — a key kept under the lower of
    two thresholds is kept under the higher — and bucket alignment with
    every other unsalted hash decision on the same key.

    Cross-engine exactness: the bucket thresholds pass through float math
    once — ``floor(N_BUCKETS * (n_min/n_l) ** (1-alpha))``. For the
    default ``alpha=0.5`` that exponent is computed with ``sqrt``, which
    IEEE 754 requires to be correctly rounded, so Spark and any IEEE
    oracle engine produce bit-identical thresholds from the same counts.
    Other alphas go through ``pow``, which libm does NOT guarantee to the
    half-ulp — fine in production, but pin alpha=0.5 when a bit-exact
    cross-engine replay matters.

    Scale: one corpus aggregate (map-side partial count per stratum — the
    stat relation is |strata|-sized), one broadcast join of the derived
    thresholds, one map-side filter. No corpus-sized shuffle. NULL
    strata form their own stratum (null-safe threshold join), so dirty
    rows are sampled consistently instead of vanishing.

    ``thr_col`` optionally exposes each row's bucket threshold (useful
    for auditing the derived rates; also what the catalog oracle pins).
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    strat = f"__ts_{stratum_col}"
    internal = {"__ts_n", "__ts_n_min", "__ts_thr"}
    if strat in internal:  # stratum_col named 'n' / 'n_min' / 'thr'
        raise ValueError(
            f"stratum column {stratum_col!r} collides with an internal alias; rename it"
        )
    clash = ({strat} | internal | ({thr_col} if thr_col else set())) & set(df.columns)
    if clash:
        raise ValueError(f"input columns clash with internal/output names: {sorted(clash)}")
    # |strata|-sized; checkpointed so the min() and the threshold projection
    # both read it instead of re-aggregating the corpus twice
    counts = (
        df.groupBy(F.col(stratum_col).alias(strat))
        .agg(F.count(F.lit(1)).alias("__ts_n"))
        .localCheckpoint(eager=True)
    )
    n_min = counts.agg(F.min("__ts_n").alias("__ts_n_min"))
    ratio = F.col("__ts_n_min").cast("double") / F.col("__ts_n").cast("double")
    exponent = 1.0 - alpha
    if exponent == 0.5:
        rate = F.sqrt(ratio)
    elif exponent == 0.0:
        rate = F.lit(1.0)
    else:
        rate = F.pow(ratio, F.lit(exponent))
    thresholds = (
        counts.crossJoin(F.broadcast(n_min))
        .select(strat, F.floor(F.lit(N_BUCKETS) * rate).cast("long").alias("__ts_thr"))
    )
    kept = (
        df.join(
            F.broadcast(thresholds),
            F.col(stratum_col).eqNullSafe(F.col(strat)),
            "inner",
        )
        .filter(hash_bucket(key, salt=salt) < F.col("__ts_thr"))
        .drop(strat)
    )
    if thr_col is None:
        return kept.drop("__ts_thr")
    return kept.withColumnRenamed("__ts_thr", thr_col)


def cap_per_stratum(
    df: DataFrame,
    stratum_cols: Sequence[str],
    cap: int,
    order_by: Sequence[Column],
    tie_key: str,
) -> DataFrame:
    """Frequency cap: keep at most ``cap`` rows per stratum, preferring
    rows by ``order_by`` (ties broken by the unique ``tie_key`` so the
    kept set is deterministic). The per-domain / per-(domain, language)
    document cap every crawl-curation pipeline applies so one hot domain
    cannot dominate the training mixture.

    Scale: the naive form — one ROW_NUMBER window over the whole corpus —
    shuffles 100 TB to rank rows in strata that are under the cap anyway
    (with a Zipfian domain distribution, almost all of them). Instead:
    count rows per stratum (map-side partial agg, |strata|-sized result),
    broadcast the OVER-cap stratum set, and split the corpus map-side:
    under-cap rows pass through untouched (no shuffle), only rows of
    over-cap strata — bounded by |over-cap strata| * their sizes, the
    actual offenders — shuffle into the rank window; Catalyst further
    inserts a partial WindowGroupLimit below that exchange, so at most
    ``cap`` rows per stratum per map partition are shuffled at all. Three scans of the
    source instead of one full-corpus shuffle: scans parallelize and
    prune; a 100 TB exchange does not. The over-cap stratum set is
    |strata|-bounded; if a corpus ever has too many over-cap strata to
    broadcast, drop the broadcast hint and the same plan runs as a
    shuffle join on the (tiny) stratum keys.

    NULL stratum values form one stratum (null-safe membership test +
    window partitioning), matching ``ROW_NUMBER() OVER (PARTITION BY
    ...)`` semantics in SQL engines — dirty rows are capped, not dropped.
    """
    from functools import reduce
    from operator import and_

    from pyspark.sql import Window

    if cap <= 0:
        raise ValueError(f"cap must be positive, got {cap}")
    if not stratum_cols:
        raise ValueError("stratum_cols must be non-empty")
    renamed = [f"__cap_{c}" for c in stratum_cols]
    internal = {"__cap_rn", "__cap_n"}
    bad = [c for c, r in zip(stratum_cols, renamed) if r in internal]
    if bad:  # a stratum column named 'rn' / 'n'
        raise ValueError(
            f"stratum columns collide with internal aliases: {bad}; rename them"
        )
    clash = (internal | set(renamed)) & set(df.columns)
    if clash:
        raise ValueError(f"input columns clash with internal names: {sorted(clash)}")
    over = (
        df.groupBy(*[F.col(c).alias(r) for c, r in zip(stratum_cols, renamed)])
        .agg(F.count(F.lit(1)).alias("__cap_n"))
        .filter(F.col("__cap_n") > cap)
        .select(*renamed)
        .localCheckpoint(eager=True)
    )
    membership = reduce(
        and_, [F.col(c).eqNullSafe(F.col(r)) for c, r in zip(stratum_cols, renamed)]
    )
    under_rows = df.join(F.broadcast(over), membership, "left_anti")
    w = Window.partitionBy(*stratum_cols).orderBy(*order_by, F.col(tie_key))
    capped = (
        df.join(F.broadcast(over), membership, "left_semi")
        .withColumn("__cap_rn", F.row_number().over(w))
        .filter(F.col("__cap_rn") <= cap)
        .drop("__cap_rn")
    )
    return under_rows.unionByName(capped)


def mixture_sample(
    df: DataFrame,
    key: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — training-mixture construction.

    The data-mixture stage of a training pipeline keeps strata (language,
    source, quality tier) at different rates: downsample the dominant
    stratum, keep the rare ones whole. Same hash-bucket machinery as
    :func:`deterministic_sample`, so the sample is reproducible, stable
    under repartitioning, and co-sampled across tables on the same key —
    and the whole thing is one map-side filter, no shuffle, no state.

    ``rates`` maps stratum value -> keep fraction in [0, 1]; strata not
    listed use ``default_rate``. A NULL stratum uses ``default_rate`` too.
    """
    for v, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {v!r} must be in [0, 1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    threshold = None
    for v, r in rates.items():
        bound = F.lit(int(round(r * N_BUCKETS)))
        cond = F.col(stratum_col) == v
        threshold = F.when(cond, bound) if threshold is None else threshold.when(cond, bound)
    default_bound = F.lit(int(round(default_rate * N_BUCKETS)))
    threshold = default_bound if threshold is None else threshold.otherwise(default_bound)
    return df.filter(hash_bucket(key) < threshold)
