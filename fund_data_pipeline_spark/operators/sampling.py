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
    with its seed)."""
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
    return df.filter(hash_bucket(key, salt=salt) < int(round(fraction * N_BUCKETS)))


def split_column(key: Column | str, weights: Sequence[float], labels: Sequence[str]) -> Column:
    """Label each row train/val/test (etc.) by cumulative hash-bucket range."""
    if len(weights) != len(labels):
        raise ValueError("weights and labels must align")
    total = sum(weights)
    bucket = hash_bucket(key)
    expr = None
    acc = 0.0
    for w, label in zip(weights, labels):
        acc += w / total
        bound = int(round(acc * N_BUCKETS))
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
    c = F.col(key).cast("string")
    skey = F.md5(F.concat(F.lit(f"{seed}|"), c))
    shard = (F.conv(F.substring(skey, 1, 8), 16, 10).cast("long") % n_shards).cast("int")
    w = Window.partitionBy(shard).orderBy(skey, c)
    return df.withColumn(shard_col, shard).withColumn(
        pos_col, F.row_number().over(w).cast("long")
    )


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
