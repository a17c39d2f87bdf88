"""Similarity search over ``embeddings`` (BASELINE.json extras).

Brute-force cosine top-k as the exact baseline, plus a hyperplane-sign
LSH-bucketed variant as the 100 TB scale path (search only the query's
bucket — the bucket column doubles as the storage partition key).

Determinism: embeddings are float32; both engines quantize each component
to round(x * 1e6) as BIGINT, so dot products and norms are exact integer
arithmetic and the final cosine is a single double division — bit-identical
across engines. (The unquantized fast path lives in
fund_data_pipeline_spark.operators.similarity for bench use.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import QUERIES, register, table

_QUERY_VEC_ID = 0

# DuckDB fragment: quantized embedding list
_Q = "list_transform(embedding, x -> CAST(round(x * 1e6) AS BIGINT))"


def _quant(col):
    return F.transform(col if not isinstance(col, str) else F.col(col), lambda x: F.round(x * 1e6).try_cast("long"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, v: acc + v
    )


@register(
    "embedding_topk_cosine",
    headline=True,
    doc="Brute-force cosine top-20 against a fixed query vector (vec_id=0): "
    "quantized integer dot/norms, deterministic tiebreak. One broadcast of "
    "the query row; scan stays fully parallel.",
    oracle=f"""
WITH q AS (
  SELECT {_Q} AS qe FROM embeddings WHERE vec_id = {_QUERY_VEC_ID}
), scored AS (
  SELECT e.vec_id, e.label,
         list_sum(list_transform(range(1, 65), i -> qv.qe[i] * {_Q.replace('embedding', 'e.embedding')}[i])) AS dot,
         list_sum(list_transform(qv.qe, x -> x * x)) AS qnorm,
         list_sum(list_transform({_Q.replace('embedding', 'e.embedding')}, x -> x * x)) AS enorm
  FROM embeddings e CROSS JOIN q qv
  WHERE e.vec_id <> {_QUERY_VEC_ID}
)
SELECT vec_id, label,
       CAST(dot AS DOUBLE) / (sqrt(CAST(qnorm AS DOUBLE)) * sqrt(CAST(enorm AS DOUBLE))) AS cosine
FROM scored
ORDER BY cosine DESC, vec_id
LIMIT 20
""",
)
def embedding_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == _QUERY_VEC_ID).select(_quant("embedding").alias("qe"))
    cand = emb.filter(F.col("vec_id") != _QUERY_VEC_ID).select(
        "vec_id", "label", _quant("embedding").alias("qe2")
    )
    scored = cand.crossJoin(F.broadcast(q)).select(
        "vec_id",
        "label",
        _dot(F.col("qe"), F.col("qe2")).alias("dot"),
        _dot(F.col("qe"), F.col("qe")).alias("qnorm"),
        _dot(F.col("qe2"), F.col("qe2")).alias("enorm"),
    )
    cosine = F.col("dot").cast("double") / (
        F.sqrt(F.col("qnorm").cast("double")) * F.sqrt(F.col("enorm").cast("double"))
    )
    return (
        scored.select("vec_id", "label", cosine.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(20)
    )


@register(
    "embedding_lsh_buckets",
    doc="Hyperplane-sign LSH bucketing: 8-bit bucket from component signs — "
    "the ANN partition key (search only the query's bucket at scale). "
    "Returns bucket histogram + per-bucket label diversity.",
    oracle="""
SELECT bucket, COUNT(*) AS n_vectors, COUNT(DISTINCT label) AS n_labels
FROM (
  SELECT vec_id, label,
         list_sum(list_transform(range(1, 9), i -> CASE WHEN embedding[i] > 0 THEN (2 ** (i - 1))::BIGINT ELSE 0 END)) AS bucket
  FROM embeddings
)
GROUP BY bucket
""",
)
def embedding_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    bucket = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.lit(8)),
            lambda i: F.when(F.element_at("embedding", i) > 0, F.pow(F.lit(2), i - 1).cast("long")).otherwise(
                F.lit(0).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return (
        emb.select(bucket.alias("bucket"), "label")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"), F.countDistinct("label").alias("n_labels"))
    )


@register(
    "embedding_ann_bucketed_topk",
    doc="ANN scale path: top-10 cosine neighbors of vec_id=0 searched ONLY "
    "within its hyperplane-LSH bucket (bucket equi-join replaces the full "
    "cross join — at 100 TB the bucket is a partition pruned at the scan).",
    oracle=f"""
WITH b AS (
  SELECT vec_id, label, {_Q} AS qe,
         list_sum(list_transform(range(1, 9), i -> CASE WHEN embedding[i] > 0 THEN (2 ** (i - 1))::BIGINT ELSE 0 END)) AS bucket
  FROM embeddings
), q AS (
  SELECT qe AS query_qe, bucket AS query_bucket FROM b WHERE vec_id = {_QUERY_VEC_ID}
), scored AS (
  SELECT b.vec_id, b.label,
         list_sum(list_transform(range(1, 65), i -> q.query_qe[i] * b.qe[i])) AS dot,
         list_sum(list_transform(q.query_qe, x -> x * x)) AS qnorm,
         list_sum(list_transform(b.qe, x -> x * x)) AS enorm
  FROM b JOIN q ON b.bucket = q.query_bucket
  WHERE b.vec_id <> {_QUERY_VEC_ID}
)
SELECT vec_id, label,
       CAST(dot AS DOUBLE) / (sqrt(CAST(qnorm AS DOUBLE)) * sqrt(CAST(enorm AS DOUBLE))) AS cosine
FROM scored
ORDER BY cosine DESC, vec_id
LIMIT 10
""",
)
def embedding_ann_bucketed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    bucket = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.lit(8)),
            lambda i: F.when(F.element_at("embedding", i) > 0, F.pow(F.lit(2), i - 1).cast("long")).otherwise(
                F.lit(0).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    b = emb.select("vec_id", "label", _quant("embedding").alias("qe"), bucket.alias("bucket"))
    q = b.filter(F.col("vec_id") == _QUERY_VEC_ID).select(
        F.col("qe").alias("query_qe"), F.col("bucket").alias("query_bucket")
    )
    scored = (
        b.filter(F.col("vec_id") != _QUERY_VEC_ID)
        .join(F.broadcast(q), F.col("bucket") == F.col("query_bucket"))
        .select(
            "vec_id",
            "label",
            _dot(F.col("query_qe"), F.col("qe")).alias("dot"),
            _dot(F.col("query_qe"), F.col("query_qe")).alias("qnorm"),
            _dot(F.col("qe"), F.col("qe")).alias("enorm"),
        )
    )
    cosine = F.col("dot").cast("double") / (
        F.sqrt(F.col("qnorm").cast("double")) * F.sqrt(F.col("enorm").cast("double"))
    )
    return (
        scored.select("vec_id", "label", cosine.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(10)
    )


@register(
    "embedding_cosine_near_dup",
    doc="Embedding-cosine near-dup: candidate pairs must share the 8-bit "
    "hyperplane-LSH bucket (equi-join — no all-pairs cross product), then "
    "exact quantized cosine >= 0.35 confirms. The scale path: bucket is the "
    "storage partition key, so each partition self-joins locally.",
    oracle=f"""
WITH b AS (
  SELECT vec_id, {_Q} AS qe,
         list_sum(list_transform(range(1, 9), i -> CASE WHEN embedding[i] > 0 THEN (2 ** (i - 1))::BIGINT ELSE 0 END)) AS bucket
  FROM embeddings
), pairs AS (
  SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
         list_sum(list_transform(range(1, 65), i -> a.qe[i] * c.qe[i])) AS dot,
         list_sum(list_transform(a.qe, x -> x * x)) AS anorm,
         list_sum(list_transform(c.qe, x -> x * x)) AS cnorm
  FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
)
SELECT vec_a, vec_b,
       CAST(dot AS DOUBLE) / (sqrt(CAST(anorm AS DOUBLE)) * sqrt(CAST(cnorm AS DOUBLE))) AS cosine
FROM pairs
WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(anorm AS DOUBLE)) * sqrt(CAST(cnorm AS DOUBLE))) >= 0.35
""",
)
def embedding_cosine_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    bucket = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.lit(8)),
            lambda i: F.when(F.element_at("embedding", i) > 0, F.pow(F.lit(2), i - 1).cast("long")).otherwise(
                F.lit(0).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    b = emb.select("vec_id", _quant("embedding").alias("qe"), bucket.alias("bucket"))
    a, c = b.alias("a"), b.alias("c")
    pairs = a.join(
        c,
        (F.col("a.bucket") == F.col("c.bucket")) & (F.col("a.vec_id") < F.col("c.vec_id")),
    ).select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("c.vec_id").alias("vec_b"),
        _dot(F.col("a.qe"), F.col("c.qe")).alias("dot"),
        _dot(F.col("a.qe"), F.col("a.qe")).alias("anorm"),
        _dot(F.col("c.qe"), F.col("c.qe")).alias("cnorm"),
    )
    cosine = F.col("dot").cast("double") / (
        F.sqrt(F.col("anorm").cast("double")) * F.sqrt(F.col("cnorm").cast("double"))
    )
    return pairs.select("vec_a", "vec_b", cosine.alias("cosine")).filter(F.col("cosine") >= 0.35)


@register(
    "embedding_topk_pandas",
    doc="The same brute-force top-20 as embedding_topk_cosine, executed on "
    "the Arrow path (operators.similarity: numpy batch kernel + partial "
    "top-k per partition). Shares the JVM variant's oracle verbatim — the "
    "vectorized kernel itself is under the value-hash gate.",
    oracle=QUERIES["embedding_topk_cosine"].oracle,
)
def embedding_topk_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import topk_cosine

    emb = table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == _QUERY_VEC_ID).select("embedding").first()["embedding"]
    return topk_cosine(emb, qvec, k=20, exclude_vec_id=_QUERY_VEC_ID)
