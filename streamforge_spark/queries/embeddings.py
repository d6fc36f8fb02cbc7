"""Vector-similarity queries over the embeddings table
(LLM-training-data-pipeline surface: ANN search, embedding near-dup)."""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from streamforge_spark.queries.common import prep
from streamforge_spark.registry import query


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two array<double> columns —
    deterministic summation order (matches DuckDB's list_dot_product
    loop bit-for-bit)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


TOPK_K = 10
TOPK_NQ = 10  # query vectors: vec_id < 10

_TOPK_ORACLE = f"""
WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < {TOPK_NQ}),
c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv FROM embeddings),
s AS (SELECT qid, cid,
             list_dot_product(qv, cv)
               / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cos
      FROM q, c WHERE qid <> cid)
SELECT qid AS query_id, cid AS neighbor_id, CAST(rn AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn FROM s
) WHERE rn <= {TOPK_K}
"""


@query("ann_cosine_topk", oracle=_TOPK_ORACLE)
def ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k: broadcast the (small) query set
    against the full corpus, per-partition partial top-k via window
    rank. At 100 TB the corpus side stays partitioned (never
    collected); the scale path is ann_lsh_topk (bucketed candidates).
    """
    (emb,) = prep(spark, sf_dir, "embeddings")
    # precompute the norm once per vector (sqrt of the self-dot gives
    # the same double the oracle's sqrt(list_dot_product(v,v)) does) —
    # one dot per pair instead of three
    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"),
    ).withColumn("n", F.sqrt(dot(F.col("v"), F.col("v"))))
    q = e.filter(F.col("vec_id") < TOPK_NQ).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"), F.col("n").alias("qn"))
    c = e.select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"), F.col("n").alias("cn"))
    scored = (
        c.join(F.broadcast(q), F.col("qid") != F.col("cid"))
        .select("qid", "cid",
                (dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOPK_K)
        .select(F.col("qid").alias("query_id"), F.col("cid").alias("neighbor_id"),
                F.col("rn").cast("long").alias("rank"))
    )


NEAR_DUP_COS = 0.4

_NEAR_DUP_ORACLE = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
s AS (SELECT a.vec_id AS id1, b.vec_id AS id2,
             list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos
      FROM e a JOIN e b ON a.vec_id < b.vec_id)
SELECT id1, id2, cos FROM s WHERE cos >= {NEAR_DUP_COS}
"""


@query("embedding_near_dup", oracle=_NEAR_DUP_ORACLE)
def embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (all-pairs baseline).

    Quadratic in corpus size by construction — the honest baseline the
    LSH variant is judged against. At 100 TB use ann_lsh_topk-style
    bucketing; this form exists as the exactness oracle.
    """
    (emb,) = prep(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"),
    ).withColumn("n", F.sqrt(dot(F.col("v"), F.col("v"))))
    a = e.select(F.col("vec_id").alias("id1"), F.col("v").alias("v1"), F.col("n").alias("n1"))
    b = e.select(F.col("vec_id").alias("id2"), F.col("v").alias("v2"), F.col("n").alias("n2"))
    return (
        a.join(b, F.col("id1") < F.col("id2"))
        .select("id1", "id2",
                (dot(F.col("v1"), F.col("v2")) / (F.col("n1") * F.col("n2"))).alias("cos"))
        .filter(F.col("cos") >= NEAR_DUP_COS)
    )
