"""Vector-similarity search: brute-force baseline + LSH-bucketed ANN.

Brute force (queries.embeddings.ann_cosine_topk) is exact and the
oracle; random-hyperplane LSH buckets cut the candidate space for the
100 TB path. Hyperplanes are generated from a fixed seed on the driver
and shipped as literals — deterministic, no state."""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

LSH_PLANES = 12   # signature bits per table
LSH_TABLES = 4


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def _hyperplanes(dim: int, planes: int, tables: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((tables, planes, dim))


def lsh_signature(v: Column, planes: np.ndarray) -> Column:
    """Sign-of-projection bit signature for one table: long in
    [0, 2^planes)."""
    sig = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(_dot(v, arr) >= 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = sig.bitwiseOR(bit)
    return sig


def ann_lsh_topk(emb: DataFrame, query_ids, k: int = 10,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 planes: int = LSH_PLANES, tables: int = LSH_TABLES) -> DataFrame:
    """Approximate top-k: candidates = vectors sharing an LSH bucket
    with the query in any of ``tables`` hash tables; exact cosine +
    rank within candidates.

    At 100 TB: the corpus is signed once (narrow scan + codegen
    projections), bucketed join replaces the full cross product, and
    per-bucket skew is bounded by the signature width.
    """
    dim = len(emb.select(vec_col).first()[0])
    hp = _hyperplanes(dim, planes, tables)
    e = emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    signed = e.select(
        id_col, "v",
        F.posexplode(F.array(*[lsh_signature(F.col("v"), hp[t])
                               for t in range(tables)])).alias("table", "sig"),
    )
    q = (signed.filter(F.col(id_col).isin(list(query_ids)))
         .select(F.col(id_col).alias("qid"), F.col("v").alias("qv"),
                 F.col("table"), F.col("sig")))
    cands = (
        signed.join(q, ["table", "sig"])
        .filter(F.col(id_col) != F.col("qid"))
        .select("qid", "qv", F.col(id_col).alias("cid"), F.col("v").alias("cv"))
        .dropDuplicates(["qid", "cid"])
    )
    scored = cands.select("qid", "cid", cosine(F.col("qv"), F.col("cv")).alias("cos"))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(F.col("qid").alias("query_id"), F.col("cid").alias("neighbor_id"),
                    F.col("rank").cast("long").alias("rank"), "cos"))
