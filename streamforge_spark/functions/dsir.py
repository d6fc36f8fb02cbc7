"""DSIR-style importance weights for training-data selection.

Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): score every raw document by the log-likelihood
ratio of a hashed-n-gram bag-of-words model fit on a TARGET corpus
versus one fit on the RAW corpus; resampling by that weight shifts
the pretraining mix toward the target distribution.  This module
builds the per-bucket log-ratio table once; the batch query
(queries/curation.py::dsir_importance_weight) and the streaming
admission gate (streaming/curation.py::streaming_dsir_gate) share it.

Exactness contract (the repo's standard fixed-point discipline,
common.py docstring): token bucketing uses the md5-based
:func:`~streamforge_spark.functions.simdedup.oracle_hash60` coin, the
smoothed count ratio is formed with exact BIGINT products converted
to DOUBLE (exact below 2^53 — holds through sf0.1 with orders of
magnitude to spare), and ``ln`` is the ONE float op, immediately
rounded to integer micro-units, so every downstream sum is a BIGINT
sum in any partition order.  Spark's JVM ``Math.log`` and DuckDB's
libm ``log`` agreed bit-for-bit after micro-rounding on a 200k-point
sweep of count-ratio-shaped inputs (measured this round); the parity
suite re-proves it on the real fixture values at every scale it runs.

100 TB shape: the model is ONE map-side-combined rollup of the token
stream onto DSIR_BUCKETS rows (the target filter is a counted CASE in
the same pass, not a second scan), the totals row is a broadcast, and
scoring joins the bucket stream to a <=DSIR_BUCKETS-row broadcast —
the token stream itself never shuffles for the model join; the only
exchange after the rollup is the per-doc score aggregation.  Beyond
2^53 total tokens, rescale the counts (divide both numerator totals
by a common power of two) before the double conversion — the ratio is
scale-invariant.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from streamforge_spark.functions.simdedup import oracle_hash60

#: hashed-feature space size (Xie et al. use 10^4-10^6 hashed buckets;
#: 4096 keeps the model broadcast-trivial while leaving the fixture's
#: ~40-term vocabulary collision-free with high probability)
DSIR_BUCKETS = 4096
#: fixed-point scale for the per-bucket log-likelihood ratio
DSIR_MICRO = 1_000_000
#: hash salt isolating DSIR buckets from the other md5 coins
DSIR_SALT = "dsir"


def dsir_bucket(tok: Column, buckets: int = DSIR_BUCKETS) -> Column:
    """Hashed-feature bucket of a token (nonnegative, < buckets)."""
    return oracle_hash60(tok, salt=DSIR_SALT) % buckets


def dsir_counts(docs: DataFrame, target: Column,
                text_col: str = "text",
                buckets: int = DSIR_BUCKETS) -> DataFrame:
    """(bkt, cr, ct) — raw and target token counts per hashed bucket:
    the model's SUFFICIENT STATISTICS.  Counts are additive, so models
    over disjoint corpora merge exactly (:func:`merge_dsir_counts`) —
    the property that makes the persisted-model / incremental-refit
    path (queries/curation.py::dsir_incremental_refit) exact rather
    than approximate.  One map-side-combined rollup of the token
    stream; the target filter is a counted CASE in the same pass."""
    toks = docs.select(target.alias("_t"),
                       F.explode(F.split(F.col(text_col), " ")).alias("tok"))
    return (toks.select("_t", dsir_bucket(F.col("tok"), buckets).alias("bkt"))
            .groupBy("bkt")
            .agg(F.count(F.lit(1)).alias("cr"),
                 F.count(F.when(F.col("_t"), 1)).alias("ct")))


def merge_dsir_counts(a: DataFrame, b: DataFrame) -> DataFrame:
    """Exact model merge: bucket-wise sum of two count tables (e.g. a
    persisted corpus model + the newly ingested batch).  Outer join on
    <=buckets rows — trivially broadcastable."""
    bb = b.select(F.col("bkt"), F.col("cr").alias("_cr2"),
                  F.col("ct").alias("_ct2"))
    return (a.join(bb, "bkt", "full")
            .select("bkt",
                    (F.coalesce("cr", F.lit(0))
                     + F.coalesce("_cr2", F.lit(0))).alias("cr"),
                    (F.coalesce("ct", F.lit(0))
                     + F.coalesce("_ct2", F.lit(0))).alias("ct")))


def dsir_llr_from_counts(counts: DataFrame,
                         buckets: int = DSIR_BUCKETS) -> DataFrame:
    """(bkt, llr_micro) from a (bkt, cr, ct) count table: add-one
    smoothing, exact BIGINT products into ONE double division, ln as
    the single float op rounded to micro-units (module docstring)."""
    # two consumers (totals + the ratio projection): pin the
    # <=buckets-row table so its lineage runs once
    counts = counts.localCheckpoint(eager=False)
    tots = counts.agg(F.sum("cr").alias("nr"), F.sum("ct").alias("nt"))
    return (counts.crossJoin(F.broadcast(tots))
            .select("bkt", F.round(F.log(
                ((F.col("ct") + 1) * (F.col("nr") + buckets)).cast("double")
                / ((F.col("cr") + 1) * (F.col("nt") + buckets)).cast("double"))
                * DSIR_MICRO).cast("long").alias("llr_micro")))


def dsir_llr_model(docs: DataFrame, target: Column,
                   text_col: str = "text",
                   buckets: int = DSIR_BUCKETS) -> DataFrame:
    """(bkt, llr_micro) — per-bucket add-one-smoothed log ratio
    ln(p_target(bkt) / p_raw(bkt)) in integer micro-units.

    ``target`` is a boolean Column over ``docs`` marking the target
    corpus (e.g. ``F.col("source").isin(...)``); the raw side is the
    whole input.  One rollup + one broadcast totals row.
    """
    return dsir_llr_from_counts(
        dsir_counts(docs, target, text_col, buckets), buckets)


def save_dsir_counts(counts: DataFrame, path: str) -> None:
    """Persist the model's sufficient statistics (the artifact a
    production pipeline keeps between ingest batches — same contract
    as functions/substring_index.py's persisted window-hash index)."""
    counts.write.mode("overwrite").parquet(path)


def load_dsir_counts(spark, path: str) -> DataFrame:
    return spark.read.parquet(path).select("bkt", "cr", "ct")


def dsir_score(docs: DataFrame, llr_model: DataFrame,
               id_col: str = "doc_id", text_col: str = "text",
               buckets: int = DSIR_BUCKETS) -> DataFrame:
    """(id, n_tokens, score_micro) — per-document sum of bucket log
    ratios (the log importance weight, up to the constant partition
    function).  The model side broadcasts; tokens not present in the
    model (possible only for out-of-corpus docs, e.g. a stream scored
    against yesterday's model) contribute the smoothed unseen-bucket
    ratio ln((0+1)*(nr+B) / ((0+1)*(nt+B))) only if the caller bakes
    those rows into the model — this helper inner-joins, so unseen
    buckets contribute nothing and ``n_tokens`` counts scored tokens.
    """
    toks = docs.select(F.col(id_col),
                       F.explode(F.split(F.col(text_col), " ")).alias("tok"))
    scored = toks.select(F.col(id_col),
                         dsir_bucket(F.col("tok"), buckets).alias("bkt")) \
                 .join(F.broadcast(llr_model), "bkt")
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("llr_micro").alias("score_micro"))
