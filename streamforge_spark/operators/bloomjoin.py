"""Bloom-pruned join: a runtime row-level filter in pure column algebra.

The scale problem: joining a 100 TB fact table against a build side
that is too large to broadcast-join (tens of millions of keys) shuffles
the ENTIRE fact table, even when only a few percent of fact rows have a
partner.  Spark's optimizer injects a runtime bloom filter for exactly
this shape (`spark.sql.optimizer.runtime.bloomFilter.enabled`), but the
aggregate is not exposed to the DataFrame API — so this operator builds
the same structure out of built-in JVM expressions:

1. build side → k=2 hash positions per key → bit-packed words
   (``word = pos DIV 64``, ``bit_or(1 << pos MOD 64)``) — ONE
   map-side-combined aggregation producing at most ``m/64`` rows,
   kilobytes for millions of keys;
2. the word table broadcasts; the probe side checks its k positions
   with two broadcast hash joins (no shuffle, no Python);
3. rows passing the membership test — a superset of true matches —
   proceed to the EXACT equi-join, so false positives cost work, never
   correctness.

Cites: streamforge's DynamicJoiner (DynamicJoiner.java:200-260) joins
pre-filtered streams but has no runtime pruning story; this is the
Spark-first equivalent of a join-key sideband filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_words", "bloom_prune"]

#: Two independent 64-bit hashes via distinct xxhash64 seeds.
_SEEDS = (0x5F18, 0x9E37)


def _positions(key: Column, m_bits: int) -> list[Column]:
    return [F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(m_bits))
            for seed in _SEEDS]


def bloom_words(build: DataFrame, key: str, m_bits: int) -> DataFrame:
    """Bit-packed bloom filter of ``build[key]`` as a DataFrame of
    ``(word_idx BIGINT, bits BIGINT)`` — at most ``m_bits/64`` rows.

    Built with ONE aggregation (map-side combined ``bit_or``); the
    result is broadcastable regardless of build-side row count.
    """
    pos = _positions(F.col(key), m_bits)
    stacked = build.select(
        F.explode(F.array(*pos)).alias("p"))
    return (stacked
            .groupBy(F.expr("p DIV 64").alias("word_idx"))
            .agg(F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))"))
                 .alias("bits")))


def bloom_prune(probe: DataFrame, key: str, words: DataFrame,
                m_bits: int) -> DataFrame:
    """Keep only probe rows whose key MAY be in the filter (a superset
    of true members — follow with the exact join).

    Two broadcast hash joins against the tiny word table; absent words
    mean 'bits all zero', hence the LEFT join + coalesce(bits, 0).
    """
    p1, p2 = _positions(F.col(key), m_bits)
    out = probe
    for i, p in enumerate((p1, p2)):
        w = words.select(F.col("word_idx").alias(f"_w{i}"),
                         F.col("bits").alias(f"_b{i}"))
        out = (out
               .withColumn(f"_p{i}", p)
               .join(F.broadcast(w),
                     F.expr(f"_p{i} DIV 64") == F.col(f"_w{i}"), "left")
               .where(F.expr(
                   f"(shiftright(coalesce(_b{i}, CAST(0 AS BIGINT)),"
                   f" CAST(_p{i} % 64 AS INT)) & 1) = 1"))
               .drop(f"_p{i}", f"_w{i}", f"_b{i}"))
    return out
