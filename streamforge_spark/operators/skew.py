"""Skew mitigation for hot keys at scale.

AQE (enabled by session.py) splits skewed join partitions at runtime;
for aggregations over pathologically hot keys, two-phase salted
aggregation bounds any single task's share of a key: partial-aggregate
on (key, salt), then final-aggregate on the key. Works for any
algebraic aggregate (sum/count/min/max — avg via sum+count).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (merge phase1 -> phase2) for algebraic aggregates
_MERGE = {
    "sum": F.sum,
    "count": F.sum,     # counts combine by summing partials
    "min": F.min,
    "max": F.max,
}
_PARTIAL = {
    "sum": F.sum,
    "count": lambda c: F.count(c),
    "min": F.min,
    "max": F.max,
}


def salt_column(buckets: int, *cols: str) -> Column:
    """Deterministic salt in [0, buckets): hash of the full row key
    set, so identical rows land on the same salt (stable re-runs)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(buckets))


def salted_aggregate(df: DataFrame, key_cols: Sequence[str],
                     aggs: dict[str, tuple[str, str]],
                     salt_buckets: int = 16,
                     salt_from: Sequence[str] | None = None) -> DataFrame:
    """Two-phase aggregation: groupBy(key, salt) -> groupBy(key).

    aggs: {output_alias: (column, fn)} with fn in {sum,count,min,max}.
    Identical results to a direct groupBy for these aggregates (they
    are associative), with the hot key's phase-1 load spread over
    ``salt_buckets`` tasks.
    """
    for _, (c, fn) in aggs.items():
        if fn not in _PARTIAL:
            raise ValueError(f"non-algebraic aggregate {fn!r}; use sum/count/min/max")
    salt_src = list(salt_from or df.columns)
    salted = df.withColumn("_salt", salt_column(salt_buckets, *salt_src))
    partial = salted.groupBy(*key_cols, "_salt").agg(*[
        _PARTIAL[fn](c).alias(f"_p_{alias}") for alias, (c, fn) in aggs.items()
    ])
    return partial.groupBy(*key_cols).agg(*[
        _MERGE[fn](f"_p_{alias}").alias(alias) for alias, (c, fn) in aggs.items()
    ])


def salted_join(fact: DataFrame, dim: DataFrame, key: str,
                salt_buckets: int = 16, how: str = "inner") -> DataFrame:
    """Skew-hardened equi-join: salt the fact side, replicate the dim
    side across every salt value, join on (key, salt).

    The manual fallback for when AQE skew-split can't help — e.g. the
    dim is too big to broadcast and a handful of fact keys carry a
    large share of rows: a plain shuffle join puts each hot key in ONE
    task; here its rows spread over ``salt_buckets`` tasks, at the
    cost of shuffling the dim ``salt_buckets`` times (fine when
    |dim| << |fact|, the usual skew shape). Result-identical to
    ``fact.join(dim, key, how)`` for inner/left joins (each fact row
    still meets each dim row exactly once)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (dim side must stay unique per salt)")
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]),
                        F.lit(salt_buckets)))
    replicated_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))))
    return (salted_fact.join(replicated_dim, [key, "_salt"], how)
            .drop("_salt"))
