"""Focused tests for round-12 optimization rewrites: each asserts the
NEW plan shape computes exactly what the shape it replaced computed.
"""

from __future__ import annotations

from pyspark.sql import functions as F


# -- bucket_capped_pairs vs the capped self-join it replaced -------------

def test_bucket_capped_pairs_equals_self_join(spark):
    """On a banded relation with a hot bucket (> cap), a small bucket,
    a singleton and a carry column, the grouped-posting-array pairs
    equal the cap-window + self-join reference exactly."""
    from streamforge_spark.functions.simdedup import (
        bucket_capped_pairs, cap_band_buckets)
    rows = []
    # hot bucket: 10 members in (cfg=1, band=0, hash=7) with cap=4
    rows += [(1, 0, 7, i) for i in range(10)]
    # small bucket: 3 members
    rows += [(1, 1, 9, i) for i in (20, 21, 22)]
    # singleton bucket: no pairs
    rows += [(2, 0, 7, 30)]
    # same (band, hash) under another carry value: disjoint keyspace
    rows += [(2, 1, 9, i) for i in (20, 40)]
    banded = spark.createDataFrame(
        rows, "cfg long, band int, band_hash long, doc_id long")
    cap = 4
    got = {(r.cfg, r.d1, r.d2) for r in bucket_capped_pairs(
        banded, bucket_cols=("cfg", "band", "band_hash"), cap=cap,
        carry=("cfg",)).collect()}
    capped = cap_band_buckets(banded, bucket_cols=("cfg", "band",
                                                   "band_hash"), cap=cap)
    a, b = capped.alias("a"), capped.alias("b")
    ref = {(r.cfg, r.d1, r.d2) for r in
           a.join(b, (F.col("a.cfg") == F.col("b.cfg"))
                  & (F.col("a.band") == F.col("b.band"))
                  & (F.col("a.band_hash") == F.col("b.band_hash"))
                  & (F.col("a.doc_id") < F.col("b.doc_id")))
           .select(F.col("a.cfg").alias("cfg"),
                   F.col("a.doc_id").alias("d1"),
                   F.col("b.doc_id").alias("d2")).collect()}
    assert got == ref
    # the hot bucket contributed exactly C(cap,2) pairs over the cap
    # LOWEST ids, the singleton none
    hot = {(d1, d2) for (c, d1, d2) in got if c == 1 and d2 < 20}
    assert hot == {(i, j) for i in range(cap) for j in range(cap) if i < j}


# -- connected_components: self-loop/broadcast rewrite --------------------

def test_connected_components_matches_bruteforce(spark):
    """A >2-round chain plus islands plus an empty graph: the
    self-loop/broadcast loop lands on the same fixpoint the definition
    demands (component = min reachable node id)."""
    from streamforge_spark.operators.graph import connected_components
    # chain 0-1-2-3-4-5 (diameter 5 — exercises several rounds),
    # triangle 10-11-12, isolated edge 20-21
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5),
         (10, 11), (11, 12), (10, 12), (20, 21)],
        "d1 long, d2 long")
    got = {r.node: r.component
           for r in connected_components(edges).collect()}
    want = {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 5: 0,
            10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    assert got == want


def test_connected_components_empty_edges(spark):
    from streamforge_spark.operators.graph import connected_components
    edges = spark.createDataFrame([], "d1 long, d2 long")
    assert connected_components(edges).count() == 0


# -- gate assume_partitioned: flag must not change results ----------------

def test_gates_assume_partitioned_identical(spark):
    """Every gate that takes assume_partitioned returns identical rows
    with the probe skipped — the flag is a pure plan-shape switch."""
    from streamforge_spark.streaming.curation import (
        streaming_dsir_gate, streaming_substring_contamination,
        streaming_vocab_oov)
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta " * (i + 2)) for i in range(8)],
        "doc_id long, text string")
    vocab = spark.createDataFrame([("alpha",), ("beta",)],
                                  "term string")
    def rows(df):
        return sorted(tuple(r) for r in df.collect())
    assert rows(streaming_vocab_oov(docs, vocab)) == rows(
        streaming_vocab_oov(docs, vocab, assume_partitioned=True))
    llr = spark.createDataFrame([(0, 5), (1, -5)], "bkt int, llr_micro long")
    assert rows(streaming_dsir_gate(docs, llr)) == rows(
        streaming_dsir_gate(docs, llr, assume_partitioned=True))
    idx = spark.createDataFrame([(1,)], "h long")  # no real hits needed
    assert rows(streaming_substring_contamination(docs, idx)) == rows(
        streaming_substring_contamination(docs, idx,
                                          assume_partitioned=True))
