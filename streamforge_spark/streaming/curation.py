"""Streaming corpus curation: incremental benchmark decontamination.

The batch form (queries/curation.py::contamination_check) scans the
whole corpus; in production new documents ARRIVE — this is the same
check as a stream-static join: the benchmark shingle set is static and
tiny (MBs of eval text), so it broadcasts into every micro-batch and
the document stream never shuffles for the join. Per-doc counts run in
update mode (each doc's shingles arrive within one batch; the state is
one counter per contaminated doc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streamforge_spark.functions.text import word_ngrams


def benchmark_grams(bench_docs: DataFrame, text_col: str = "text",
                    ngram: int = 4) -> DataFrame:
    """Distinct shingles of the (static) benchmark set."""
    return (bench_docs
            .select(F.explode(word_ngrams(F.col(text_col), ngram)).alias("g"))
            .distinct())


def streaming_contamination(doc_stream: DataFrame, bench: DataFrame,
                            id_col: str = "doc_id", text_col: str = "text",
                            ngram: int = 4) -> DataFrame:
    """(doc_id, n_shared_grams) for streamed documents overlapping the
    broadcast benchmark shingle set — emit-on-update; downstream routes
    contaminated ids to a quarantine sink."""
    grams = doc_stream.select(
        F.col(id_col),
        F.explode(word_ngrams(F.col(text_col), ngram)).alias("g"))
    return (grams.join(F.broadcast(bench), "g")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_shared_grams")))
