"""The shared/persisted exact-substring index (functions/substring_index.py):
the production path the three inline queries only describe — build once,
persist, probe per batch, fold admitted batches back in."""

from pyspark.sql import functions as F

from streamforge_spark.functions.substring_index import (
    contamination_from_index, merge_substring_index, read_substring_index,
    substring_index, window_hashes, write_substring_index)
from streamforge_spark.io import load
from streamforge_spark.queries.text import XS_K, XS_SPLIT_ID
from streamforge_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_persisted_index_gate_matches_inline_query(spark, tmp_path):
    # write the established-corpus index to parquet, read it back, run
    # the from-index ingest gate — must equal the inline query (which
    # recomputes the index only because fixtures have no cross-run
    # state) row for row
    docs = load(spark, SF, "documents")
    ref = docs.where(F.col("doc_id") < XS_SPLIT_ID)
    new = docs.where(F.col("doc_id") >= XS_SPLIT_ID)
    path = str(tmp_path / "xs_index")
    write_substring_index(ref, path, XS_K)
    idx = read_substring_index(spark, path)
    got = {r.doc_id: (r.n_dup_spans, r.dup_chars, r.dup_char_ppm)
           for r in contamination_from_index(new, idx, XS_K).collect()}
    want = {r.doc_id: (r.n_dup_spans, r.dup_chars, r.dup_char_ppm)
            for r in QUERIES["incremental_substring_contamination"](
                spark, SF).collect()}
    assert got == want and any(v[0] > 0 for v in want.values())


def test_merge_index_equals_full_rebuild(spark):
    # min/max are associative: folding the new batch into the old
    # index is exactly a rebuild over the full corpus
    docs = load(spark, SF, "documents")
    ref = docs.where(F.col("doc_id") < XS_SPLIT_ID)
    new = docs.where(F.col("doc_id") >= XS_SPLIT_ID)
    old_idx = substring_index(window_hashes(ref, XS_K))
    merged = {(r.h): (r.mn, r.mx)
              for r in merge_substring_index(old_idx, new, XS_K).collect()}
    full = {(r.h): (r.mn, r.mx)
            for r in substring_index(window_hashes(docs, XS_K)).collect()}
    assert merged == full and len(full) > 1000


def test_index_is_distinct_per_hash(spark):
    docs = load(spark, SF, "documents")
    idx = substring_index(window_hashes(docs, XS_K))
    n = idx.count()
    assert idx.select("h").distinct().count() == n
    assert idx.where(F.col("mn") > F.col("mx")).count() == 0
