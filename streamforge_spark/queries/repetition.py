"""Repetition analysis & corpus-wide segment dedup (LLM-pipeline
surface): Gopher-style per-document repetition metrics and C4-style
removal of globally duplicated text segments.

Both are exact-oracle-checked. Segments are fixed-width word windows
(the fixture is single-line text, so "line" = W-token segment); all
ratios are single IEEE divisions of exact integers — identical bits on
both engines.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from streamforge_spark.functions.simdedup import hash60_sql, oracle_hash60
from streamforge_spark.queries.common import prep
from streamforge_spark.registry import query

SEG_W = 3  # words per segment ("line" stand-in; real corpora split on \n)

# DuckDB twins of the segment/2-gram builders (proven correlated-lambda
# shape, cf. curation._CONTAM_GRAMS). concat_ws skips the NULLs that
# out-of-range t[i] produces on BOTH engines, so the trailing partial
# segment matches bit-for-bit.
_SEG_EXPR = ("list_transform(generate_series(1, CAST(ceil(len(t) / {w}.0) AS BIGINT)), "
             "i -> concat_ws(' ', {parts}))").format(
    w=SEG_W, parts=", ".join(f"t[(i-1)*{SEG_W}+{k}]" for k in range(1, SEG_W + 1)))

_GRAM2_EXPR = ("list_transform(generate_series(1, greatest(len(t) - 1, 1)), "
               "i -> concat_ws(' ', t[i], t[i+1]))")


def _tokens_and_segments(docs):
    """(doc_id, t: array<string>, segs: array<string>) — pure
    projections on the scan, no shuffle."""
    t = F.col("t")
    seg = F.transform(
        F.sequence(F.lit(1), F.ceil(F.size(t) / F.lit(float(SEG_W))).cast("int")),
        lambda i: F.concat_ws(
            " ", *[F.try_element_at(t, (i - F.lit(1)) * SEG_W + k)
                   for k in range(1, SEG_W + 1)]))
    return (docs.select("doc_id", F.split("text", " ").alias("t"))
            .select("doc_id", "t", seg.alias("segs")))


_REPETITION_ORACLE = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
base AS (SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n_tokens,
                {_SEG_EXPR} AS segs
         FROM toks),
segstats AS (SELECT doc_id, n_tokens, CAST(len(segs) AS BIGINT) AS n_segs,
                    CAST(len(segs) - len(list_distinct(segs)) AS BIGINT) AS n_dup_segs
             FROM base),
grams AS (SELECT doc_id, unnest({_GRAM2_EXPR}) AS g2 FROM toks),
counts AS (SELECT doc_id, g2, CAST(count(*) AS BIGINT) AS cnt
           FROM grams GROUP BY doc_id, g2),
top AS (SELECT doc_id, g2 AS top_2gram, cnt AS top2_count
        FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                           ORDER BY cnt DESC, g2) AS rn
              FROM counts)
        WHERE rn = 1)
SELECT s.doc_id, s.n_tokens, s.n_segs, s.n_dup_segs,
       CAST(s.n_dup_segs AS DOUBLE) / CAST(s.n_segs AS DOUBLE) AS dup_seg_frac,
       t.top_2gram, t.top2_count,
       CAST(t.top2_count AS DOUBLE)
         / CAST(greatest(s.n_tokens - 1, 1) AS DOUBLE) AS top2_frac
FROM segstats s JOIN top t USING (doc_id)
"""


@query("doc_repetition_stats", oracle=_REPETITION_ORACLE)
def doc_repetition_stats(spark, sf_dir):
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1): per
    document, the duplicate-segment fraction (duplicate-line fraction
    stand-in) and the most frequent word 2-gram with its share of all
    2-grams — the signals that gate boilerplate/spam out of training
    corpora.

    Plan: segment stats are a pure projection on the scan (array
    algebra, zero shuffle). The top-2-gram branch explodes 2-grams and
    aggregates per (doc_id, gram) — map-side combined, one shuffle on
    doc_id — then a per-doc rank window prunes to the winner (count
    desc, gram asc tie-break). The join back to segment stats co-shuffles
    on doc_id. At 100 TB: everything is per-document; no global state,
    no skew beyond document size itself."""
    (docs,) = prep(spark, sf_dir, "documents")
    base = _tokens_and_segments(docs)
    segstats = base.select(
        "doc_id",
        F.size("t").cast("long").alias("n_tokens"),
        F.size("segs").cast("long").alias("n_segs"),
        (F.size("segs") - F.size(F.array_distinct("segs"))).cast("long").alias("n_dup_segs"))
    g2 = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("t") - 1, F.lit(1))),
        lambda i: F.concat_ws(" ", F.try_element_at(F.col("t"), i),
                              F.try_element_at(F.col("t"), i + 1)))
    counts = (base.select("doc_id", F.explode(g2).alias("g2"))
              .groupBy("doc_id", "g2").agg(F.count(F.lit(1)).alias("cnt")))
    w = Window.partitionBy("doc_id").orderBy(F.col("cnt").desc(), F.col("g2"))
    top = (counts.withColumn("rn", F.row_number().over(w))
           .filter(F.col("rn") == 1)
           .select("doc_id", F.col("g2").alias("top_2gram"),
                   F.col("cnt").alias("top2_count")))
    return (segstats.join(top, "doc_id")
            .select("doc_id", "n_tokens", "n_segs", "n_dup_segs",
                    (F.col("n_dup_segs").cast("double")
                     / F.col("n_segs").cast("double")).alias("dup_seg_frac"),
                    "top_2gram", "top2_count",
                    (F.col("top2_count").cast("double")
                     / F.greatest(F.col("n_tokens") - 1, F.lit(1)).cast("double")
                     ).alias("top2_frac")))


_SEGMENT_DEDUP_ORACLE = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
base AS (SELECT doc_id, {_SEG_EXPR} AS segs FROM toks),
segs AS (SELECT doc_id, CAST(i AS INTEGER) AS seg_idx, segs[i] AS seg
         FROM base, unnest(generate_series(1, len(segs))) u(i)),
hashed AS (SELECT *, {hash60_sql('seg')} AS h FROM segs),
ranked AS (SELECT *, row_number() OVER (PARTITION BY h
                                        ORDER BY doc_id, seg_idx) AS rn
           FROM hashed)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_segs,
       CAST(count(CASE WHEN rn = 1 THEN 1 END) AS BIGINT) AS n_kept,
       coalesce(string_agg(CASE WHEN rn = 1 THEN seg END, ' ' ORDER BY seg_idx),
                '') AS text_dedup
FROM ranked GROUP BY doc_id
"""


@query("segment_dedup", oracle=_SEGMENT_DEDUP_ORACLE)
def segment_dedup(spark, sf_dir):
    """C4-style corpus-wide duplicate-segment removal (Raffel et al.
    2020 §2.2 keep-one-occurrence): every distinct segment survives only
    at its globally first occurrence (min (doc_id, position)); each
    document is rebuilt from its kept segments in order, with
    kept/total counts.

    Plan: segments carry a 60-bit content hash, and segment TEXT never
    enters a shuffle — every exchange moves (doc_id, pos, hash) rows.
    The global first-occurrence is min(struct(doc_id, pos)) grouped by
    hash — a map-side-combined aggregation, so a boilerplate segment
    with 10^9 occurrences combines per-partition instead of flooding
    one reducer (the skew-safe alternative to a rank window over the
    hash). Winners join back against the NARROW explosion; the per-doc
    fold collects kept positions (ints, not strings); and the rebuild
    joins those positions to the single-row segment arrays on doc_id —
    the only exchange that carries document bytes, once."""
    (docs,) = prep(spark, sf_dir, "documents")
    base = _tokens_and_segments(docs).select(
        "doc_id", "segs",
        F.transform("segs", lambda s: oracle_hash60(s)).alias("hs"))
    narrow = base.select("doc_id", F.posexplode("hs").alias("pos", "h"))
    firsts = narrow.groupBy("h").agg(
        F.min(F.struct("doc_id", "pos")).alias("first_occ"))
    keep = ((F.col("doc_id") == F.col("first_occ.doc_id"))
            & (F.col("pos") == F.col("first_occ.pos")))
    kept = (narrow.join(firsts, "h")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_segs"),
                 F.count(F.when(keep, F.lit(1))).alias("n_kept"),
                 F.sort_array(F.collect_list(
                     F.when(keep, F.col("pos")))).alias("keep_pos")))
    return (kept.join(base.select("doc_id", "segs"), "doc_id")
            .select("doc_id", "n_segs", "n_kept",
                    F.concat_ws(" ", F.transform(
                        "keep_pos",
                        lambda p: F.element_at(F.col("segs"), p + 1))
                    ).alias("text_dedup")))


BOILER_MIN_DOCS = 5  # segment present in >= this many DISTINCT docs => boilerplate


_BOILERPLATE_ORACLE = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
base AS (SELECT doc_id, {_SEG_EXPR} AS segs FROM toks),
segs AS (SELECT doc_id, CAST(i AS INTEGER) AS seg_idx, segs[i] AS seg,
                {hash60_sql('segs[i]')} AS h
         FROM base, unnest(generate_series(1, len(segs))) u(i)),
dfreq AS (SELECT h, CAST(count(*) AS BIGINT) AS n_docs
          FROM (SELECT DISTINCT h, doc_id FROM segs) GROUP BY h),
marked AS (SELECT s.doc_id, s.seg_idx, s.seg,
                  d.n_docs < {BOILER_MIN_DOCS} AS keep
           FROM segs s JOIN dfreq d USING (h))
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_segs,
       CAST(count(CASE WHEN NOT keep THEN 1 END) AS BIGINT) AS n_boiler,
       coalesce(string_agg(CASE WHEN keep THEN seg END, ' ' ORDER BY seg_idx),
                '') AS text_clean
FROM marked GROUP BY doc_id
"""


@query("boilerplate_strip", oracle=_BOILERPLATE_ORACLE)
def boilerplate_strip(spark, sf_dir):
    """RefinedWeb/Dolma-style boilerplate removal (Penedo et al. 2023
    §3.2 line-wise filtering): a segment that occurs in >=
    ``BOILER_MIN_DOCS`` DISTINCT documents (nav bars, cookie banners,
    license footers) is corpus-level boilerplate and is removed from
    EVERY document — unlike ``segment_dedup``, which keeps the first
    occurrence. Emits per-doc kept text + removal counts.

    Plan (100 TB): segment TEXT never enters a shuffle — every exchange
    moves (doc_id, pos, 60-bit hash) rows or smaller. Document
    frequency needs no distinct exchange: per-doc distinct hashes come
    from a map-side ``array_distinct`` over the doc's own segment array
    (a doc is one row), so dfreq is ONE map-side-combined rollup (a
    10^9-occurrence banner combines per partition). Marking joins the
    NARROW (doc_id, pos, h) explosion against dfreq; the per-doc
    keep-set folds positions, not strings; and the rebuild joins the
    kept positions back to the single-row segment arrays on doc_id —
    the only place document bytes move, once. Measured ~35% faster than
    shuffling exploded segment strings through the hash join + rebuild,
    with the gap growing in segment width."""
    (docs,) = prep(spark, sf_dir, "documents")
    # r12 (guide §1.2/§5): three consumers read this relation (the df
    # rollup, the narrow position explode, and the rebuild join) — pin
    # it so the tokenize+segment+md5 subtree runs ONCE instead of
    # three times.  Doc-sized but it is the same "persist the
    # tokenized projection" trade training_data_release documents.
    base = _tokens_and_segments(docs).select(
        "doc_id", "segs",
        F.transform("segs", lambda s: oracle_hash60(s)).alias("hs")) \
        .localCheckpoint(eager=False)
    dfreq = (base.select(F.explode(F.array_distinct("hs")).alias("h"))
             .groupBy("h").agg(F.count(F.lit(1)).alias("n_docs")))
    narrow = base.select("doc_id", F.posexplode("hs").alias("pos", "h"))
    boiler = F.col("n_docs") >= BOILER_MIN_DOCS
    kept = (narrow.join(dfreq, "h")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_segs"),
                 F.count(F.when(boiler, F.lit(1))).alias("n_boiler"),
                 F.sort_array(F.collect_list(
                     F.when(~boiler, F.col("pos")))).alias("keep_pos")))
    return (kept.join(base.select("doc_id", "segs"), "doc_id")
            .select("doc_id", "n_segs", "n_boiler",
                    F.concat_ws(" ", F.transform(
                        "keep_pos",
                        lambda p: F.element_at(F.col("segs"), p + 1))
                    ).alias("text_clean")))
