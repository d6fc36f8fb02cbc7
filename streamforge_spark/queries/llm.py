"""LLM-training-data-pipeline queries: MinHash/SimHash dedup, LSH ANN,
multimodal columns. Entries without an oracle are genuinely
non-SQL-expressible (LSH recall differs from the exact baseline by
construction) and get the driver's rows-only check."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamforge_spark.functions.simdedup import minhash_lsh_pairs, simhash, simhash_near_dup
from streamforge_spark.functions.similarity import ann_ivf_topk, ann_lsh_topk
from streamforge_spark.multimodal import (
    decode_media, extract_features, media_from_documents, sample_frames,
)
from streamforge_spark.queries.common import prep
from streamforge_spark.registry import query


@query("dedup_minhash_lsh")
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash(32 perms) + LSH(8 bands) near-dup pairs, verified with
    exact Jaccard on the surviving candidates. The scale path of
    dedup_ngram_jaccard: pair space pruned to band collisions."""
    (docs,) = prep(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, threshold=0.2)


@query("simhash_fingerprint")
def simhash_fingerprint(spark, sf_dir):
    """64-bit SimHash document fingerprints (term-count weighted)."""
    (docs,) = prep(spark, sf_dir, "documents")
    return simhash(docs)


@query("simhash_near_dup")
def simhash_near_dup_q(spark, sf_dir):
    """SimHash near-dup pairs within Hamming distance 8, banded on
    16-bit blocks."""
    (docs,) = prep(spark, sf_dir, "documents")
    return simhash_near_dup(docs, max_hamming=8)


@query("ann_lsh_topk")
def ann_lsh_topk_q(spark, sf_dir):
    """Random-hyperplane LSH ANN top-k (approximate counterpart of
    ann_cosine_topk; rows-only check — recall < 1 by construction)."""
    (emb,) = prep(spark, sf_dir, "embeddings")
    return ann_lsh_topk(emb, query_ids=range(10), k=10)


@query("ann_ivf_topk")
def ann_ivf_topk_q(spark, sf_dir):
    """IVF coarse-quantizer ANN top-k: bounded-sample spherical k-means
    cells + nprobe probing (the trained-index counterpart of
    ann_lsh_topk; rows-only check — recall < 1 by construction)."""
    (emb,) = prep(spark, sf_dir, "embeddings")
    return ann_ivf_topk(emb, query_ids=range(10), k=10)


@query(
    "multimodal_decode",
    oracle="""
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(octet_length(encode(text)) % 1024 AS INTEGER) AS width,
       CAST(octet_length(encode(text)) % 768 AS INTEGER) AS height,
       md5(text) AS checksum
FROM documents
""",
)
def multimodal_decode(spark, sf_dir):
    """Multimodal decode plumbing: binary payload -> typed metadata via
    Arrow-batched mapInPandas (deterministic stand-in codec; the real
    codec slots into the same stage — see multimodal.decode_media)."""
    (docs,) = prep(spark, sf_dir, "documents")
    media = media_from_documents(docs)
    return decode_media(media, fake=True)


@query("multimodal_features")
def multimodal_features(spark, sf_dir):
    """Feature extraction (embedding-model slot) over mapInPandas:
    binary -> fixed-dim double vector; deterministic stand-in model."""
    (docs,) = prep(spark, sf_dir, "documents")
    media = media_from_documents(docs)
    return extract_features(media)


@query(
    "multimodal_frame_sample",
    oracle="""
WITH n AS (SELECT doc_id AS media_id, octet_length(encode(text)) AS nb FROM documents)
SELECT media_id, CAST(unnest(generate_series(0, CAST(CEIL(nb / 64.0) AS BIGINT) - 1)) AS INTEGER) AS frame_idx
FROM n
""",
)
def multimodal_frame_sample(spark, sf_dir):
    """Frame sampling (1 media row -> N frame rows) over mapInPandas;
    oracle checks the expansion shape (media_id, frame_idx)."""
    (docs,) = prep(spark, sf_dir, "documents")
    media = media_from_documents(docs)
    return sample_frames(media, every_n_bytes=64).select("media_id", "frame_idx")


@query(
    "multimodal_resize",
    oracle="""
SELECT doc_id AS media_id,
       CAST(GREATEST(CAST(FLOOR(octet_length(encode(text)) * ((224.0 * 224.0) / (1024.0 * 768.0))) AS BIGINT), 1) AS BIGINT) AS n_bytes,
       CAST(224 AS INTEGER) AS width,
       CAST(224 AS INTEGER) AS height
FROM documents
""",
)
def multimodal_resize(spark, sf_dir):
    """Resize stage (downscale to 224x224 model input) over
    mapInPandas; the oracle checks the proportional payload shrinkage
    the deterministic stand-in applies. Resize-early ordering: every
    stage after this shuffles ~6% of the original bytes."""
    from streamforge_spark.multimodal import resize_media
    (docs,) = prep(spark, sf_dir, "documents")
    media = media_from_documents(docs)
    out = resize_media(media, 224, 224, fake=True)
    return out.select("media_id",
                      F.length("payload").cast("long").alias("n_bytes"),
                      "width", "height")
