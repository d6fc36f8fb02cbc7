"""Data-governance queries: privacy-preserving aggregate release and
canary-based memorization/leakage probing.

These complete the privacy surface started in queries.curation
(pii_scrub, k_anonymity_audit): k-anonymity audits the raw groups,
``dp_noisy_release`` produces the group counts you could actually
publish, and ``canary_probe_report`` measures whether marker strings
planted in (or extracted from) the corpus propagate to other
documents — the standard pre-training leakage probe (Carlini et al.
2019, "The Secret Sharer": plant canaries, measure exposure).

Engine-exactness: every stochastic choice is the repo's standard
seeded :func:`~streamforge_spark.functions.simdedup.oracle_hash60`
coin, all arithmetic is BIGINT (the DP noise is an integer offset), so
both queries carry exact value-hash oracles.

Reference parity anchor: the reference's quality surface is schema/
constraint enforcement (SchemaEnforcer.java, ConstraintEnforcer.java);
it has no privacy-release or leakage-probe analog — these are
LLM-pipeline surplus capabilities (SURVEY.md §2.14).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from streamforge_spark.functions.simdedup import hash60_sql, oracle_hash60
from streamforge_spark.queries.common import prep
from streamforge_spark.registry import query

# -- differentially-private-style noisy count release ---------------------

#: noise bound B: per-group additive noise is uniform on [-B, +B].
DP_NOISE_BOUND = 5
DP_SEED = "dp-v1"

_DP_ORACLE = f"""
WITH g AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY source, lang),
z AS (
  SELECT source, lang, n_docs,
         {hash60_sql("source || ':' || lang", f"'{DP_SEED}'")}
           % {2 * DP_NOISE_BOUND + 1} - {DP_NOISE_BOUND} AS noise
  FROM g)
SELECT source, lang, n_docs, noise,
       greatest(n_docs + noise, 0) AS released_count
FROM z
"""


@query("dp_noisy_release", oracle=_DP_ORACLE)
def dp_noisy_release(spark, sf_dir):
    """Noisy aggregate release for the (source, lang) count table: each
    group's true count gets an additive integer noise term drawn from
    a SEEDED uniform distribution on [-B, +B] (B = ``DP_NOISE_BOUND``),
    clamped at zero — the release shape of a discrete-Laplace /
    geometric DP mechanism, with the seeded-hash draw standing in for
    the sampled noise so the release is reproducible and oracle-exact
    (a production deployment swaps the coin for calibrated geometric
    noise at eps = sensitivity/B; count queries have sensitivity 1).
    True count and noise are retained here for auditability; the
    publishable projection is (source, lang, released_count).

    All integer: hash60 is non-negative, so ``% (2B+1) - B`` is the
    same uniform integer draw on both engines; the clamp is
    ``greatest``. No division anywhere.

    Scale shape: ONE map-side-combined rollup to |source x lang| rows
    (text never moves); noise is a scan-side projection of the group
    key. Reference anchor: no analog (privacy-release surplus;
    SURVEY.md §2.14)."""
    (docs,) = prep(spark, sf_dir, "documents")
    g = (docs.groupBy("source", "lang")
         .agg(F.count(F.lit(1)).alias("n_docs")))
    noise = (oracle_hash60(
        F.concat(F.col("source"), F.lit(":"), F.col("lang")),
        salt=DP_SEED) % (2 * DP_NOISE_BOUND + 1)
        - DP_NOISE_BOUND)
    return (g.withColumn("noise", noise)
            .withColumn("released_count",
                        F.greatest(F.col("n_docs") + F.col("noise"),
                                   F.lit(0))))


# -- canary leakage probe --------------------------------------------------

CANARY_SEED = "canary-v1"
CANARY_MOD = 25       # ~1/25 of long-enough docs become canary donors
CANARY_MIN_CHARS = 80
CANARY_OFFSET = 21    # 1-based char offset of the extracted marker
CANARY_LEN = 40

_CANARY_ORACLE = f"""
WITH can AS (
  SELECT doc_id AS canary_id, substr(text, {CANARY_OFFSET}, {CANARY_LEN})
           AS canary
  FROM documents
  WHERE n_chars >= {CANARY_MIN_CHARS}
    AND {hash60_sql("CAST(doc_id AS VARCHAR)", f"'{CANARY_SEED}'")}
          % {CANARY_MOD} = 0)
SELECT c.canary_id, c.canary,
       CAST(count(*) AS BIGINT) AS n_hits,
       CAST(count(*) - 1 AS BIGINT) AS extraneous_hits
FROM can c JOIN documents d ON contains(d.text, c.canary)
GROUP BY c.canary_id, c.canary
"""


@query("canary_probe_report", oracle=_CANARY_ORACLE)
def canary_probe_report(spark, sf_dir):
    """Canary leakage probe (Carlini et al. 2019): extract a
    fixed-position 40-char marker from a seeded ~1/25 sample of
    long-enough documents, then count how many corpus documents
    contain each marker verbatim. The donor always matches itself, so
    ``extraneous_hits`` = matches beyond the donor — nonzero means the
    marker text propagated (mirror sites, quotations, template reuse:
    exactly the duplication that turns into verbatim memorization),
    and the same scan run against a CANDIDATE corpus before training
    answers "did our planted canaries leak into the crawl".

    Scale shape: the canary side is a seeded sample of bounded size
    (|docs|/25 markers, 40 chars each — broadcastable at any corpus
    scale where the probe is sane); the containment join is ONE
    broadcast nested-loop pass over the corpus scan (substring match
    per (doc, canary) pair — the same bounded-small-side BNLJ pattern
    the adjudicated scalar broadcasts use), followed by a map-side-
    combined rollup to |canaries| rows. No shuffle of document text.
    For canary sets too large to broadcast, exact_substring_spans'
    shingle-index path is the escalation. Reference anchor: no analog
    (leakage-probe surplus; SURVEY.md §2.14)."""
    (docs,) = prep(spark, sf_dir, "documents")
    donors = (docs
              .filter((F.col("n_chars") >= CANARY_MIN_CHARS)
                      & (oracle_hash60(F.col("doc_id").cast("string"),
                                       salt=CANARY_SEED)
                         % CANARY_MOD == 0))
              .select(F.col("doc_id").alias("canary_id"),
                      F.substring("text", CANARY_OFFSET, CANARY_LEN)
                      .alias("canary")))
    hits = docs.join(F.broadcast(donors),
                     F.contains(F.col("text"), F.col("canary")))
    return (hits.groupBy("canary_id", "canary")
            .agg(F.count(F.lit(1)).alias("n_hits"),
                 (F.count(F.lit(1)) - F.lit(1)).alias("extraneous_hits")))
