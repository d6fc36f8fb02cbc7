"""Training-run planning queries: epoch/repeat budgeting under
data-constrained scaling, quality-staged curriculum ordering, and the
vocabulary-size design curve.

These sit one level above the curation/mixing ops (queries.curation):
curation decides WHICH documents enter the corpus; these decide how a
training run CONSUMES it — how many epochs each source repeats under a
token budget, in what order the documents are fed, and how large a
tokenizer vocabulary the corpus actually needs.

Engine-exactness follows the repo's standard coins: whitespace token
counts, :func:`~streamforge_spark.functions.simdedup.oracle_hash60`
for every sampling/ordering decision, and integer ppm arithmetic with
``div`` / ``//`` (all operands non-negative, so Spark's truncating div
and DuckDB's floor ``//`` agree). The one float op is the same
IEEE-correctly-rounded ``sqrt`` round-trip mixture_temperature_weights
already pinned.

Reference parity anchor: the reference exposes stream shaping /
routing, not training-run planning (no analog under src/main — see
SURVEY.md §2.14 surplus); these are LLM-pipeline surplus capabilities
in the same exact-oracle discipline.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from streamforge_spark.functions.simdedup import hash60_sql, oracle_hash60
from streamforge_spark.functions.text import punct_count, token_count, tokens
from streamforge_spark.queries.common import prep
from streamforge_spark.registry import query

# -- epoch/repeat planner (data-constrained scaling) ---------------------

#: training budget as a multiple of the corpus's total token count —
#: 8x puts the plan firmly in the repetition regime (every source
#: repeats; the skewed ones blow past the R* cap) at any SF.
EPOCH_BUDGET_MULT = 8
#: epochs beyond which repeated tokens are ~worthless (Muennighoff et
#: al. 2023, "Scaling Data-Constrained Language Models": returns decay
#: rapidly past ~4 repetitions).
EPOCH_RSTAR = 4

_EPOCH_PLAN_ORACLE = f"""
WITH src AS (
  SELECT source,
         CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT)
           AS n_tokens
  FROM documents GROUP BY source),
tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) * {EPOCH_BUDGET_MULT} AS budget
        FROM src),
w AS (
  SELECT source, n_tokens,
         CAST(ROUND(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000) AS BIGINT)
           AS w_micro
  FROM src),
ws AS (SELECT CAST(SUM(w_micro) AS BIGINT) AS wsum FROM w),
q AS (
  SELECT source, n_tokens,
         (budget * w_micro) // wsum AS quota_tokens
  FROM w CROSS JOIN tot CROSS JOIN ws),
e AS (
  SELECT source, n_tokens, quota_tokens,
         (quota_tokens * 1000000) // n_tokens AS epochs_ppm,
         greatest(quota_tokens - {EPOCH_RSTAR} * n_tokens, 0) AS excess_tokens,
         greatest({EPOCH_RSTAR} * n_tokens - quota_tokens, 0)
           AS headroom_tokens
  FROM q),
p AS (SELECT CAST(SUM(excess_tokens) AS BIGINT) AS pool,
             CAST(SUM(headroom_tokens) AS BIGINT) AS headroom_total
      FROM e),
r AS (
  SELECT e.*,
         CASE WHEN headroom_total > 0
              THEN least(headroom_tokens,
                         (pool * headroom_tokens) // headroom_total)
              ELSE 0 END AS realloc_tokens
  FROM e CROSS JOIN p)
SELECT source, n_tokens, quota_tokens, epochs_ppm, excess_tokens,
       headroom_tokens, realloc_tokens,
       quota_tokens - excess_tokens + realloc_tokens AS final_quota_tokens,
       ((quota_tokens - excess_tokens + realloc_tokens) * 1000000)
         // n_tokens AS final_epochs_ppm
FROM r
"""


@query("epoch_repeat_plan", oracle=_EPOCH_PLAN_ORACLE)
def epoch_repeat_plan(spark, sf_dir):
    """Data-constrained epoch planner (Muennighoff et al. 2023): given
    a training budget of ``EPOCH_BUDGET_MULT``x the corpus's tokens
    and sqrt-temperature mixture quotas (the mixture_temperature_weights
    coin), report how many epochs each source would repeat, cap every
    source at R*=4 epochs (tokens past ~4 repetitions are near-
    worthless), and redistribute the freed budget to under-cap sources
    proportional to their remaining headroom (one greedy pass, each
    grant capped at the recipient's headroom).

    All integer: quotas/epochs are ppm integer division on BIGINT
    token counts; the only float is the sqrt->round micro-weight
    already pinned by mixture_temperature_weights. At a 10^14-token
    budget the ``budget * w_micro`` product moves to decimal(38,0) on
    both engines; BIGINT holds to ~10^12.

    Scale shape: ONE map-side-combined rollup of the scan to |sources|
    rows (document text never shuffles); everything after — budget,
    weight normalization, cap, redistribution pool — is scalar
    cross-join algebra on that tiny relation. Reference anchor: no
    analog (training-plan surplus; SURVEY.md §2.14)."""
    (docs,) = prep(spark, sf_dir, "documents")
    src = (docs.groupBy("source")
           .agg(F.sum(token_count(F.col("text"))).alias("n_tokens")))
    tot = src.agg((F.sum("n_tokens") * EPOCH_BUDGET_MULT).alias("budget"))
    w = src.withColumn(
        "w_micro",
        F.round(F.sqrt(F.col("n_tokens").cast("double")) * 1000000)
        .cast("long"))
    ws = w.agg(F.sum("w_micro").alias("wsum"))
    q = (w.crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(ws))
         .select("source", "n_tokens",
                 F.expr("(budget * w_micro) div wsum").alias("quota_tokens")))
    e = q.select(
        "source", "n_tokens", "quota_tokens",
        F.expr("(quota_tokens * 1000000) div n_tokens").alias("epochs_ppm"),
        F.greatest(F.col("quota_tokens") - EPOCH_RSTAR * F.col("n_tokens"),
                   F.lit(0)).alias("excess_tokens"),
        F.greatest(EPOCH_RSTAR * F.col("n_tokens") - F.col("quota_tokens"),
                   F.lit(0)).alias("headroom_tokens"))
    p = e.agg(F.sum("excess_tokens").alias("pool"),
              F.sum("headroom_tokens").alias("headroom_total"))
    r = (e.crossJoin(F.broadcast(p))
         .withColumn(
             "realloc_tokens",
             F.when(F.col("headroom_total") > 0,
                    F.least(F.col("headroom_tokens"),
                            F.expr("(pool * headroom_tokens)"
                                   " div headroom_total")))
             .otherwise(F.lit(0))))
    final_quota = (F.col("quota_tokens") - F.col("excess_tokens")
                   + F.col("realloc_tokens"))
    return r.select(
        "source", "n_tokens", "quota_tokens", "epochs_ppm", "excess_tokens",
        "headroom_tokens", "realloc_tokens",
        final_quota.alias("final_quota_tokens"),
        F.expr("((quota_tokens - excess_tokens + realloc_tokens) * 1000000)"
               " div n_tokens").alias("final_epochs_ppm"))


# -- quality-staged curriculum ordering ----------------------------------

CURRICULUM_STAGES = 4
CURRICULUM_SEED = "curriculum-v1"

#: integer-ppm twin of functions.text.quality_score (same 0.4 length /
#: 0.3 punctuation / 0.3 token-count weights, ppm instead of float so
#: stage boundaries are engine-exact).
_SCORE_PPM_SQL = """
(4 * least(1000000, (n_chars * 1000000) // 500)
 + 3 * (1000000 - CASE WHEN n_chars > 0
                       THEN (n_punct * 1000000) // n_chars
                       ELSE 0 END)
 + 3 * least(1000000, (n_tokens * 1000000) // 100)) // 10
"""

_CURRICULUM_ORACLE = f"""
WITH s AS (
  SELECT doc_id, n_chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
              AS BIGINT) AS n_punct
  FROM documents),
sc AS (SELECT doc_id, {_SCORE_PPM_SQL} AS score_ppm FROM s)
SELECT doc_id, score_ppm,
       CAST((score_ppm * {CURRICULUM_STAGES}) // 1000001 AS INTEGER) AS stage,
       CAST(row_number() OVER (
         PARTITION BY (score_ppm * {CURRICULUM_STAGES}) // 1000001
         ORDER BY {hash60_sql("CAST(doc_id AS VARCHAR)",
                              f"'{CURRICULUM_SEED}'")}, doc_id)
            AS BIGINT) AS pos
FROM sc
"""


@query("curriculum_schedule", oracle=_CURRICULUM_ORACLE)
def curriculum_schedule(spark, sf_dir):
    """Quality-staged curriculum order: every document gets a
    reproducible (stage, position) where stage is its quality band
    (integer-ppm twin of functions.text.quality_score, fixed ppm
    thresholds -> CURRICULUM_STAGES ascending-quality bands) and
    position is a seeded-hash shuffle WITHIN the stage — the
    low-quality-first / highest-quality-last annealing order
    curriculum pretraining uses, reproducible across runs like
    corpus_shuffle_order.

    Deliberately NOT data-dependent quantiles: a global ntile needs a
    full sort (or a distribution pass) over the corpus; fixed score
    thresholds on a bounded [0, 1e6] integer score make the stage a
    pure scan-side projection — the production choice at 100 TB, and
    stage populations stay auditable via a trivial rollup.

    Scale shape: score + stage are zero-shuffle projections; the only
    exchange is the hash partition on stage for the within-stage rank
    window, and each of the CURRICULUM_STAGES partitions sorts
    (hash60, doc_id) pairs independently — never a global sort, never
    document text. Reference anchor: no analog (training-plan
    surplus; SURVEY.md §2.14)."""
    (docs,) = prep(spark, sf_dir, "documents")
    t = F.col("text")
    s = docs.select(
        "doc_id", "n_chars",
        token_count(t).alias("n_tokens"),
        punct_count(t).alias("n_punct"))
    sc = s.select(
        "doc_id",
        F.expr(_SCORE_PPM_SQL.replace("//", "div")).alias("score_ppm"))
    staged = sc.withColumn(
        "stage",
        F.expr(f"(score_ppm * {CURRICULUM_STAGES}) div 1000001").cast("int"))
    h = oracle_hash60(F.col("doc_id").cast("string"), salt=CURRICULUM_SEED)
    w = Window.partitionBy("stage").orderBy(h, "doc_id")
    return staged.select(
        "doc_id", "score_ppm", "stage",
        F.row_number().over(w).cast("long").alias("pos"))


# -- vocabulary-size design curve ----------------------------------------

VOCAB_CURVE_SIZES = (64, 256, 1024, 4096)

_VOCAB_CURVE_ORACLE = f"""
WITH toks AS (SELECT unnest(string_split(text, ' ')) AS token
              FROM documents),
freq AS (SELECT token, CAST(count(*) AS BIGINT) AS c
         FROM toks GROUP BY token),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM freq),
ranked AS (SELECT c, row_number() OVER (ORDER BY c DESC, token) AS rn
           FROM freq),
sizes(vocab_size) AS (VALUES {", ".join(f"({v})" for v in VOCAB_CURVE_SIZES)})
SELECT CAST(vocab_size AS INTEGER) AS vocab_size,
       CAST(SUM(c) AS BIGINT) AS covered_tokens,
       total AS total_tokens,
       (CAST(SUM(c) AS BIGINT) * 1000000) // total AS coverage_ppm
FROM ranked JOIN sizes ON rn <= vocab_size CROSS JOIN tot
GROUP BY vocab_size, total
"""


@query("vocab_coverage_curve", oracle=_VOCAB_CURVE_ORACLE)
def vocab_coverage_curve(spark, sf_dir):
    """Vocabulary-size design curve: for each candidate vocabulary
    size V, the fraction (ppm) of ALL corpus token occurrences covered
    by the V most frequent token types — the curve that decides how
    large a tokenizer vocabulary the corpus needs before BPE training
    (vocab_oov_rate answers the converse question for a FIXED vocab).
    Ties rank deterministically by (count desc, token).

    Scale shape: the token-frequency rollup is the one real shuffle
    (map-side-combined word count; token text moves once, documents
    never). The top-max(V) types come from orderBy().limit() — Spark's
    distributed TakeOrderedAndProject, each partition contributing at
    most max(V) rows — NOT a global sort of the 10^8-type vocabulary.
    Ranking then runs on the bounded max(V)-row relation (single
    partition of 4096 rows), and the per-V rollup is a broadcast
    theta-join against the |sizes| literal rows. Reference anchor: no
    analog (tokenizer-design surplus; SURVEY.md §2.14)."""
    (docs,) = prep(spark, sf_dir, "documents")
    freq = (docs.select(F.explode(tokens(F.col("text"))).alias("token"))
            .groupBy("token").agg(F.count(F.lit(1)).alias("c")))
    tot = freq.agg(F.sum("c").alias("total"))
    vmax = max(VOCAB_CURVE_SIZES)
    top = freq.orderBy(F.desc("c"), "token").limit(vmax)
    ranked = top.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.desc("c"), "token")))
    sizes = F.broadcast(
        docs.sparkSession.createDataFrame(
            [(v,) for v in VOCAB_CURVE_SIZES], "vocab_size int"))
    return (ranked.join(sizes, F.col("rn") <= F.col("vocab_size"))
            .groupBy("vocab_size")
            .agg(F.sum("c").alias("covered_tokens"))
            .crossJoin(F.broadcast(tot))
            .select("vocab_size", "covered_tokens",
                    F.col("total").alias("total_tokens"),
                    F.expr("(covered_tokens * 1000000) div total")
                    .alias("coverage_ppm")))
