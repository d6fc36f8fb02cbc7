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

_SHARD_COUNT = 16
_SHARD_SEED = "shard-v1"

_SHARD_BALANCE_ORACLE = f"""
WITH d AS (
  SELECT CAST({hash60_sql("CAST(doc_id AS VARCHAR)", f"'{_SHARD_SEED}'")}
              % {_SHARD_COUNT} AS INTEGER) AS shard,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents),
tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM d)
SELECT shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
       (CAST(SUM(n_tokens) AS BIGINT) * 1000000) // total AS share_ppm,
       (CAST(SUM(n_tokens) AS BIGINT) * {_SHARD_COUNT} * 1000000) // total
         - 1000000 AS dev_ppm
FROM d CROSS JOIN tot
GROUP BY shard, total
"""


@query("shard_balance_report", oracle=_SHARD_BALANCE_ORACLE)
def shard_balance_report(spark, sf_dir):
    """Training-shard assignment audit: every document is assigned to
    one of ``_SHARD_COUNT`` shards by seeded content hash (the
    reproducible assignment a distributed data loader uses — no
    coordination, any worker recomputes its shard membership from
    doc_id alone), and the report shows each shard's document count,
    token count, corpus share (ppm) and signed deviation from the
    ideal 1/N share — the skew number that decides whether the
    assignment needs salting before a training run.

    All integer: hash60 % N for the shard, ppm integer division for
    shares; ``dev_ppm`` subtracts AFTER the (non-negative) division so
    truncating vs floor division never diverges. The
    ``tokens * N * 1e6`` product holds in BIGINT to ~5e11 total
    tokens; past that both engines promote to decimal(38,0) in lock
    step (the epoch_repeat_plan note).

    Scale shape: shard + token count are zero-shuffle scan-side
    projections (text never moves); ONE map-side-combined rollup to
    N=16 rows, then scalar algebra against the broadcast total.
    Reference anchor: no analog (training-plan surplus; SURVEY.md
    §2.14)."""
    (docs,) = prep(spark, sf_dir, "documents")
    d = docs.select(
        (oracle_hash60(F.col("doc_id").cast("string"), salt=_SHARD_SEED)
         % _SHARD_COUNT).cast("int").alias("shard"),
        token_count(F.col("text")).alias("n_tokens"))
    per = d.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("shard_tokens"))
    tot = d.agg(F.sum("n_tokens").alias("total"))
    return (per.crossJoin(F.broadcast(tot))
            .select(
                "shard", "n_docs", "shard_tokens",
                F.expr("(shard_tokens * 1000000) div total")
                .alias("share_ppm"),
                F.expr(f"(shard_tokens * {_SHARD_COUNT} * 1000000)"
                       " div total - 1000000").alias("dev_ppm")))


CONTEXT_LENGTHS = (128, 512, 2048, 8192)

_CTX_PACK_ORACLE = f"""
WITH d AS (
  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents),
sizes(ctx_len) AS (VALUES {", ".join(f"({v})" for v in CONTEXT_LENGTHS)}),
per AS (
  SELECT ctx_len, n_tokens,
         (n_tokens + ctx_len - 1) // ctx_len AS chunks
  FROM d CROSS JOIN sizes)
SELECT CAST(ctx_len AS INTEGER) AS ctx_len,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(chunks) AS BIGINT) AS total_chunks,
       CAST(SUM(chunks * ctx_len - n_tokens) AS BIGINT) AS padding_tokens,
       (CAST(SUM(n_tokens) AS BIGINT) * 1000000)
         // (CAST(SUM(chunks) AS BIGINT) * ctx_len) AS util_ppm
FROM per GROUP BY ctx_len
"""


@query("context_pack_efficiency", oracle=_CTX_PACK_ORACLE)
def context_pack_efficiency(spark, sf_dir):
    """Context-length design curve: for each candidate training
    context length L, the padding cost of boundary-respecting packing
    where every document is split into ceil(tokens/L) sequences and
    the last sequence of each document pads to L — the curve that
    decides the context length (and whether cross-document packing à
    la token_budget_pack is worth its attention-mask complexity) for
    a corpus with this length distribution. ``util_ppm`` is real
    tokens over slot capacity.

    All integer: ceiling division via ``(n + L - 1) div L`` on
    non-negative BIGINTs (identical truncating/floor behavior on both
    engines); utilization is ppm integer division.

    Scale shape: the scan projects each document to ONE BIGINT token
    count before the broadcast multiply against the |sizes|=4 literal
    relation (4x row count of a 1-column integer relation — text
    never replicates), then one map-side-combined rollup to 4 rows.
    Reference anchor: no analog (training-plan surplus; SURVEY.md
    §2.14)."""
    (docs,) = prep(spark, sf_dir, "documents")
    d = docs.select(token_count(F.col("text")).alias("n_tokens"))
    sizes = F.broadcast(
        docs.sparkSession.createDataFrame(
            [(v,) for v in CONTEXT_LENGTHS], "ctx_len int"))
    per = (d.crossJoin(sizes)
           .withColumn("chunks",
                       F.expr("(n_tokens + ctx_len - 1) div ctx_len")))
    return (per.groupBy("ctx_len")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").alias("total_tokens"),
                 F.sum("chunks").alias("total_chunks"),
                 F.sum(F.col("chunks") * F.col("ctx_len")
                       - F.col("n_tokens")).alias("padding_tokens"))
            .select("ctx_len", "n_docs", "total_tokens", "total_chunks",
                    "padding_tokens",
                    F.expr("(total_tokens * 1000000)"
                           " div (total_chunks * ctx_len)")
                    .alias("util_ppm")))


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


# -- leave-one-out source valuation ---------------------------------------

LOO_SEED = "loo-split-v1"
LOO_HELDOUT_MOD = 10

_LOO_ORACLE = f"""
WITH base AS (
  SELECT source, string_split(text, ' ') AS t,
         {hash60_sql("CAST(doc_id AS VARCHAR)", f"'{LOO_SEED}'")}
           % {LOO_HELDOUT_MOD} = 0 AS held
  FROM documents),
bg AS (SELECT source, held, t[i] AS w1, t[i+1] AS w2
       FROM base, unnest(generate_series(1, len(t) - 1)) u(i)),
hb AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n
       FROM bg WHERE held GROUP BY w1, w2),
sbc AS (SELECT source, w1, w2, CAST(count(*) AS BIGINT) AS c2s
        FROM bg WHERE NOT held GROUP BY source, w1, w2),
tbc AS (SELECT w1, w2, CAST(SUM(c2s) AS BIGINT) AS c2
        FROM sbc GROUP BY w1, w2),
sb1 AS (SELECT source, w1, CAST(SUM(c2s) AS BIGINT) AS c1s
        FROM sbc GROUP BY source, w1),
tb1 AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM tbc GROUP BY w1),
v AS (SELECT CAST(count(*) AS BIGINT) AS vocab FROM tb1),
hn AS (SELECT CAST(SUM(n) AS BIGINT) AS n_heldout FROM hb),
fs AS (
  SELECT CAST(SUM(hb.n * (((coalesce(tbc.c2, 0) + 1) * 1000000)
                          // greatest(coalesce(tb1.c1, 0) + vocab, 1)))
              AS BIGINT) AS full_score_ppm
  FROM hb LEFT JOIN tbc USING (w1, w2) LEFT JOIN tb1 USING (w1)
  CROSS JOIN v),
loo AS (
  SELECT s.source,
         hb.n * (((coalesce(tbc.c2, 0) - coalesce(sbc.c2s, 0) + 1) * 1000000)
                 // greatest(coalesce(tb1.c1, 0) - coalesce(sb1.c1s, 0)
                             + vocab, 1)) AS term
  FROM hb
  CROSS JOIN (SELECT DISTINCT source FROM documents) s
  LEFT JOIN sbc ON sbc.source = s.source
               AND sbc.w1 = hb.w1 AND sbc.w2 = hb.w2
  LEFT JOIN tbc ON tbc.w1 = hb.w1 AND tbc.w2 = hb.w2
  LEFT JOIN sb1 ON sb1.source = s.source AND sb1.w1 = hb.w1
  LEFT JOIN tb1 ON tb1.w1 = hb.w1
  CROSS JOIN v)
SELECT source, n_heldout,
       CAST(SUM(term) AS BIGINT) AS loo_score_ppm,
       full_score_ppm,
       full_score_ppm - CAST(SUM(term) AS BIGINT) AS influence_ppm
FROM loo CROSS JOIN fs CROSS JOIN hn
GROUP BY source, full_score_ppm, n_heldout
"""


@query("loo_source_influence", oracle=_LOO_ORACLE)
def loo_source_influence(spark, sf_dir):
    """Leave-one-out source valuation via additive sufficient
    statistics: score a seeded held-out split under an add-one-
    smoothed bigram model trained on the remaining corpus, then for
    each source recompute the score with that source's documents
    removed from training — WITHOUT retraining, because bigram counts
    are additive (LOO counts = total counts - source counts).
    ``influence_ppm`` = full-model score - LOO score: positive means
    the source's data improves held-out likelihood (keep/upsample),
    ~zero or negative flags sources whose tokens don't help (the
    datamodels/data-Shapley question answered with a model cheap
    enough to be exact at corpus scale).

    All integer: p = ((c2 + 1) * 1e6) div (c1 + V) add-one smoothing
    in ppm; numerator and denominator are both non-negative (a
    source's counts are a subset of the totals), so truncating vs
    floor division never diverges. Sums and the final subtraction are
    BIGINT-exact.

    Scale shape: one bigram explode feeds THREE map-side-combined
    count rollups (per-source bigram, total bigram, prefix) whose
    combined size is bounded by effective vocabulary^2, orders below
    the corpus; the held-out bigram relation is |heldout vocab^2| and
    crosses only the |sources| distinct-source list (broadcast).
    The four count joins are shuffle-hash on bigram/prefix keys with
    ONE row per key on the build side — no explosion. V, the full
    score, and the held-out total are 1-row broadcast scalars.
    Retraining per source would be |sources| full passes; the
    additive-statistics subtraction makes it one. Reference anchor:
    no analog (data-valuation surplus; SURVEY.md §2.14)."""
    (docs,) = prep(spark, sf_dir, "documents")
    t = F.split("text", " ")
    held = (oracle_hash60(F.col("doc_id").cast("string"), salt=LOO_SEED)
            % LOO_HELDOUT_MOD == 0)
    base = docs.select("source", t.alias("t"), held.alias("held"))
    pair = F.zip_with(
        F.slice(F.col("t"), 1, F.greatest(F.size("t") - 1, F.lit(0))),
        F.slice(F.col("t"), 2, F.greatest(F.size("t") - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")))
    bg = (base.select("source", "held", F.explode(pair).alias("g"))
          .select("source", "held", "g.w1", "g.w2"))
    # hb feeds 3 consumers (full score, LOO cross, held-out total) and
    # sbc feeds 3 (total bigram, per-source prefix, LOO join): without
    # a checkpoint Spark re-runs the corpus scan + bigram explode once
    # PER consumer — ~10 full scans at 100 TB for a vocabulary^2-sized
    # relation that materializes once for orders less
    hb = (bg.filter("held").groupBy("w1", "w2")
          .agg(F.count(F.lit(1)).alias("n"))
          .localCheckpoint(eager=False))
    sbc = (bg.filter(~F.col("held")).groupBy("source", "w1", "w2")
           .agg(F.count(F.lit(1)).alias("c2s"))
           .localCheckpoint(eager=False))
    tbc = (sbc.groupBy("w1", "w2").agg(F.sum("c2s").alias("c2"))
           .localCheckpoint(eager=False))
    sb1 = sbc.groupBy("source", "w1").agg(F.sum("c2s").alias("c1s"))
    tb1 = tbc.groupBy("w1").agg(F.sum("c2").alias("c1"))
    v = tb1.agg(F.count(F.lit(1)).alias("vocab"))
    hn = hb.agg(F.sum("n").alias("n_heldout"))
    fs = (hb.join(tbc, ["w1", "w2"], "left").join(tb1, ["w1"], "left")
          .crossJoin(F.broadcast(v))
          .agg(F.sum(
              F.col("n")
              * F.expr("((coalesce(c2, 0) + 1) * 1000000)"
                       " div greatest(coalesce(c1, 0) + vocab, 1)"))
              .alias("full_score_ppm")))
    srcs = docs.select("source").distinct()
    loo = (hb.crossJoin(F.broadcast(srcs))
           .join(sbc, ["source", "w1", "w2"], "left")
           .join(tbc, ["w1", "w2"], "left")
           .join(sb1, ["source", "w1"], "left")
           .join(tb1, ["w1"], "left")
           .crossJoin(F.broadcast(v))
           .select(
               "source",
               (F.col("n") * F.expr(
                   "((coalesce(c2, 0) - coalesce(c2s, 0) + 1) * 1000000)"
                   " div greatest(coalesce(c1, 0) - coalesce(c1s, 0)"
                   " + vocab, 1)")).alias("term")))
    return (loo.groupBy("source").agg(F.sum("term").alias("loo_score_ppm"))
            .crossJoin(F.broadcast(fs)).crossJoin(F.broadcast(hn))
            .select("source", "n_heldout", "loo_score_ppm",
                    "full_score_ppm",
                    (F.col("full_score_ppm") - F.col("loo_score_ppm"))
                    .alias("influence_ppm")))


# -- power-of-two reshard migration audit ---------------------------------

_RESHARD_ORACLE = f"""
WITH d AS (
  SELECT {hash60_sql("CAST(doc_id AS VARCHAR)", f"'{_SHARD_SEED}'")} AS h,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents)
SELECT CAST(h % {_SHARD_COUNT} AS INTEGER) AS old_shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(count(*) FILTER (WHERE h % {2 * _SHARD_COUNT}
                             <> h % {_SHARD_COUNT}) AS BIGINT)
         AS moved_docs,
       CAST(coalesce(SUM(n_tokens) FILTER (WHERE h % {2 * _SHARD_COUNT}
                                           <> h % {_SHARD_COUNT}), 0)
            AS BIGINT) AS moved_tokens,
       (CAST(coalesce(SUM(n_tokens) FILTER (WHERE h % {2 * _SHARD_COUNT}
                                            <> h % {_SHARD_COUNT}), 0)
             AS BIGINT) * 1000000)
         // greatest(CAST(SUM(n_tokens) AS BIGINT), 1) AS moved_ppm
FROM d GROUP BY old_shard
"""


@query("reshard_migration_plan", oracle=_RESHARD_ORACLE)
def reshard_migration_plan(spark, sf_dir):
    """Reshard migration audit for doubling the shard count (N -> 2N
    under the same hash): per OLD shard, how many documents/tokens
    change shard. Under ``h % 2N`` every old shard i splits into
    {{i, i+N}} — documents either stay or move to exactly one new
    shard, so doubling moves ~half of each shard's mass and NOTHING
    crosses between old shards (the power-of-two property that makes
    mod-hash resharding cheap: each old shard streams its movers to
    one destination, embarrassingly parallel, no global shuffle). A
    non-power-of-two reshard (say 16 -> 24) would scatter every shard
    to many destinations; this report quantifies the traffic before
    an operator commits to either.

    All integer: hash-mod arithmetic and ppm division with a
    ``greatest(..., 1)`` total guard for empty shards.

    Scale shape: shard ids + token count are zero-shuffle scan-side
    projections; ONE map-side-combined rollup to N rows (conditional
    sums — the mover set never materializes). Reference anchor: no
    analog (training-plan surplus; SURVEY.md §2.14)."""
    (docs,) = prep(spark, sf_dir, "documents")
    d = docs.select(
        oracle_hash60(F.col("doc_id").cast("string"),
                      salt=_SHARD_SEED).alias("h"),
        token_count(F.col("text")).alias("n_tokens"))
    moved = F.expr(f"h % {2 * _SHARD_COUNT} <> h % {_SHARD_COUNT}")
    return (d.groupBy((F.col("h") % _SHARD_COUNT).cast("int")
                      .alias("old_shard"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").alias("n_tokens"),
                 F.count(F.when(moved, F.lit(1))).alias("moved_docs"),
                 F.coalesce(F.sum(F.when(moved, F.col("n_tokens"))),
                            F.lit(0)).alias("moved_tokens"))
            .select("old_shard", "n_docs", "n_tokens", "moved_docs",
                    "moved_tokens",
                    F.expr("(moved_tokens * 1000000)"
                           " div greatest(n_tokens, 1)").alias("moved_ppm")))


# -- composed training feed manifest --------------------------------------

#: the manifest uses a SUB-repetition budget (3x < R*=4) so per-source
#: quotas land mid-epoch: the cap engages only for the smallest
#: (sqrt-upweighted) sources while the rest exercise the partial-epoch
#: remainder path — epoch_repeat_plan keeps 8x to demonstrate the
#: saturation regime.
FEED_BUDGET_MULT = 3

_FEED_ORACLE = f"""
WITH src AS (
  SELECT source,
         CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT)
           AS src_tokens
  FROM documents GROUP BY source),
tot AS (SELECT CAST(SUM(src_tokens) AS BIGINT) * {FEED_BUDGET_MULT}
           AS budget FROM src),
w AS (
  SELECT source, src_tokens,
         CAST(ROUND(sqrt(CAST(src_tokens AS DOUBLE)) * 1000000) AS BIGINT)
           AS w_micro
  FROM src),
ws AS (SELECT CAST(SUM(w_micro) AS BIGINT) AS wsum FROM w),
q AS (
  SELECT source, src_tokens,
         (budget * w_micro) // wsum AS quota_tokens
  FROM w CROSS JOIN tot CROSS JOIN ws),
e AS (
  SELECT source, src_tokens, quota_tokens,
         greatest(quota_tokens - {EPOCH_RSTAR} * src_tokens, 0)
           AS excess_tokens,
         greatest({EPOCH_RSTAR} * src_tokens - quota_tokens, 0)
           AS headroom_tokens
  FROM q),
p AS (SELECT CAST(SUM(excess_tokens) AS BIGINT) AS pool,
             CAST(SUM(headroom_tokens) AS BIGINT) AS headroom_total
      FROM e),
fq AS (
  SELECT source, src_tokens,
         quota_tokens - excess_tokens
           + CASE WHEN headroom_total > 0
                  THEN least(headroom_tokens,
                             (pool * headroom_tokens) // headroom_total)
                  ELSE 0 END AS final_quota_tokens
  FROM e CROSS JOIN p),
s AS (
  SELECT doc_id, source, n_chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
              AS BIGINT) AS n_punct
  FROM documents),
sc AS (SELECT doc_id, source, n_tokens,
              {_SCORE_PPM_SQL} AS score_ppm
       FROM s),
st AS (
  SELECT doc_id, source, n_tokens,
         CAST((score_ppm * {CURRICULUM_STAGES}) // 1000001 AS INTEGER)
           AS stage,
         CAST(row_number() OVER (
           PARTITION BY (score_ppm * {CURRICULUM_STAGES}) // 1000001
           ORDER BY {hash60_sql("CAST(doc_id AS VARCHAR)",
                                f"'{CURRICULUM_SEED}'")}, doc_id)
              AS BIGINT) AS pos
  FROM sc),
cum AS (
  SELECT st.*,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY stage, pos
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cum_tokens
  FROM st)
SELECT c.doc_id, c.source, c.stage, c.pos, c.n_tokens,
       fq.final_quota_tokens // fq.src_tokens AS full_epochs,
       c.cum_tokens <= fq.final_quota_tokens
         - (fq.final_quota_tokens // fq.src_tokens) * fq.src_tokens
         AS in_partial_epoch,
       fq.final_quota_tokens // fq.src_tokens
         + CASE WHEN c.cum_tokens <= fq.final_quota_tokens
                     - (fq.final_quota_tokens // fq.src_tokens)
                       * fq.src_tokens
                THEN 1 ELSE 0 END AS total_feeds
FROM cum c JOIN fq USING (source)
"""


@query("training_feed_manifest", oracle=_FEED_ORACLE)
def training_feed_manifest(spark, sf_dir):
    """The composed training feed plan — epoch_repeat_plan's final
    per-source token quotas APPLIED to curriculum_schedule's
    (stage, pos) order, one row per document: how many FULL epochs its
    source repeats, and whether the document makes the final PARTIAL
    epoch (sources' quotas are rarely whole-epoch multiples; the
    remainder is spent on the curriculum-order prefix of the source,
    a document included only if it fits whole). ``total_feeds`` is
    the number of times the run feeds this document — the manifest a
    deterministic distributed data loader can recompute shard-locally.

    Composition is the deliverable (the corpus_funnel pattern): the
    quota algebra is LITERALLY epoch_repeat_plan's, the order
    LITERALLY curriculum_schedule's — both already driver-certified —
    and this query certifies their join. All integer: quotas/ppm as
    in the parents, the partial-epoch cut is an inclusive prefix-sum
    comparison on BIGINT token counts.

    Scale shape: the source-quota side collapses to |sources| rows in
    one rollup (broadcast thereafter); the per-doc side adds ONE
    window exchange — partitionBy(source) ordered by (stage, pos) for
    the prefix sum — on (doc_id, ints) projections, never text. A
    100 TB corpus pays one sort per source for a reusable manifest
    artifact; the alternative (recompute feed membership per step) is
    why loaders precompute exactly this. Reference anchor: no analog
    (training-plan surplus; SURVEY.md §2.14)."""
    (docs,) = prep(spark, sf_dir, "documents")
    src = (docs.groupBy("source")
           .agg(F.sum(token_count(F.col("text"))).alias("src_tokens")))
    tot = src.agg((F.sum("src_tokens") * FEED_BUDGET_MULT).alias("budget"))
    w = src.withColumn(
        "w_micro",
        F.round(F.sqrt(F.col("src_tokens").cast("double")) * 1000000)
        .cast("long"))
    ws = w.agg(F.sum("w_micro").alias("wsum"))
    q = (w.crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(ws))
         .select("source", "src_tokens",
                 F.expr("(budget * w_micro) div wsum").alias("quota_tokens")))
    e = q.select(
        "source", "src_tokens", "quota_tokens",
        F.greatest(F.col("quota_tokens")
                   - EPOCH_RSTAR * F.col("src_tokens"),
                   F.lit(0)).alias("excess_tokens"),
        F.greatest(EPOCH_RSTAR * F.col("src_tokens")
                   - F.col("quota_tokens"),
                   F.lit(0)).alias("headroom_tokens"))
    p = e.agg(F.sum("excess_tokens").alias("pool"),
              F.sum("headroom_tokens").alias("headroom_total"))
    fq = (e.crossJoin(F.broadcast(p))
          .select("source", "src_tokens",
                  (F.col("quota_tokens") - F.col("excess_tokens")
                   + F.when(F.col("headroom_total") > 0,
                            F.least(F.col("headroom_tokens"),
                                    F.expr("(pool * headroom_tokens)"
                                           " div headroom_total")))
                   .otherwise(F.lit(0))).alias("final_quota_tokens")))
    t = F.col("text")
    s = docs.select(
        "doc_id", "source", "n_chars",
        token_count(t).alias("n_tokens"),
        punct_count(t).alias("n_punct"))
    sc = s.select(
        "doc_id", "source", "n_tokens",
        F.expr(_SCORE_PPM_SQL.replace("//", "div")).alias("score_ppm"))
    staged = sc.withColumn(
        "stage",
        F.expr(f"(score_ppm * {CURRICULUM_STAGES}) div 1000001").cast("int"))
    h = oracle_hash60(F.col("doc_id").cast("string"), salt=CURRICULUM_SEED)
    wp = Window.partitionBy("stage").orderBy(h, "doc_id")
    st = staged.select(
        "doc_id", "source", "n_tokens", "stage",
        F.row_number().over(wp).cast("long").alias("pos"))
    wc = (Window.partitionBy("source").orderBy("stage", "pos")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = st.withColumn("cum_tokens", F.sum("n_tokens").over(wc))
    j = cum.join(F.broadcast(fq), "source")
    full = F.expr("final_quota_tokens div src_tokens")
    rem = (F.col("final_quota_tokens")
           - full * F.col("src_tokens"))
    in_partial = F.col("cum_tokens") <= rem
    return j.select(
        "doc_id", "source", "stage", "pos", "n_tokens",
        full.alias("full_epochs"),
        in_partial.alias("in_partial_epoch"),
        (full + F.when(in_partial, F.lit(1)).otherwise(F.lit(0)))
        .alias("total_feeds"))


# -- source-mix rebalance plan (r10) ---------------------------------------

# Target mixture policy: even-numbered sources get weight 2, odd get
# weight 1 (the fixture stand-in for "web-heavy" mixture specs like
# GPT-3/Pile tables); ppm shares are exact integer floor divisions of
# the 30-unit weight total, so the plan arithmetic is hash-stable.
MIX_EVEN_W, MIX_ODD_W = 2, 1
MIX_TOTAL_W = 10 * MIX_EVEN_W + 10 * MIX_ODD_W
MIX_TOL_DIV = 1000   # hold band: |delta| <= total_tokens / 1000


@query(
    "source_mix_rebalance_plan",
    oracle=f"""
WITH cur AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
         CAST(CAST(substr(source, 4) AS INTEGER) % 2 AS INTEGER) AS odd
  FROM documents GROUP BY source),
tot AS (SELECT SUM(n_tokens) AS total FROM cur),
plan AS (
  SELECT c.source, c.n_docs, c.n_tokens,
         (1000000 * c.n_tokens) // t.total AS share_ppm,
         ((CASE WHEN c.odd = 0 THEN {MIX_EVEN_W} ELSE {MIX_ODD_W} END)
          * 1000000) // {MIX_TOTAL_W} AS target_ppm,
         t.total AS total
  FROM cur c CROSS JOIN tot t)
SELECT source, n_docs, n_tokens,
       CAST(share_ppm AS BIGINT) AS share_ppm,
       CAST(target_ppm AS BIGINT) AS target_ppm,
       CAST((total * target_ppm) // 1000000 - n_tokens AS BIGINT)
         AS delta_tokens,
       CASE WHEN (total * target_ppm) // 1000000 - n_tokens
                 > total // {MIX_TOL_DIV} THEN 'acquire'
            WHEN n_tokens - (total * target_ppm) // 1000000
                 > total // {MIX_TOL_DIV} THEN 'sample_down'
            ELSE 'hold' END AS action
FROM plan
""",
)
def source_mix_rebalance_plan(spark, sf_dir):
    """Mixture rebalancing, the other half of epoch_repeat_plan's
    question: given a TARGET mixture spec (the per-source ppm weights
    a training recipe publishes — Pile/GPT-3-style tables), how far is
    the corpus from it and what does each source owe — tokens to
    acquire, tokens to down-sample, or hold within tolerance.  The
    plan an acquisition team and the feed builder both read: one says
    what to crawl next, the other caps what training may draw today.

    All integer: current shares, targets, and deltas are exact floor
    divisions over BIGINT token counts; the hold band is total/1000 so
    dust-level imbalance doesn't thrash the crawler.

    Scale shape: ONE map-side-combined rollup of the corpus to
    |sources| rows, a 1-row total broadcast back onto it
    (broadcast-scalar crossJoin, the adjudicated planning.py pattern),
    and scan-side CASE arithmetic — nothing O(corpus) after the first
    rollup."""
    (docs,) = prep(spark, sf_dir, "documents")
    cur = (docs.groupBy("source")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum(F.expr("size(split(text, ' '))").cast("long"))
                .alias("n_tokens")))
    tot = cur.agg(F.sum("n_tokens").alias("total"))
    odd = F.pmod(F.substring("source", 4, 10).cast("int"), F.lit(2))
    target_ppm = F.expr(
        f"(CASE WHEN _odd = 0 THEN {MIX_EVEN_W} ELSE {MIX_ODD_W} END "
        f"* 1000000) div {MIX_TOTAL_W}")
    j = (cur.withColumn("_odd", odd)
         .crossJoin(F.broadcast(tot))
         .withColumn("target_ppm", target_ppm)
         .withColumn("_target_tokens",
                     F.expr("(total * target_ppm) div 1000000")))
    tol = F.expr(f"total div {MIX_TOL_DIV}")
    delta = F.col("_target_tokens") - F.col("n_tokens")
    return j.select(
        "source", "n_docs", "n_tokens",
        F.expr("(1000000 * n_tokens) div total").alias("share_ppm"),
        F.col("target_ppm").cast("long").alias("target_ppm"),
        delta.cast("long").alias("delta_tokens"),
        F.when(delta > tol, F.lit("acquire"))
         .when(-delta > tol, F.lit("sample_down"))
         .otherwise(F.lit("hold")).alias("action"))
