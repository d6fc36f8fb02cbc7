"""Graph-analytics queries over derived relational graphs.

The reference has no graph surface; a corpus/commerce analytics engine
needs at least transitive closure (operators/graph.py::
connected_components, driving dedup_clusters) and a centrality
measure. supplier_pagerank exercises the fixed-point PageRank operator
on a graph DERIVED inside the engine — the customer–supplier
interaction graph implied by lineitem⨝orders — so the whole pipeline
(edge extraction, symmetrization, power iteration) is one oracle-
checked plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from streamforge_spark.operators.graph import pagerank
from streamforge_spark.queries.common import prep
from streamforge_spark.registry import query

PR_ROUNDS = 3
PR_SCALE = 10**9


def _pagerank_oracle(rounds: int, scale: int) -> str:
    """Unroll the power iterations into pure SQL — every round is
    oracle-checked, not just the final ordering."""
    ctes = [
        """pairs AS (
  SELECT o.o_custkey AS c, l.l_suppkey AS s, CAST(COUNT(*) AS BIGINT) AS w
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2)""",
        """edges AS (
  SELECT c * 2 AS src, s * 2 + 1 AS dst, w FROM pairs
  UNION ALL
  SELECT s * 2 + 1 AS src, c * 2 AS dst, w FROM pairs)""",
        "outw AS (SELECT src, SUM(w) AS wout FROM edges GROUP BY src)",
        "nodes AS (SELECT DISTINCT src AS node FROM edges)",
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes)",
        f"""r0 AS (
  SELECT node, CAST(ROUND(CAST({scale} AS DOUBLE) / CAST(nn.n AS DOUBLE)) AS BIGINT) AS r
  FROM nodes CROSS JOIN nn)""",
    ]
    for i in range(rounds):
        ctes.append(f"""c{i} AS (
  SELECT e.dst AS node,
         SUM(CAST(ROUND((CAST(r.r AS DOUBLE) * CAST(e.w AS DOUBLE))
                        / CAST(ow.wout AS DOUBLE)) AS BIGINT)) AS c
  FROM edges e
  JOIN r{i} r ON r.node = e.src
  JOIN outw ow ON ow.src = e.src
  GROUP BY e.dst)""")
        ctes.append(f"""r{i + 1} AS (
  SELECT nd.node,
         CAST(ROUND((1.0 - 0.85) * (CAST({scale} AS DOUBLE) / CAST(nn.n AS DOUBLE))
                    + 0.85 * CAST(COALESCE(s.c, 0) AS DOUBLE)) AS BIGINT) AS r
  FROM nodes nd CROSS JOIN nn
  LEFT JOIN c{i} s ON s.node = nd.node)""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node, r AS rank_ppb FROM r{rounds}")


@query("supplier_pagerank", oracle=_pagerank_oracle(PR_ROUNDS, PR_SCALE))
def supplier_pagerank(spark, sf_dir):
    """PageRank centrality over the customer–supplier graph: an edge
    (customer, supplier) weighted by how many lineitems connect them,
    symmetrized so the random walk has no dangling mass. Node ids are
    disjointly encoded (customer→2k, supplier→2k+1) so one rank vector
    covers both sides.

    Scale shape: edge extraction is the standard lineitem⨝orders
    shuffle followed by an exact pair rollup; each of the 3 power
    iterations is one edges⨝ranks shuffle + a BIGINT in-sum — the
    same per-round cost profile as dedup_clusters' label propagation,
    with the node list checkpointed once. Integer parts-per-billion
    ranks keep every iteration bit-identical to the unrolled SQL
    oracle (operators/graph.py::pagerank)."""
    lineitem, orders = prep(spark, sf_dir, "lineitem", "orders")
    pairs = (lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
             .groupBy(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
             .agg(F.count(F.lit(1)).alias("w")))
    cust = pairs.select((F.col("c") * 2).alias("src"),
                        (F.col("s") * 2 + 1).alias("dst"), "w")
    supp = pairs.select((F.col("s") * 2 + 1).alias("src"),
                        (F.col("c") * 2).alias("dst"), "w")
    edges = cust.unionByName(supp)
    # symmetric=True: the union above puts every node on both edge
    # ends, so the operator's symmetric fast path (constant round-one
    # ranks, no per-round nodes join) is value-identical (r12 — the
    # unrolled SQL oracle keeps the generic form and stays green)
    return pagerank(edges, rounds=PR_ROUNDS, scale=PR_SCALE,
                    symmetric=True)


_TRIANGLE_ORACLE = """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
      FROM op a JOIN op b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS d
        FROM (SELECT p1 AS node FROM e UNION ALL SELECT p2 FROM e)
        GROUP BY node),
orient AS (
  SELECT CASE WHEN (da.d < db.d) OR (da.d = db.d AND p1 < p2) THEN p1 ELSE p2 END AS src,
         CASE WHEN (da.d < db.d) OR (da.d = db.d AND p1 < p2) THEN p2 ELSE p1 END AS dst,
         CASE WHEN (da.d < db.d) OR (da.d = db.d AND p1 < p2) THEN db.d ELSE da.d END AS dd
  FROM e JOIN deg da ON da.node = p1 JOIN deg db ON db.node = p2),
tri AS (
  SELECT COUNT(*) AS t
  FROM orient w1
  JOIN orient w2 ON w1.src = w2.src
       AND ((w1.dd < w2.dd) OR (w1.dd = w2.dd AND w1.dst < w2.dst))
  JOIN orient w3 ON w3.src = w1.dst AND w3.dst = w2.dst)
SELECT CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
       CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
       CAST(tri.t AS BIGINT) AS n_triangles
FROM tri
"""


@query("triangle_count", oracle=_TRIANGLE_ORACLE)
def triangle_count(spark, sf_dir):
    """Distributed triangle counting on the part co-purchase graph
    (parts are adjacent when some order contains both) — the standard
    cohesion/community primitive, and deliberately the *other* classic
    graph workload next to fixed-point PageRank: bounded 2-step join
    rather than iteration.

    Scale shape: the node-iterator-with-degree-orientation algorithm.
    Edges are derived without a self-join (per-order part sets are
    tiny, so one groupBy(order) + in-set pair explode — same pair
    machinery as the shingle posting lists); each undirected edge is
    then oriented low→high (degree, id) rank, which caps every node's
    out-degree near sqrt(|E|) and shrinks the wedge join from
    sum(deg²) to sum(outdeg²) — the difference between a hub
    exploding quadratically and staying bounded. Wedge generation and
    the closing-edge probe are two hash equi-joins; at 100 TB the
    degree table joins by shuffle (it's |V| rows — broadcast is an
    AQE call, not an assumption).
    """
    (lineitem,) = prep(spark, sf_dir, "lineitem")
    sets = (lineitem.groupBy("l_orderkey")
            .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps")))
    e = (sets.select(F.explode(F.expr(
        "flatten(transform(ps, (x, i) -> "
        "transform(slice(ps, i + 2, size(ps) - i - 1), "
        "y -> struct(x AS p1, y AS p2))))")).alias("pr"))
        .select("pr.*").distinct())
    deg = (e.select(F.explode(F.array("p1", "p2")).alias("node"))
           .groupBy("node").agg(F.count(F.lit(1)).alias("d")))
    ed = (e.join(deg.withColumnRenamed("node", "p1")
                 .withColumnRenamed("d", "da"), "p1")
          .join(deg.withColumnRenamed("node", "p2")
                .withColumnRenamed("d", "db"), "p2"))
    low_first = (F.col("da") < F.col("db")) | \
                ((F.col("da") == F.col("db")) & (F.col("p1") < F.col("p2")))
    orient = ed.select(
        F.when(low_first, F.col("p1")).otherwise(F.col("p2")).alias("src"),
        F.when(low_first, F.col("p2")).otherwise(F.col("p1")).alias("dst"),
        F.when(low_first, F.col("db")).otherwise(F.col("da")).alias("dd"))
    w1, w2, w3 = orient.alias("w1"), orient.alias("w2"), orient.alias("w3")
    rank_lt = (F.col("w1.dd") < F.col("w2.dd")) | \
              ((F.col("w1.dd") == F.col("w2.dd")) & (F.col("w1.dst") < F.col("w2.dst")))
    tri = (w1.join(w2, (F.col("w1.src") == F.col("w2.src")) & rank_lt)
           .join(w3, (F.col("w3.src") == F.col("w1.dst"))
                 & (F.col("w3.dst") == F.col("w2.dst")))
           .agg(F.count(F.lit(1)).alias("n_triangles")))
    counts = (deg.agg(F.count(F.lit(1)).alias("n_nodes"))
              .crossJoin(e.agg(F.count(F.lit(1)).alias("n_edges"))))
    return counts.crossJoin(tri).select("n_nodes", "n_edges", "n_triangles")


BFS_ROUNDS = 3
BFS_SEED_NATION = 0


def _bfs_oracle(rounds: int, seed_nation: int) -> str:
    """Unrolled frontier BFS: each round is checked, and the frontier
    formulation (new nodes only, not full relaxation) is the same one
    the Spark plan runs."""
    ctes = [
        """pairs AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)""",
        """edges AS (
  SELECT c * 2 AS src, s * 2 + 1 AS dst FROM pairs
  UNION ALL
  SELECT s * 2 + 1 AS src, c * 2 AS dst FROM pairs)""",
        f"""f0 AS (SELECT c_custkey * 2 AS node FROM customer
  WHERE c_nationkey = {seed_nation})""",
        "reach0 AS (SELECT node, 0 AS dist FROM f0)",
    ]
    for r in range(rounds):
        ctes.append(f"""c{r} AS (
  SELECT DISTINCT e.dst AS node FROM edges e JOIN f{r} f ON f.node = e.src)""")
        ctes.append(f"""f{r + 1} AS (
  SELECT c.node FROM c{r} c LEFT JOIN reach{r} x ON x.node = c.node
  WHERE x.node IS NULL)""")
        ctes.append(f"""reach{r + 1} AS (
  SELECT node, dist FROM reach{r}
  UNION ALL SELECT node, {r + 1} AS dist FROM f{r + 1})""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node, CAST(dist AS BIGINT) AS dist FROM reach{rounds}")


@query("bfs_reachability", oracle=_bfs_oracle(BFS_ROUNDS, BFS_SEED_NATION))
def bfs_reachability(spark, sf_dir):
    """K-hop BFS over the customer–supplier graph: distance from the
    seed set (nation-{seed} customers) within 3 hops — the reachability
    / blast-radius primitive (supply-chain exposure, fraud-ring
    expansion, account-linkage neighborhoods).

    Scale shape: FRONTIER propagation, not full relaxation — each round
    joins only the nodes first reached last round against the edge
    list, then anti-joins the accumulated reach set, so per-round work
    decays with frontier size instead of re-shuffling every settled
    node (on small-diameter graphs round 2+ frontiers collapse fast).
    Rounds are a fixed constant: the plan is `rounds` hash-join +
    anti-join pairs, each oracle-checked, no driver-side iteration
    state beyond the loop counter."""
    lineitem, orders, customer = prep(spark, sf_dir,
                                      "lineitem", "orders", "customer")
    pairs = (lineitem.join(orders,
                           lineitem["l_orderkey"] == orders["o_orderkey"])
             .select(F.col("o_custkey").alias("c"),
                     F.col("l_suppkey").alias("s")).distinct())
    # materialize the edge list ONCE — the unrolled loop re-joins it
    # every round, and without this each round's plan replays the
    # (expensive) lineitem⨝orders extraction: audited at 24 lineitem
    # scans for 3 rounds before the checkpoint, 1 after
    edges = (pairs.select((F.col("c") * 2).alias("src"),
                          (F.col("s") * 2 + 1).alias("dst"))
             .unionByName(pairs.select((F.col("s") * 2 + 1).alias("src"),
                                       (F.col("c") * 2).alias("dst")))
             .localCheckpoint(eager=True))
    frontier = (customer.filter(F.col("c_nationkey") == BFS_SEED_NATION)
                .select((F.col("c_custkey") * 2).alias("node")))
    reach = frontier.withColumn("dist", F.lit(0))
    for r in range(BFS_ROUNDS):
        cand = (edges.join(frontier, edges["src"] == frontier["node"])
                .select(F.col("dst").alias("node")).distinct())
        # truncate per-round lineage: frontier/reach feed the next
        # round twice (join + anti-join), doubling the DAG per round
        # if left lazy (same discipline as connected_components)
        frontier = (cand.join(reach, "node", "left_anti")
                    .localCheckpoint(eager=False))
        reach = (reach.unionByName(
            frontier.withColumn("dist", F.lit(r + 1)))
            .localCheckpoint(eager=False))
    return reach.select("node", F.col("dist").cast("long").alias("dist"))


BASKET_MIN_SUPPORT = 2

_BASKET_ORACLE = f"""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
nt AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n FROM op),
item AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS ni FROM op GROUP BY l_partkey),
pair AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2, CAST(COUNT(*) AS BIGINT) AS np
         FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                            AND a.l_partkey < b.l_partkey
         GROUP BY 1, 2)
SELECT p1, p2, np AS n_both,
       CAST(np * nt.n AS DOUBLE) / CAST(ia.ni * ib.ni AS DOUBLE) AS lift
FROM pair
JOIN item ia ON ia.l_partkey = p1
JOIN item ib ON ib.l_partkey = p2
CROSS JOIN nt
WHERE np >= {BASKET_MIN_SUPPORT}
"""


@query("market_basket_lift", oracle=_BASKET_ORACLE)
def market_basket_lift(spark, sf_dir):
    """Market-basket association mining: for every part pair bought
    together in ≥{MIN_SUPPORT} orders, the lift statistic
    P(a,b) / (P(a)·P(b)) — >1 means genuinely associated, not just
    individually popular. The log-free cousin of PMI (same ratio,
    no transform), so the only float is ONE identical IEEE division
    of exact BIGINT products on both engines.

    Scale shape: the same per-order pair explode as triangle_count
    (order baskets are tiny, so pairs come from an in-set transform
    after one groupBy(order) — never an op⨝op self-join shuffle of
    the full fact table); pair support is a map-side-combinable
    count. Item counts are |parts| rows broadcast back; the total
    is a 1-row scalar cross. The min-support filter lands before
    the enrichment joins, cutting the long tail of 1-support pairs
    — at 100 TB that filter is what keeps the pair table bounded.
    """
    (lineitem,) = prep(spark, sf_dir, "lineitem")
    op = lineitem.select("l_orderkey", "l_partkey").distinct()
    # every statistic (pair supports, item counts, order total) derives
    # from the SAME per-order basket aggregate, so its exchange subtree
    # is identical across branches and Spark plans ReusedExchange —
    # one lineitem scan + one order shuffle feed all three, instead of
    # three scans (asserted in test_plans)
    sets = (op.groupBy("l_orderkey")
            .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps")))
    pair = (sets.select(F.explode(F.expr(
        "flatten(transform(ps, (x, i) -> "
        "transform(slice(ps, i + 2, size(ps) - i - 1), "
        "y -> struct(x AS p1, y AS p2))))")).alias("pr"))
        .select("pr.*")
        .groupBy("p1", "p2").agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= BASKET_MIN_SUPPORT))
    item = (sets.select(F.explode("ps").alias("l_partkey"))
            .groupBy("l_partkey").agg(F.count(F.lit(1)).alias("ni")))
    nt = sets.agg(F.count(F.lit(1)).alias("n"))
    return (pair
            .join(F.broadcast(item.withColumnRenamed("l_partkey", "p1")
                              .withColumnRenamed("ni", "na")), "p1")
            .join(F.broadcast(item.withColumnRenamed("l_partkey", "p2")
                              .withColumnRenamed("ni", "nb")), "p2")
            .crossJoin(F.broadcast(nt))
            .select("p1", "p2", "n_both",
                    ((F.col("n_both") * F.col("n")).cast("double")
                     / (F.col("na") * F.col("nb")).cast("double")).alias("lift")))


LPA_ROUNDS = 3


def _lpa_oracle(rounds: int) -> str:
    """Unroll synchronous weighted label propagation into SQL —
    identical edge derivation to supplier_pagerank, every round
    checked."""
    ctes = [
        """pairs AS (
  SELECT o.o_custkey AS c, l.l_suppkey AS s, CAST(COUNT(*) AS BIGINT) AS w
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2)""",
        """edges AS (
  SELECT c * 2 AS src, s * 2 + 1 AS dst, w FROM pairs
  UNION ALL
  SELECT s * 2 + 1 AS src, c * 2 AS dst, w FROM pairs)""",
        "nodes AS (SELECT DISTINCT src AS node FROM edges)",
        "l0 AS (SELECT node, node AS lbl FROM nodes)",
    ]
    for i in range(rounds):
        ctes.append(f"""c{i} AS (
  SELECT e.dst AS node, r.lbl, SUM(e.w) AS wsum
  FROM edges e JOIN l{i} r ON r.node = e.src
  GROUP BY e.dst, r.lbl)""")
        ctes.append(f"""l{i + 1} AS (
  SELECT nd.node, COALESCE(b.lbl, nd.node) AS lbl
  FROM nodes nd LEFT JOIN (
    SELECT node, lbl FROM (
      SELECT *, row_number() OVER (PARTITION BY node
                                   ORDER BY wsum DESC, lbl) AS rn
      FROM c{i}) WHERE rn = 1) b ON b.node = nd.node)""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node, lbl AS label FROM l{rounds}")


@query("supplier_communities", oracle=_lpa_oracle(LPA_ROUNDS))
def supplier_communities(spark, sf_dir):
    """Community detection over the same derived customer–supplier
    interaction graph as supplier_pagerank, via fixed-round synchronous
    label propagation — the market-segmentation / fraud-ring primitive.
    Every propagation round is replayed in the oracle."""
    from streamforge_spark.operators.graph import label_propagation
    lineitem, orders = prep(spark, sf_dir, "lineitem", "orders")
    pairs = (lineitem.join(orders,
                           lineitem["l_orderkey"] == orders["o_orderkey"])
             .groupBy(F.col("o_custkey").alias("c"),
                      F.col("l_suppkey").alias("s"))
             .agg(F.count(F.lit(1)).alias("w")))
    fwd = pairs.select((F.col("c") * 2).alias("src"),
                       (F.col("s") * 2 + 1).alias("dst"), "w")
    rev = pairs.select((F.col("s") * 2 + 1).alias("src"),
                       (F.col("c") * 2).alias("dst"), "w")
    return label_propagation(fwd.unionByName(rev), rounds=LPA_ROUNDS)


KCORE_K = 8
KCORE_ROUNDS = 3


def _kcore_oracle(k: int, rounds: int) -> str:
    """Unroll the peel: every round's degree filter and edge pruning
    replays in SQL."""
    ctes = [
        """pairs AS (
  SELECT o.o_custkey AS c, l.l_suppkey AS s
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2)""",
        """e0 AS (
  SELECT c * 2 AS src, s * 2 + 1 AS dst FROM pairs
  UNION ALL
  SELECT s * 2 + 1 AS src, c * 2 AS dst FROM pairs)""",
    ]
    for r in range(rounds):
        ctes.append(f"""k{r} AS (
  SELECT src AS node FROM e{r} GROUP BY src HAVING count(*) >= {k})""")
        ctes.append(f"""e{r + 1} AS (
  SELECT e.src, e.dst FROM e{r} e
  JOIN k{r} a ON a.node = e.src
  JOIN k{r} b ON b.node = e.dst)""")
    return ("WITH " + ",\n".join(ctes)
            + f"""
SELECT src AS node, CAST(count(*) AS BIGINT) AS degree
FROM e{rounds} GROUP BY src""")


@query("supplier_kcore", oracle=_kcore_oracle(KCORE_K, KCORE_ROUNDS))
def supplier_kcore(spark, sf_dir):
    """Dense-backbone extraction on the derived customer–supplier
    graph: {k}-core peeling, {r} rounds, every round oracle-replayed —
    the third graph primitive beside connected components
    (dedup_clusters) and PageRank/LPA (centrality/communities).""".format(
        k=KCORE_K, r=KCORE_ROUNDS)
    from streamforge_spark.operators.graph import kcore_peel
    lineitem, orders = prep(spark, sf_dir, "lineitem", "orders")
    pairs = (lineitem.join(orders,
                           lineitem["l_orderkey"] == orders["o_orderkey"])
             .groupBy(F.col("o_custkey").alias("c"),
                      F.col("l_suppkey").alias("s"))
             .agg(F.lit(1).alias("_one")))
    fwd = pairs.select((F.col("c") * 2).alias("src"),
                       (F.col("s") * 2 + 1).alias("dst"))
    rev = pairs.select((F.col("s") * 2 + 1).alias("src"),
                       (F.col("c") * 2).alias("dst"))
    return kcore_peel(fwd.unionByName(rev), k=KCORE_K, rounds=KCORE_ROUNDS)


_LINKPRED_ORACLE = """
WITH cs AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
deg AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS d FROM cs GROUP BY c),
pairs AS (
  SELECT a.s AS s1, b.s AS s2, a.c
  FROM cs a JOIN cs b ON a.c = b.c AND a.s < b.s)
SELECT s1, s2,
       CAST(COUNT(*) AS BIGINT) AS common_customers,
       SUM(1000000 // d.d) AS ra_ppm
FROM pairs p JOIN deg d ON p.c = d.c
GROUP BY s1, s2
ORDER BY ra_ppm DESC, s1, s2
LIMIT 20
"""


@query("supplier_link_pred", oracle=_LINKPRED_ORACLE)
def supplier_link_pred(spark, sf_dir):
    """Link prediction on the customer-supplier bipartite graph: the
    20 supplier pairs most likely to be substitutes/collaborators by
    the Resource-Allocation index — RA(s1,s2) = sum over shared
    customers of 1/degree(customer), in exact ppm (integer floor
    division, so the sum is an exact BIGINT; Adamic-Adar's 1/log
    would drag libm into the oracle).

    Scale: the fact table collapses to the DISTINCT (customer,
    supplier) incidence list first (one map-side-combined rollup);
    pair generation is the posting-list self-join PER CUSTOMER —
    quadratic only in per-customer degree, never corpus-wide (the
    same inverted-index discipline as dedup_ngram_jaccard), and a
    hot-customer cap (degree ceiling before pairing) is one filter
    away.  Top-20 rides TakeOrderedAndProject, no full sort.
    """
    lineitem, orders = prep(spark, sf_dir, "lineitem", "orders")
    cs = (lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
          .select(F.col("o_custkey").alias("c"),
                  F.col("l_suppkey").alias("s"))
          .distinct()
          .localCheckpoint(eager=False))
    deg = cs.groupBy("c").agg(F.count(F.lit(1)).alias("d"))
    a = cs.select("c", F.col("s").alias("s1"))
    b = cs.select("c", F.col("s").alias("s2"))
    return (a.join(b, "c").where(F.col("s1") < F.col("s2"))
            .join(deg, "c")
            .groupBy("s1", "s2")
            .agg(F.count(F.lit(1)).alias("common_customers"),
                 F.sum(F.expr("1000000 DIV d")).alias("ra_ppm"))
            .orderBy(F.col("ra_ppm").desc(), "s1", "s2")
            .limit(20))
