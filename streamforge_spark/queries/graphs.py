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
    return pagerank(edges, rounds=PR_ROUNDS, scale=PR_SCALE)
