"""Custom-connector driver entries (Python Data Source API surface).

x04 reads through the ``synthdocs`` Python data source — a real
``spark.read.format(...)`` connector with partition-planned parallel
reads — and the DuckDB oracle regrows the identical rows from the
closed form, so the whole connector path (plan → per-partition read →
Arrow transfer → downstream exprs) is value-hash-verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from final_project_big_data_spark.queries import query
from final_project_big_data_spark.sources.pydatasource import register_sources

_N_DOCS = 500
_N_PARTS = 8


@query(
    "x04_python_datasource",
    oracle=f"""
    SELECT range AS doc_id,
           CAST(range % 4 AS INT) AS shard,
           'w' || CAST(range % 7 AS VARCHAR)
           || ' w' || CAST((range * 3) % 11 AS VARCHAR)
           || ' w' || CAST((range * 7) % 13 AS VARCHAR) AS text,
           CAST(3 AS INT) AS n_tokens
    FROM range({_N_DOCS}) ORDER BY doc_id
    """,
    category="source",
)
def x04(spark: SparkSession, sf: str) -> DataFrame:
    """Read via the custom ``synthdocs`` Python data source (8 planned
    input partitions → 8 parallel executor reads; see
    ``sources/pydatasource.py``) with a downstream JVM-side expression on
    top — the oracle recomputes every row from the source's closed form.
    """
    register_sources(spark)
    d = (
        spark.read.format("synthdocs")
        .option("n", _N_DOCS)
        .option("partitions", _N_PARTS)
        .load()
    )
    return d.select(
        "doc_id",
        "shard",
        "text",
        F.size(F.split("text", " ")).alias("n_tokens"),
    ).orderBy("doc_id")


_PR_ITER = 5
_PR_D = 0.85


def _pagerank_oracle() -> str:
    """Unrolled fixed-iteration PageRank CTE chain — the exact mirror of
    operators/pagerank.py's loop, including the per-iteration ROUND(·,10)
    that keeps both engines' floating accumulation aligned."""
    iters = "".join(
        f""",
    pr{i + 1} AS (
      SELECT n.node,
             ROUND({1 - _PR_D:.2f} / nn.n_nodes
                   + {_PR_D} * COALESCE(fl.inflow, 0), 10) AS rank
      FROM nodes n CROSS JOIN nn
      LEFT JOIN (SELECT e.dst, SUM(p.rank / d.deg) AS inflow
                 FROM pr{i} p JOIN edges e ON p.node = e.src
                 JOIN deg d ON e.src = d.src
                 GROUP BY e.dst) fl ON fl.dst = n.node
    )"""
        for i in range(_PR_ITER)
    )
    return f"""
    WITH edges AS (
      SELECT DISTINCT o_custkey % 97 AS src, o_orderkey % 89 AS dst
      FROM orders WHERE o_orderkey < 2000
    ),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
    nn AS (SELECT count(*) AS n_nodes FROM nodes),
    pr0 AS (SELECT node, 1.0 / nn.n_nodes AS rank FROM nodes CROSS JOIN nn)
    {iters}
    SELECT node, ROUND(rank, 6) AS rank FROM pr{_PR_ITER} ORDER BY node
    """


@query("x05_pagerank", oracle=_pagerank_oracle(), category="graph")
def x05(spark: SparkSession, sf: str) -> DataFrame:
    """Fixed-iteration PageRank over a deterministic orders-derived edge
    set (``operators/pagerank.py``) — the iterative-algorithm family next
    to d07's connected components, exactly oracle-checked against the
    unrolled recursive SQL.
    """
    from final_project_big_data_spark.io import load_table
    from final_project_big_data_spark.operators.pagerank import pagerank

    o = load_table(spark, sf, "orders").filter(F.col("o_orderkey") < 2000)
    edges = o.select(
        (F.col("o_custkey") % 97).alias("src"),
        (F.col("o_orderkey") % 89).alias("dst"),
    )
    pr = pagerank(edges, n_iter=_PR_ITER, damping=_PR_D)
    return pr.select("node", F.round("rank", 6).alias("rank")).orderBy("node")
