"""k-core decomposition — dense-subgraph extraction by iterative peeling.

Fourth member of the graph family (components resolve dup clusters,
PageRank ranks importance, triangles flag near-cliques): the k-core is
the maximal subgraph where every node keeps ≥ k neighbors INSIDE the
subgraph. On a similarity graph it isolates the densely inter-linked
regions — spam/template farms and SEO link rings survive coring long
after organic near-dups are peeled away.

Algorithm: classic peeling — repeatedly delete nodes whose degree within
the surviving subgraph is < k until none remain. Each round is one
degree aggregation + one anti-join, both on (long, long) pairs; the
driver loop stops on a convergence count exactly like the
connected-components resolver (dedup/clusters.py), with periodic
``localCheckpoint`` lineage truncation. Counts are exact integers, so
the surviving set is a pure function of the graph.

Oracle strategy: peeling is a GREATEST fixpoint, which a recursive CTE
(least-fixpoint machinery) cannot express with per-level aggregation —
so the SQL twin UNROLLS a fixed number of peel levels. Peeling is
idempotent after convergence (a converged level reproduces itself), so
``unrolled(R) == converged`` for ANY R ≥ the convergence round; the
Spark side raises loudly if ``max_rounds`` is exceeded rather than
returning an unconverged set, keeping the equality honest.

100 TB shape: rounds needed = peeling depth (typically tens on
power-law graphs, not thousands); each round's shuffle carries only
surviving (node, degree) longs, shrinking monotonically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _und(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Symmetrized distinct edges, self-loops dropped."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    return (e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
            .where(F.col("a") != F.col("b"))
            .distinct())


def kcore(edges: DataFrame, k: int, src: str = "src", dst: str = "dst",
          max_rounds: int = 64, checkpoint_every: int = 4) -> DataFrame:
    """(node, core_deg) for every member of the k-core (its degree within
    the core). Raises RuntimeError when peeling hasn't converged within
    ``max_rounds`` — a silent partial core would be wrong, loudly."""
    if k < 1:
        raise ValueError("k must be >= 1")
    und = _und(edges, src, dst).localCheckpoint(eager=False)
    alive = und.select(F.col("a").alias("node")).distinct()
    n_alive = None  # previous round's survivor count doubles as |alive|
    for r in range(max_rounds):
        live = (und.join(alive.withColumnRenamed("node", "a"), on="a")
                .join(alive.withColumnRenamed("node", "b"), on="b"))
        deg = live.groupBy("a").agg(F.count(F.lit(1)).alias("_deg"))
        survivors = deg.where(F.col("_deg") >= k).select(F.col("a").alias("node"))
        if n_alive is None:
            n_alive = alive.count()
        n_surv = survivors.count()  # the ONE action per round
        if n_surv == n_alive:
            return deg.where(F.col("_deg") >= k).select(
                F.col("a").alias("node"), F.col("_deg").alias("core_deg"))
        alive, n_alive = survivors, n_surv
        if checkpoint_every and (r + 1) % checkpoint_every == 0:
            alive = alive.localCheckpoint(eager=False)
        if n_surv == 0:
            return deg.where(F.lit(False)).select(
                F.col("a").alias("node"), F.col("_deg").alias("core_deg"))
    raise RuntimeError(f"k-core peeling did not converge in {max_rounds} rounds")


def kcore_sql(edges_sql: str, k: int, src: str = "src", dst: str = "dst",
              rounds: int = 16) -> str:
    """DuckDB twin: ``rounds`` unrolled peel levels (idempotent once
    converged — choose rounds ≥ the Spark loop's convergence round, which
    the Spark side enforces by raising past ``max_rounds``)."""
    # AS MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and each
    # level references the previous one TWICE — inlining would expand the
    # plan 2^rounds times (and reopen the source file at every leaf)
    ctes = [f"raw AS MATERIALIZED ({edges_sql})",
            f"und AS MATERIALIZED (SELECT DISTINCT a, b FROM ("
            f"SELECT {src} AS a, {dst} AS b FROM raw "
            f"UNION ALL SELECT {dst}, {src} FROM raw) WHERE a <> b)",
            "a0 AS MATERIALIZED (SELECT DISTINCT a AS node FROM und)"]
    for i in range(1, rounds + 1):
        ctes.append(f"""a{i} AS MATERIALIZED (
  SELECT u.a AS node
  FROM und u
  JOIN a{i - 1} x ON x.node = u.a JOIN a{i - 1} y ON y.node = u.b
  GROUP BY 1 HAVING count(*) >= {k}
)""")
    last = f"a{rounds}"
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT u.a AS node, count(*) AS core_deg
FROM und u
JOIN {last} x ON x.node = u.a JOIN {last} y ON y.node = u.b
GROUP BY 1 HAVING count(*) >= {k}
""")
