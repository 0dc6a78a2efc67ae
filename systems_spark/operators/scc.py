"""Strongly connected components over a DIRECTED edge table.

The directed completion of ``dedup/clusters.py connected_components``:
mutual-reachability classes, the structure behind cycle detection in
dependency graphs, "mutually substitutable item" sets in transition
graphs, and dead-state pruning in session flows. Undirected CC treats
v→w as symmetric; SCC must prove BOTH directions.

Algorithm — Orzan-style forward coloring + backward confirmation (the
standard distributed SCC scheme; no Tarjan stack, nothing driver-side):

repeat until no active nodes:
  1. FORWARD COLORING: f(v) ← min id reachable FROM v, by iterating
     f(v) ← min(f(v), f(w)) over active edges v→w to fixpoint — one
     equi-join + map-side min-agg per inner round, converging like the
     CC label loop (monotone label-sum invariant).
  2. FORWARD CONFIRMATION within each color class: the color root c
     (f(c) = c) is marked; marks then flow ALONG edge direction over
     same-color edges — m(w) turns true when some edge v→w has
     f(v) = f(w) and m(v). Monotone boolean fixpoint, same loop shape.
  3. Confirmed nodes are EXACTLY SCC(c): f(v) = c already proves
     v →* c (c is in v's forward reach), and the mark proves c →* v —
     mutual reachability. Restricting both walks to same-color edges
     is lossless: any intermediate u on a v →* c or c →* v path also
     reaches c and is reached from something that v reaches, forcing
     f(u) = c (a smaller reachable id at u would propagate back to v
     and contradict f(v) = c). Confirmed nodes settle with label c;
     their rows and edges leave the active subgraph — an unconfirmed
     class member (reaches c, not reached back) stays active and
     becomes its own class root in a later round.

Each outer round settles at least every color's root, so the loop
terminates in ≤ #SCC outer rounds (dense transition graphs settle in
1-2: one giant SCC plus fringe). All state is (node, long/boolean)
rows; per inner round one narrow shuffle; every round's frame is
lineage-pinned exactly like ``connected_components``.

Determinism: the SCC label is the component's minimum node id — a
property of the graph, not the algorithm — so the result is
oracle-checkable bit-for-bit against a recursive mutual-reachability
CTE (:func:`scc_sql`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["strongly_connected_components", "scc_sql"]


def _pin(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=False)


def strongly_connected_components(edges: DataFrame, src: str = "src",
                                  dst: str = "dst",
                                  node_col: str = "node",
                                  component_col: str = "component",
                                  max_rounds: int = 50) -> DataFrame:
    """(node, component) for every node in ``edges`` (either endpoint);
    component = min node id of the node's SCC. A node on no cycle is its
    own singleton SCC. ``max_rounds`` caps BOTH loops (inner fixpoints
    and outer settle rounds) — a diverged-loop guard, not a knob."""
    e_all = _pin(edges.select(F.col(src).alias("_s"),
                              F.col(dst).alias("_d")).distinct())
    active = _pin(e_all.select(F.col("_s").alias("n"))
                  .union(e_all.select(F.col("_d").alias("n"))).distinct())
    settled = None

    for _outer in range(max_rounds):
        if active.limit(1).count() == 0:
            break
        # active edges: both endpoints still unsettled
        e = _pin(e_all
                 .join(active.withColumnRenamed("n", "_s"), on="_s", how="semi")
                 .join(active.withColumnRenamed("n", "_d"), on="_d", how="semi"))

        # -- 1. forward coloring to fixpoint --------------------------------
        f = _pin(active.select(F.col("n"), F.col("n").alias("f")))
        prev = None
        for _ in range(max_rounds):
            pulled = (e.join(f.withColumnRenamed("n", "_d"), on="_d")
                      .groupBy(F.col("_s").alias("n"))
                      .agg(F.min("f").alias("_pf")))
            f = _pin(f.join(pulled, on="n", how="left")
                     .select("n", F.least(F.col("f"),
                                          F.coalesce("_pf", "f")).alias("f")))
            cur = f.agg(F.sum(F.col("f").cast("decimal(38,0)"))).first()[0]
            if cur == prev:
                break
            prev = cur
        else:
            raise RuntimeError("scc: forward coloring did not converge")

        # -- 2. backward confirmation within color classes -------------------
        # same-color edges only; marks flow from the root backwards
        fe = _pin(e
                  .join(f.select(F.col("n").alias("_s"),
                                 F.col("f").alias("_fs")), on="_s")
                  .join(f.select(F.col("n").alias("_d"),
                                 F.col("f").alias("_fd")), on="_d")
                  .where(F.col("_fs") == F.col("_fd"))
                  .select("_s", "_d"))
        m = _pin(f.select("n", "f", (F.col("n") == F.col("f")).alias("m")))
        prev = None
        for _ in range(max_rounds):
            # marks flow ALONG edges (root → class): dst inherits src's mark
            pulled = (fe.join(m.select(F.col("n").alias("_s"),
                                       F.col("m").alias("_ms")), on="_s")
                      .groupBy(F.col("_d").alias("n"))
                      .agg(F.max("_ms").alias("_pm")))
            m = _pin(m.join(pulled, on="n", how="left")
                     .select("n", "f",
                             (F.col("m") | F.coalesce("_pm", F.lit(False)))
                             .alias("m")))
            cur = m.agg(F.sum(F.col("m").cast("long"))).first()[0]
            if cur == prev:
                break
            prev = cur
        else:
            raise RuntimeError("scc: backward confirmation did not converge")

        done = m.where(F.col("m")).select(
            F.col("n").alias(node_col), F.col("f").alias(component_col))
        settled = done if settled is None else settled.unionByName(done)
        settled = _pin(settled)
        active = _pin(active.join(
            done.select(F.col(node_col).alias("n")), on="n", how="anti"))
    else:
        raise RuntimeError(
            f"scc did not settle in {max_rounds} outer rounds")
    if settled is None:  # empty edge table
        return (e_all.select(F.col("_s").alias(node_col))
                .withColumn(component_col, F.col(node_col)).limit(0))
    return settled


def scc_sql(edges_sql: str, src: str = "src", dst: str = "dst",
            node_col: str = "node", component_col: str = "component") -> str:
    """DuckDB twin: transitive closure both ways, SCC label = min over
    {v} ∪ {w : v→*w AND w→*v}. Quadratic in the closure — the grading
    anchor, not the scale path."""
    return f"""
WITH RECURSIVE
e AS (SELECT {src} AS a, {dst} AS b FROM ({edges_sql})),
nodes AS (SELECT a AS n FROM e UNION SELECT b FROM e),
reach AS (
  SELECT a, b FROM e
  UNION
  SELECT r.a, e2.b FROM reach r JOIN e e2 ON e2.a = r.b
)
SELECT n.n AS {node_col},
       least(n.n,
             coalesce(min(CASE WHEN bk.a IS NOT NULL THEN fw.b END),
                      n.n))::BIGINT AS {component_col}
FROM nodes n
LEFT JOIN reach fw ON fw.a = n.n
LEFT JOIN reach bk ON bk.a = fw.b AND bk.b = n.n
GROUP BY n.n
"""
