"""Distributed graph utilities built from DataFrame primitives.

`connected_components` is the workhorse: near-dup clustering over an
LSH candidate-pair graph (queries/dedup.py), entity resolution over
match edges, lineage grouping — any place pairwise links must become
group labels. It is the Pregel min-label-propagation loop expressed
with joins and aggregations only, so it runs anywhere DataFrames do
(no GraphX/Scala dependency, no RDDs).

Scale notes: each round is one shuffle on node id; the edge list is
localCheckpointed once up front; convergence is detected by an exact
DECIMAL sum of labels (strictly decreasing until fixpoint — one 1-row
action per round, never collecting node data). Rounds = graph
diameter, which is small for near-dup graphs; the alternating
large-star/small-star formulation is the published drop-in for graphs
where it is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _snap_persistent(sc):
    """Map of currently-persisted RDDs (id -> JavaRDD), {} on failure."""
    try:
        m = sc._jsc.getPersistentRDDs()
        return {int(k): m.get(k) for k in m.keySet().toArray()}
    except Exception:
        return {}


def _free(rdds) -> None:
    for r in rdds:
        try:
            r.unpersist(False)
        except Exception:
            pass


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    node_col: str = "node",
    max_rounds: int = 50,
) -> DataFrame:
    """Label every node with the minimum node id reachable through
    undirected edges. Returns (node, label) — `label` is the
    component's min id, so `node == label` selects one deterministic
    representative ("keeper") per component.

    `edges` is treated as undirected (both directions are added).
    `nodes` optionally supplies the node universe; ids appearing only
    there come back as singleton components. Node ids must be numeric
    (labels propagate through MIN and the convergence test sums them).
    """
    sc = edges.sparkSession.sparkContext

    def checkpoint(df):
        """localCheckpoint + the persisted blocks it created, so a
        superseded table's blocks can be freed precisely. A long
        session (the driver's verify loop builds every registry query
        in one SparkSession) then holds two checkpointed tables — the
        edge list and the live labels — not one per round."""
        before = set(_snap_persistent(sc))
        out = df.localCheckpoint(eager=True)
        blocks = [
            r for i, r in _snap_persistent(sc).items() if i not in before
        ]
        return out, blocks

    und, _ = checkpoint(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).union(
            edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
        )
    )
    universe = und.select(F.col("src").alias(node_col))
    if nodes is not None:
        universe = universe.union(nodes.select(F.col(node_col)))
    lbl, lbl_blocks = checkpoint(
        universe.distinct().select(
            F.col(node_col).alias("node"), F.col(node_col).alias("label")
        )
    )
    prev_sum = None
    for _ in range(max_rounds):
        msgs = und.join(lbl, und.src == lbl.node).select(
            F.col("dst").alias("node"), "label"
        )
        lbl_new, new_blocks = checkpoint(
            lbl.union(msgs).groupBy("node").agg(F.min("label").alias("label"))
        )
        cur_sum = (
            lbl_new.agg(F.sum(F.col("label").cast("decimal(38,0)")).alias("s"))
            .collect()[0]
            .s
        )
        _free(lbl_blocks)  # superseded round's label blocks
        lbl, lbl_blocks = lbl_new, new_blocks
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return lbl.select(F.col("node").alias(node_col), "label")
