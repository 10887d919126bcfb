"""Connected components over a pair list — the step that turns pairwise
near-duplicate matches (dedup.py's Jaccard / MinHash / SimHash pairs) into
dedup CLUSTERS, so a corpus keeps exactly one representative per group of
mutually-similar documents.

Algorithm: iterative min-label propagation. Every node starts labeled with
its own id; each round every node takes the min of its label and its
neighbors' labels; convergence when no label changes. Rounds needed =
graph diameter — for dedup graphs (stars/cliques around a canonical doc)
that is 2-3, not O(n). Each round is one shuffle (edges join labels on
node id), so the whole op is `diameter` shuffles over the EDGE list, which
for near-dup graphs is tiny relative to the corpus.

Scale notes:
- Lineage is truncated every round (localCheckpoint), so the plan doesn't
  grow with iterations and failure recovery replays one round, not all.
- The convergence check is a count over the changed-label join — one cheap
  action per round.
- For adversarial long-chain graphs, swap in alternating large-star /
  small-star (Kiveris et al.) — same join primitives, O(log n) rounds;
  dedup graphs never need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    nodes: DataFrame | None = None,
    id_col: str | None = None,
    max_iter: int = 50,
) -> DataFrame:
    """(node, component) for every node, component = min node id reachable.

    ``edges`` is undirected (symmetrized internally). ``nodes`` optionally
    supplies the full node universe (isolated nodes become their own
    singleton components) — pass the corpus id column so un-matched docs
    appear in the output.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))

    endpoint_nodes = sym.select(F.col("u").alias("node")).distinct()
    if nodes is not None:
        nid = id_col or nodes.columns[0]
        universe = nodes.select(F.col(nid).alias("node")).distinct()
    else:
        universe = endpoint_nodes

    labels = universe.select("node", F.col("node").alias("label")).localCheckpoint()
    sym = sym.localCheckpoint()

    for _ in range(max_iter):
        msgs = (
            sym.join(labels, sym.u == labels.node)
            .select(F.col("v").alias("node"), F.col("label"))
            .groupBy("node")
            .agg(F.min("label").alias("nbr_min"))
        )
        new_labels = (
            labels.join(msgs, on="node", how="left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nbr_min"), F.col("label"))).alias(
                    "label"
                ),
                (F.col("nbr_min") < F.col("label")).alias("__chg"),
            )
            .localCheckpoint()
        )
        changed = new_labels.filter(F.col("__chg")).count()
        labels = new_labels.drop("__chg")
        if changed == 0:
            break
    else:
        # labels still moving when max_iter ran out: partial min-labels
        # would silently split one cluster into several, and downstream
        # dedup_survivors would keep multiple members of one cluster.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); graph diameter exceeds "
            "max_iter — raise max_iter or use star-contraction for "
            "long-chain graphs"
        )

    return labels.select("node", F.col("label").alias("component"))
