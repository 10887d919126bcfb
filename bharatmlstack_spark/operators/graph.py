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


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int | None = 3,
    until_delta: int | None = None,
    check_every: int = 5,
    max_iter: int = 60,
    symmetric: bool = False,
) -> DataFrame:
    """Integer micro-unit PageRank (damping 0.85): (node, r) with ranks in
    millionths, every contribution integer-divided (r*85 div (100*deg)) so
    each round is exact BIGINT arithmetic — bit-identical across engines
    and partitionings with no float fold anywhere.

    Two modes:
    - ``iters=k``: exactly k rounds, plan-stacked (the driver only stacks
      lineage; no data returns). Right for small fixed k.
    - ``until_delta=d`` (micro-units): iterate until max |r - r_prev| <= d,
      checking (one small agg action) and TRUNCATING LINEAGE via
      localCheckpoint every ``check_every`` rounds — the convergence-mode
      loop. Without the checkpoint a 20+-round plan grows one join+agg per
      round and both planning time and failure-recovery replay blow up;
      with it the live plan never exceeds check_every rounds
      (plan-asserted in tests/test_plans.py). Convergence is therefore
      decided at checkpoint boundaries, so the round count is always a
      multiple of check_every — deterministic for a given dataset.

    Per round: one join-on-src + one partial-agg-on-dst shuffle over the
    persisted degree-folded edge list — the same shape at any scale.

    Works on arbitrary DIRECTED edge lists: rank is seeded over
    distinct(src) UNION distinct(dst), and nodes WITHOUT in-edges — which
    a dst-side aggregate rebuild would silently drop after round 1, losing
    their downstream contributions — are re-unioned each round at their
    (constant after round 1) teleport rank 150_000. Seed and no-in-edge
    sets both derive from ONE persisted endpoint aggregate (node,
    has_in = max over a 0/1 endpoint flag) — one shuffle where the naive
    form (distinct ∪ distinct for the seed, distinct + distinct +
    anti-join for no_in) pays four. Conservation then costs a
    shuffle-free unionAll of that persisted frame per round, not a join;
    on symmetric graphs (the co-purchase callers) the no-in branch is
    empty. Dangling mass (nodes with no OUT-edges) is dropped, not
    redistributed — the simplified-PageRank convention.

    Two structural constant-folds (guide §1.2 "the distributed
    algorithm", §2.4 "remove shuffles outright"), both value-identical:

    - **Round 1 never joins.** Every node's seed rank is the constant
      1_000_000, so round 1's contribution is ``(1_000_000*85) div
      (100*d)`` — a row-local expression over the checkpointed edge
      list. The generic round's e⋈rank join (and the rank-side shuffle
      feeding it) is folded away; the join's only other effect —
      restricting to e.src ∈ universe — is vacuous because the universe
      contains every src by construction. Rounds 2+ join as before.
    - ``symmetric=True`` (caller-asserted: the edge list was built as
      pairs ∪ reversed(pairs)): every src is also a dst, so the no-in
      set is empty by construction and the endpoint aggregate + its
      materialization + the isEmpty probe are skipped outright; the
      seed universe, when a mode still needs one (iters=0 /
      until_delta), is distinct(src) alone. Wrongly passing it on a
      directed graph would silently drop source-only nodes — leave it
      False unless the construction guarantees symmetry.
    """
    from pyspark.sql import Window as W

    # localCheckpoint, not persist: every iteration's join re-inlines the
    # edge frame's LOGICAL subtree (scan + window + union), so a k-round
    # stacked plan re-optimizes k copies of it per action — measured 2.5 s
    # of the co-purchase caller's ~5 s at sf0.1 (OPTIMIZATION_r17.md; the
    # r16 verdict's item 4). Checkpointing materializes the same rows and
    # replaces the subtree with an RDD-backed leaf: plan size and
    # per-action optimize time stay constant in the round count
    # (guide §5 — localCheckpoint is the documented cheap lineage cut;
    # §3.3 — materialize intermediates when planning time bites). Trade:
    # executor loss forces a job restart instead of partition recompute —
    # the convergence loop below already made that trade.
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .withColumn("d", F.count(F.lit(1)).over(W.partitionBy("src")))
        .localCheckpoint()
    )
    if symmetric:
        # caller guarantees src set == dst set == node universe: the
        # no-in set is empty by construction — skip the endpoint
        # aggregate, its checkpoint job, and the isEmpty action
        conserve = False
        no_in = None

        def seed() -> DataFrame:
            return e.select(F.col("src").alias("node")).distinct().select(
                "node", F.lit(1_000_000).cast("bigint").alias("r")
            )
    else:
        # one endpoint aggregate yields BOTH the seed universe and the
        # no-in-edge set: has_in = 1 iff the node ever appears as a dst
        nodes = (
            e.select(F.col("src").alias("node"), F.lit(0).alias("i"))
            .unionAll(e.select(F.col("dst").alias("node"), F.lit(1).alias("i")))
            .groupBy("node")
            .agg(F.max("i").alias("has_in"))
            .localCheckpoint()
        )
        # nodes with no in-edges: absent from every dst-side aggregate,
        # rank fixed at the teleport term from round 1 on — checked once
        # against the persisted aggregate (one cheap action) so every
        # round stays a pure join+agg instead of carrying a vacuous
        # union branch
        no_in = nodes.filter(F.col("has_in") == 0).select(
            "node", F.lit(150_000).cast("bigint").alias("r")
        )
        conserve = not no_in.isEmpty()

        def seed() -> DataFrame:
            return nodes.select(
                "node", F.lit(1_000_000).cast("bigint").alias("r")
            )

    def step(r: DataFrame | None) -> DataFrame:
        if r is None:
            # round 1: rank is the uniform seed constant — fold it into
            # the contribution expression instead of joining the seed
            # frame (the join's src ∈ universe restriction is vacuous)
            contrib = e.select(
                F.col("dst"), F.expr("(1000000 * 85) div (100 * d)").alias("c")
            )
        else:
            contrib = e.join(r, e.src == r.node).select(
                F.col("dst"), F.expr("(r * 85) div (100 * d)").alias("c")
            )
        agg = contrib.groupBy(F.col("dst").alias("node")).agg(
            (F.lit(150_000) + F.sum("c")).cast("bigint").alias("r")
        )
        return agg.unionByName(no_in) if conserve else agg

    if until_delta is None:
        if int(iters) <= 0:
            return seed()
        rank: DataFrame | None = None
        for _ in range(int(iters)):
            rank = step(rank)
        return rank

    rank = seed().localCheckpoint()
    done = 0
    while done < max_iter:
        prev = rank
        for i in range(check_every):
            rank = step(None if done == 0 and i == 0 else rank)
        rank = rank.localCheckpoint()  # truncate BEFORE the check action
        done += check_every
        delta = (
            rank.alias("__cur")
            .join(prev.alias("__prev"), on="node")
            .agg(
                F.max(F.abs(F.col("__cur.r") - F.col("__prev.r"))).alias("m")
            )
            .collect()[0]["m"]
        )
        # delta is None only when the rank table is empty (no edges) —
        # trivially converged, not a failure
        if delta is None or delta <= until_delta:
            rank._pagerank_rounds = done  # test/observability hook
            return rank
    raise RuntimeError(
        f"pagerank did not reach delta<={until_delta} in {max_iter} rounds "
        f"(last delta {delta}); raise max_iter or loosen the threshold"
    )
