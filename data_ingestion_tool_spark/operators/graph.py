"""Iterative graph operator: connected components (hash-min label
propagation) — turns near-duplicate PAIRS into dedup CLUSTERS.

A near-dup pipeline ends with "keep one document per duplicate
cluster", and clusters are the connected components of the pair graph.
Spark has no built-in CC; this is the canonical iterative-DataFrame
implementation:

    label(v) = v initially
    repeat: label(v) = min(label(v), min(label(u)) over edges u~v)
    until no label changes

Each iteration is one join + one aggregate (all codegen'd); the loop
lives on the driver with a convergence check on a count. Iterations
needed = graph diameter (near-dup clusters are tiny and dense, so 2-4
in practice). At 100 TB the same loop runs with the edge list
partitioned by vertex — the standard BSP hash-min algorithm — with
``persist``/``localCheckpoint`` per round to cut the growing lineage
(without it, iteration N replays all N-1 prior joins and the plan
grows superlinearly).
"""

from __future__ import annotations
from ..plans.pin import pin, unpin

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    num_partitions: int | None = None,
) -> DataFrame:
    """(node, component) for every node in the edge list; component id =
    min node id in the component. Deterministic.

    ``num_partitions`` sizes the per-iteration shuffles — size it to the
    EDGE LIST (usually tiny relative to the corpus: only near-dup pairs),
    not the session default; every iteration pays it twice.
    """
    spark = edges.sparkSession
    parts = num_partitions or max(
        2, min(int(spark.conf.get("spark.sql.shuffle.partitions")), 8)
    )
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .repartition(parts, "u")
        .persist()
    )
    # Round-13 iteration diet (guide §2.4, §1.2): the old loop paid 3
    # shuffles + 2 jobs per round (nbr re-shuffle of sym by v, the
    # left-join re-shuffle, and a separate old-vs-new JOIN just to
    # detect convergence). Now:
    #   * labels START one round ahead — min(self, neighbors) is the
    #     node set (distinct included) AND propagation round 1, fused
    #     into one aggregation of the persisted sym;
    #   * each round joins sym on u (its persisted partitioning),
    #     aggregates min over the neighbor side, and carries the OLD
    #     label as a column so convergence is a filter over the pinned
    #     result, not a join.
    labels = (
        sym.groupBy("u")
        .agg(F.least(F.col("u"), F.min("v")).alias("comp"))
        .select(F.col("u").alias("node"), "comp")
        .transform(pin, eager=True)
    )
    prev_pinned = labels
    for _ in range(max_iter):
        # min label reachable via one hop: send each node's label to
        # every neighbor along the u→v orientation (sym is symmetric)
        nbr = (
            sym.join(labels, sym.u == labels.node)
            .groupBy("v")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(nbr, labels.node == nbr.v, "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
                ).alias("comp"),
                F.col("comp").alias("old_comp"),
            )
            .transform(pin, eager=True)  # cut lineage each round
        )
        changed = (
            new_labels.filter(F.col("comp") != F.col("old_comp"))
            .limit(1)
            .count()
        )
        labels = new_labels.select("node", "comp")
        # the new round is materialized (eager pin) — the previous
        # round's blocks are dead; free them instead of accumulating
        # one block set per round for the life of the loop
        unpin(prev_pinned)
        prev_pinned = new_labels
        if changed == 0:
            break
    else:
        # exhausting max_iter without convergence means labels are still
        # moving — silently returning would yield SPLIT components (one
        # real cluster reported as several); keep the failure loud.
        sym.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "iterations (graph diameter exceeds max_iter); raise "
            "max_iter — near-dup cluster graphs normally converge in "
            "2-4 rounds"
        )
    sym.unpersist()
    return labels.select("node", "comp")


def dedup_clusters(
    pairs: DataFrame,
    all_ids: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Full dedup resolution: near-dup pairs → components → one keeper
    (min id) per cluster; singletons keep themselves. Returns
    (doc_id, keeper_id, cluster_size)."""
    comp = connected_components(pairs)
    ids = all_ids.select(F.col(id_col).alias("node")).distinct()
    labeled = ids.join(comp, "node", "left").select(
        "node", F.coalesce("comp", F.col("node")).alias("comp")
    )
    sizes = labeled.groupBy("comp").agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size"),
        F.min("node").alias("keeper_id"),
    )
    return labeled.join(sizes, "comp").select(
        F.col("node").alias(id_col), "keeper_id", "cluster_size"
    )


def hierarchy_closure(
    nodes: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent",
    max_iter: int = 25,
) -> DataFrame:
    """(node, root_id, depth) for every node of a forest given as
    (id, parent) rows (parent NULL ⇒ root). Spark has no recursive CTE;
    this is the pointer-doubling (path-halving) loop: each round, every
    unresolved node jumps its pointer to its pointer's pointer and adds
    the distances, so resolved path length DOUBLES per iteration —
    max_iter=25 covers depth 2^25. The driver loop carries only a
    convergence count; each round is one self-join (all codegen), with
    ``localCheckpoint`` cutting the iterative lineage.

    Deterministic: the forest is a function of the input; no RNG, no
    ordering sensitivity. Raises if unresolved rows remain after
    max_iter (a parent cycle — not a forest — would otherwise spin
    forever and silently return garbage).
    """
    state = nodes.select(
        F.col(id_col).alias("node"),
        F.coalesce(F.col(parent_col), F.col(id_col)).alias("ptr"),
        F.when(F.col(parent_col).isNull(), F.lit(0)).otherwise(F.lit(1)).alias(
            "dist"
        ),
        F.col(parent_col).isNull().alias("done"),
    ).transform(pin, eager=True)
    for _ in range(max_iter):
        pending = state.filter(~F.col("done")).limit(1).count()
        if pending == 0:
            break
        # Frontier split (round 13, guide §2.3): DONE rows pass through
        # unchanged — routing them around the join means only the
        # shrinking unresolved frontier pays the two join shuffles each
        # round (the union concatenates partitions, no shuffle). The
        # jump TARGET side stays the full state: pointers resolve onto
        # already-done roots.
        act = state.filter(~F.col("done"))
        res = state.filter(F.col("done"))
        tgt = state.select(
            F.col("node").alias("t_node"),
            F.col("ptr").alias("t_ptr"),
            F.col("dist").alias("t_dist"),
            F.col("done").alias("t_done"),
        )
        stepped = act.join(tgt, act.ptr == tgt.t_node, "left").select(
            "node",
            F.col("t_ptr").alias("ptr"),
            (F.col("dist") + F.col("t_dist")).alias("dist"),
            F.col("t_done").alias("done"),
        )
        prev_pinned = state
        state = res.unionByName(stepped).transform(pin, eager=True)
        unpin(prev_pinned)  # freed once the new round is materialized
    else:
        # The loop checks convergence at the TOP of each round, so a
        # forest that resolves exactly on round max_iter exits the
        # `for` without ever observing pending == 0 — re-check before
        # declaring a cycle.
        if state.filter(~F.col("done")).limit(1).count() != 0:
            raise RuntimeError(
                f"hierarchy_closure did not resolve in {max_iter} pointer-"
                "doubling rounds (depth > 2^max_iter or a parent cycle)"
            )
    return state.select(
        "node", F.col("ptr").alias("root_id"), F.col("dist").alias("depth")
    )
