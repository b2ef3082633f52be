"""Connected components — entity canonicalization (north rule; SURVEY §4.3).

Alternating large-star/small-star style fixpoint implemented directly on
DataFrames (no GraphFrames dependency): each node converges to the minimum
node id reachable from it. Used by the canonicalization stage to merge
duplicate-entity candidate pairs (MinHash-LSH output) into clusters.

Scale notes: each iteration is one-hop min propagation followed by a
pointer-doubling label compression (label := label-of-label), so the
propagation horizon doubles per round and convergence is O(log diameter)
rounds — 30 iterations cover diameters up to 2^30. ``localCheckpoint``
truncates lineage so plans do not grow across rounds. Exiting via
``max_iterations`` without reaching the fixpoint raises (silently
non-converged labels would corrupt canonicalization downstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ..session import lazy_checkpoint


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 30,
) -> DataFrame:
    """edges(src, dst) → (node, component) with component = min node id.

    Node ids are compared as-is (strings compare lexicographically —
    fine for canonicalization where any stable representative works).

    Raises ``RuntimeError`` if the fixpoint is not reached within
    ``max_iterations`` (with pointer doubling that needs diameter > 2^30).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    ).transform(lazy_checkpoint)  # materialized by the n_edges count below
    # right-size the fixpoint's shuffle width to the data: canonicalization
    # edge sets are usually dimension-sized, and running every tiny
    # iteration at the session's full shuffle width spends more time
    # scheduling tasks than computing (measured: the CC loop dominated the
    # canonicalize stage's fixed cost at bench scale)
    n_edges = sym.count()
    parts = max(2, min(int(sym.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32")), n_edges // 100_000 + 1))
    # lazy: the first fixpoint round's action materializes sym + labels in
    # the same job instead of two extra up-front jobs
    sym = sym.repartition(parts, "a").transform(lazy_checkpoint)
    labels = (
        sym.groupBy("a")
        .agg(F.min("b").alias("mb"))
        .select(F.col("a").alias("node"), F.least("a", "mb").alias("comp"))
        .repartition(parts, "node")
    ).transform(lazy_checkpoint)

    converged = False
    for _ in range(max_iterations):
        # propagate: node's comp = min(own comp, neighbors' comps)
        nbr = (
            sym.join(labels.withColumnRenamed("node", "b"), "b")
            .groupBy("a")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(nbr.withColumnRenamed("a", "node"), "node", "left")
            .select(
                "node",
                F.col("comp").alias("_old"),
                F.least(F.col("comp"), F.coalesce("nbr_comp", "comp")).alias("comp"),
            )
        )
        # pointer doubling: comp := comp-of-comp, so the label horizon
        # doubles each round (O(log diameter) instead of O(diameter)).
        # The changed flag is computed inside the same pass (comp vs the
        # carried-through old label). The checkpoint is LAZY and the
        # convergence aggregate is the round's ONLY action: it materializes
        # the checkpoint blocks and returns max(_chg) in the same job, so
        # each fixpoint round costs exactly one scheduler round-trip.
        parent = new_labels.select(
            F.col("node").alias("_p"), F.col("comp").alias("_pcomp"))
        new_labels = (
            new_labels.join(parent, new_labels["comp"] == parent["_p"], "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce("_pcomp", "comp")).alias("comp"),
                (F.least(F.col("comp"), F.coalesce("_pcomp", "comp"))
                 != F.col("_old")).alias("_chg"),
            )
        ).transform(lazy_checkpoint)
        changed = new_labels.agg(
            F.coalesce(F.max(F.col("_chg").cast("int")), F.lit(0)).alias("c")
        ).collect()[0]["c"]
        labels = new_labels.drop("_chg")
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within {max_iterations} "
            "iterations — labels would be inconsistent; raise max_iterations")
    return labels.select("node", F.col("comp").alias("component"))
