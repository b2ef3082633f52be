"""Transitive-closure fixpoint (wdt:P279* / wdt:P1647* — SURVEY.md §4.3).

Catalyst has no recursive operator; the idiomatic Spark pattern is an
iterative self-join to fixpoint, doubling path length each round
(O(log diameter) shuffles). The closures are dimension-sized (ontology
hierarchies), so this runs as a tiny preprocessing job whose result is
broadcast into the big joins (relations.py:309-311 property subsumption,
relations.py:369 etc. type checks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_closure(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
    include_self: bool = True,
) -> DataFrame:
    """All (src, dst) pairs reachable via edge chains, plus reflexive pairs.

    Doubling strategy: closure ∘ closure each round, so k rounds cover paths
    of length 2^k. Dimension-sized inputs only — results are collected
    implicitly by the fixpoint count() actions.
    """
    closure = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    if include_self:
        nodes = (
            closure.select(F.col("src").alias("n"))
            .union(closure.select(F.col("dst").alias("n")))
            .distinct()
        )
        closure = closure.union(
            nodes.select(F.col("n").alias("src"), F.col("n").alias("dst"))
        ).distinct()
    closure = closure.localCheckpoint(eager=True)
    n = closure.count()
    for _ in range(max_iterations):
        hop = (
            closure.alias("a")
            .join(closure.alias("b"), F.col("a.dst") == F.col("b.src"))
            .select(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
        )
        new_closure = closure.union(hop).distinct().localCheckpoint(eager=True)
        m = new_closure.count()
        if m == n:
            return new_closure
        closure, n = new_closure, m
    return closure


def subclass_closure_from_statements(statements: DataFrame) -> DataFrame:
    """Build wd_subclass_closure(qid, ancestor) from raw P279 edges."""
    edges = statements.filter(F.col("pid") == "P279").select(
        F.col("subject_qid").alias("src"), F.col("object_value").alias("dst")
    )
    return transitive_closure(edges).select(
        F.col("src").alias("qid"), F.col("dst").alias("ancestor")
    )


def property_closure_from_statements(statements: DataFrame) -> DataFrame:
    """Build wd_property_closure(pid, base_pid) from raw P1647 edges."""
    edges = statements.filter(F.col("pid") == "P1647").select(
        F.col("subject_qid").alias("src"), F.col("object_value").alias("dst")
    )
    return transitive_closure(edges).select(
        F.col("src").alias("pid"), F.col("dst").alias("base_pid")
    )
