"""Per-row pipeline invariants (BASELINE.json input_hint).

The span-sequence invariant: for every document flowing through the
pipeline, the ordered sequence ``(kind, text, media_ref, order)`` of its
spans is preserved end-to-end. Checked distributively: ``posexplode`` both
sides, full-outer join on (doc_id, pos), count mismatches — zero rows means
the invariant holds. At 10^12 docs this is one co-partitioned join keyed by
(doc_id, pos).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _flatten(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", F.posexplode("spans").alias("pos", "s")
    ).select(
        "doc_id",
        "pos",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
    )


def span_mismatches(before: DataFrame, after: DataFrame) -> DataFrame:
    """Rows where the span sequence diverges (order-sensitive via pos)."""
    a = _flatten(before).alias("a")
    b = _flatten(after).alias("b")
    joined = a.join(b, ["doc_id", "pos"], "full_outer")
    return joined.filter(
        F.col("a.kind").isNull()
        | F.col("b.kind").isNull()
        | (F.col("a.kind") != F.col("b.kind"))
        | (F.coalesce(F.col("a.text"), F.lit("")) != F.coalesce(F.col("b.text"), F.lit("")))
        | (
            F.coalesce(F.col("a.media_ref"), F.lit(""))
            != F.coalesce(F.col("b.media_ref"), F.lit(""))
        )
    )


def assert_span_invariant(before: DataFrame, after: DataFrame) -> None:
    bad = span_mismatches(before, after).limit(5).collect()
    if bad:
        raise AssertionError(f"span invariant violated, e.g. {bad}")
