"""Pair generation over shared features (SURVEY.md §2.3 J8).

The reference does ``combinations(sorted(works), 2)`` per feature
(relations.py:393,542,596,740). The Spark form is a self-join of the
(feature, work) edge table on the feature key with a ``w1 < w2`` residual.

Skew: hub features (a topic shared by 10^5 works) blow up quadratically.
``pair_join`` salts the heavy hitters: a feature with n works is split into
s = ceil(n / cap) salt buckets on one side only when requested; AQE's skew
join handles moderate skew automatically. ``first_partner`` reproduces the
reference's *first-pair-wins* actualization linking (add_actualization's
early return, relations.py:252-253): for sorted works w1<…<wn, the first
pair containing w1 is (w1, w2) and the first pair containing wk (k≥2) is
(w1, wk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pair_join(
    feat_works: DataFrame,
    key: str | list[str] = "tgt",
    work: str = "work",
    salt_partitions: int | None = None,
) -> DataFrame:
    """(key, work) → (key, w1, w2) with w1 < w2 (unordered pairs).

    ``key`` may be a composite (list of columns). With ``salt_partitions``
    the left side is repartitioned on (key, salt) before the join to spread
    hub keys; correctness is unchanged because the join key is still
    ``key`` alone.
    """
    keys = [key] if isinstance(key, str) else list(key)
    a = feat_works.select(*keys, F.col(work).alias("w1")).distinct()
    b = feat_works.select(*keys, F.col(work).alias("w2")).distinct()
    if salt_partitions:
        a = a.repartition(salt_partitions, *keys, F.pmod(F.xxhash64("w1"), F.lit(16)))
    pairs = a.join(b, keys).filter(F.col("w1") < F.col("w2"))
    return pairs.select(*keys, "w1", "w2")


def first_partner(
    feat_works: DataFrame,
    key: str | list[str] = "tgt",
    work: str = "work",
) -> DataFrame:
    """(key, work, rel_w1, rel_w2): the canonical pair of the *first*
    combination each work appears in (reference's first-pair-wins rule)."""
    keys = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*keys)
    fw = feat_works.select(*keys, work).distinct()
    fw = fw.withColumn("_min", F.min(work).over(w))
    second = (
        fw.filter(F.col(work) > F.col("_min"))
        .groupBy(*keys)
        .agg(F.min(work).alias("_second"))
    )
    fw = fw.join(second, keys, "left")
    return fw.select(
        *keys,
        F.col(work).alias("work"),
        F.col("_min").alias("rel_w1"),
        F.when(F.col(work) == F.col("_min"), F.col("_second"))
        .otherwise(F.col(work))
        .alias("rel_w2"),
    ).filter(F.col("rel_w2").isNotNull())
