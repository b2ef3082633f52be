"""Pair generation over shared features (SURVEY.md §2.3 J8).

The reference does ``combinations(sorted(works), 2)`` per feature
(relations.py:393,542,596,740). The Spark form is a self-join of the
(feature, work) edge table on the feature key with a ``w1 < w2`` residual.

Skew: hub features (a topic shared by 10^5 works) blow up quadratically.
``pair_join`` salts the heavy hitters for real: keys whose member count
exceeds ``heavy_threshold`` are routed through a salted join — the left
side gets ``salt = hash(w1) % s`` and the right side is replicated across
all ``s`` salt values, with the salt IN the join key, so one hub key's pair
generation spreads over ``s`` reducers. Light keys take the plain join (no
replication cost). AQE's skew join still covers moderate skew when salting
is off. ``first_partner`` reproduces the
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
    heavy_threshold: int = 1000,
) -> DataFrame:
    """(key, work) → (key, w1, w2) with w1 < w2 (unordered pairs).

    ``key`` may be a composite (list of columns). With ``salt_partitions``
    = s, keys with more than ``heavy_threshold`` members are pair-joined
    with a salted key: left side salt = xxhash64(w1) % s, right side
    replicated across all s salts, join on (key, salt) — each (w1, w2) pair
    matches exactly once (w1's salt appears once among w2's replicas), and
    a hub key's quadratic work spreads over s shuffle partitions. Light
    keys go through the plain equi-join, so the s× replication cost is paid
    only where it buys parallelism.
    """
    keys = [key] if isinstance(key, str) else list(key)
    fw = feat_works.select(*keys, F.col(work).alias("_w")).distinct()
    if not salt_partitions:
        a = fw.select(*keys, F.col("_w").alias("w1"))
        b = fw.select(*keys, F.col("_w").alias("w2"))
        return (a.join(b, keys).filter(F.col("w1") < F.col("w2"))
                .select(*keys, "w1", "w2"))

    s = int(salt_partitions)
    counts = fw.groupBy(*keys).agg(F.count("*").alias("_n"))
    heavy_keys = counts.filter(F.col("_n") > heavy_threshold).select(*keys)
    heavy = fw.join(F.broadcast(heavy_keys), keys, "left_semi")
    light = fw.join(F.broadcast(heavy_keys), keys, "left_anti")

    la = light.select(*keys, F.col("_w").alias("w1"))
    lb = light.select(*keys, F.col("_w").alias("w2"))
    light_pairs = la.join(lb, keys).filter(F.col("w1") < F.col("w2"))

    ha = heavy.select(
        *keys, F.col("_w").alias("w1"),
        F.pmod(F.xxhash64("_w"), F.lit(s)).cast("int").alias("_salt"))
    hb = heavy.select(*keys, F.col("_w").alias("w2")).withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(s - 1))))
    heavy_pairs = (
        ha.join(hb, [*keys, "_salt"]).filter(F.col("w1") < F.col("w2")))

    return light_pairs.select(*keys, "w1", "w2").unionByName(
        heavy_pairs.select(*keys, "w1", "w2"))


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
