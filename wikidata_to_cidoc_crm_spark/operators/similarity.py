"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k as the exact baseline, and a random-hyperplane
LSH-bucketed variant as the scale path. Dot products run as
``F.aggregate``/``F.zip_with`` column expressions (JVM-side, codegen) —
no Python UDFs.

Scale notes: brute force is O(Q·N) — fine when the query side broadcasts;
the LSH variant buckets both sides (one shuffle on the bucket key) and
searches only within buckets, trading recall for a ~buckets× reduction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# the top-k operators broadcast the query side by contract ("queries are
# small"); above this many rows that contract is being misused and the
# broadcast would OOM executors — fail loudly instead (same policy as
# linking.MAX_SURFACES)
QUERY_BROADCAST_MAX = 1_000_000


def _pin_query_side(queries: DataFrame, op: str) -> DataFrame:
    """Guard + pin: materialize the (limit-bounded) query side once.

    The eager local checkpoint serves BOTH the guard count and the real
    top-k job, so the guard does not execute the query-side plan an extra
    time (ADVICE r3); the ``limit`` bounds the scan so an oversized query
    side fails loudly without being fully computed.
    """
    pinned = queries.limit(QUERY_BROADCAST_MAX + 1).localCheckpoint(eager=True)
    if pinned.count() > QUERY_BROADCAST_MAX:
        raise ValueError(
            f"{op}: query side exceeds QUERY_BROADCAST_MAX="
            f"{QUERY_BROADCAST_MAX} rows and cannot be broadcast — "
            "block/partition the queries (e.g. run per-shard) instead")
    return pinned


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def with_cosine(df: DataFrame, a: str, b: str, out: str = "cosine") -> DataFrame:
    ca = F.transform(F.col(a), lambda x: x.cast("double"))
    cb = F.transform(F.col(b), lambda x: x.cast("double"))
    return df.withColumn(out, _dot(ca, cb) / (_norm(ca) * _norm(cb)))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """(query_id, neighbor_id, score): exact top-k by cosine, self excluded.

    ``queries`` is broadcast (small side); candidates ranked by
    (score desc, neighbor_id) for deterministic ties.
    """
    queries = _pin_query_side(queries, "brute_force_topk")
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("q_vec"))
    v = vectors.select(F.col(id_col).alias("neighbor_id"),
                       F.col(vec_col).alias("v_vec"))
    joined = v.crossJoin(F.broadcast(q)).filter(
        F.col("query_id") != F.col("neighbor_id"))
    joined = with_cosine(joined, "q_vec", "v_vec", "score")
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id"))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("score", round_to).alias("score"))
    )


def hyperplane_buckets(
    vectors: DataFrame,
    dim: int,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """(id, bucket): sign pattern against `planes` pseudo-random hyperplanes.

    Hyperplane components derive from a hash of (seed, plane, dim-index) —
    deterministic, generated as a column expression, no RNG state.
    ``hash_mode="xxhash64"`` is the fast production path;
    ``hash_mode="md5"`` derives components as
    ``conv(substr(md5('{seed}_{p}_{i}'), 1, 6), 16, 10) % 1000 / 500 - 1``,
    which ANSI engines (DuckDB: ``CAST('0x' || substr(md5(...), 1, 6) AS
    BIGINT)``) can replicate bit-for-bit — used by the driver oracle twin.
    """
    def plane_component(p, i):
        if hash_mode == "md5":
            h = F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{seed}_{p}_"), i.cast("string"))),
                    1, 6),
                16, 10).cast("long")
        else:
            h = F.xxhash64(F.lit(seed), F.lit(p), i)
        return (h % 1000).cast("double") / 500.0 - 1.0

    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bits = []

    def comps_for(p):
        # NOTE: must be a one-arg lambda — a two-arg lambda (even with a
        # default like ``p=p``) is treated by F.transform as
        # (element, index) and the second arg silently becomes the array
        # index Column
        return F.transform(F.sequence(F.lit(0), F.lit(dim - 1)),
                           lambda i: plane_component(p, i))

    for p in range(planes):
        comps = comps_for(p)
        proj = F.aggregate(F.zip_with(vec, comps, lambda x, c: x * c),
                           F.lit(0.0), lambda acc, v: acc + v)
        bits.append(F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return vectors.select(F.col(id_col).alias("id"), bucket.alias("bucket"))


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 3,
    planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_hamming: int = 2,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Approximate top-k with multi-probe LSH.

    Candidates come from every bucket whose sign-signature is within
    ``probe_hamming`` bit flips of the query's bucket (standard multi-probe:
    a near neighbor differs from the query on few hyperplane signs with
    high probability). probe_hamming=2 with 6 planes scans 22/64 buckets —
    a ~3× candidate reduction at near-perfect recall; tune planes up /
    probes down as N grows. Recall@k vs ``brute_force_topk`` is pytest-gated
    on the driver testdata (tests/test_operators.py).
    """
    queries = _pin_query_side(queries, "lsh_topk")
    masks = [0]
    if probe_hamming >= 1:
        masks += [1 << i for i in range(planes)]
    if probe_hamming >= 2:
        masks += [(1 << i) | (1 << j)
                  for i in range(planes) for j in range(i + 1, planes)]
    if probe_hamming > 2:
        raise ValueError("probe_hamming > 2 not supported")
    vb = hyperplane_buckets(vectors, dim, planes, id_col, vec_col,
                            hash_mode=hash_mode)
    qb = hyperplane_buckets(queries, dim, planes, id_col, vec_col,
                            hash_mode=hash_mode)
    v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v_vec")) \
        .join(vb.withColumnRenamed("id", "neighbor_id"), "neighbor_id")
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")) \
        .join(qb.withColumnRenamed("id", "query_id"), "query_id")
    q = q.withColumn("_m", F.explode(F.array(*[F.lit(m) for m in masks]))) \
        .withColumn("bucket", F.col("bucket").bitwiseXOR(F.col("_m"))).drop("_m")
    joined = v.join(F.broadcast(q), "bucket").filter(
        F.col("query_id") != F.col("neighbor_id")).dropDuplicates(
        ["query_id", "neighbor_id"])
    joined = with_cosine(joined, "q_vec", "v_vec", "score")
    # rank on the 4-decimal-rounded score: float-association noise between
    # engines is ~1e-15, far below the 5e-5 rounding grain, so the ranking
    # (and hence the oracle twin) is bit-stable; ties break on neighbor_id
    joined = joined.withColumn("score", F.round("score", 4))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id"))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "score")
    )


def cosine_near_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(a, b, score) all pairs with cosine ≥ threshold (exact, self-join).

    Quadratic — the near-dup oracle for small/verification runs; production
    path blocks through `hyperplane_buckets` first.
    """
    a = vectors.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    b = vectors.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    pairs = a.crossJoin(b).filter(F.col("a") < F.col("b"))
    pairs = with_cosine(pairs, "va", "vb", "score")
    # threshold on the ROUNDED score: keeps the cut boundary bit-stable
    # across engines (cross-engine float noise is far below the 4-decimal
    # grain, so the rounded value is identical; the raw value is not)
    pairs = pairs.withColumn("score", F.round("score", 4))
    return pairs.filter(F.col("score") >= threshold).select("a", "b", "score")
