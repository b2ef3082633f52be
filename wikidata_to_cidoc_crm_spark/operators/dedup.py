"""Deduplication operators for the training-data pipeline.

Exact (hash-groupBy), token/n-gram Jaccard, MinHash+LSH banding, SimHash,
and embedding-cosine near-dup — each expressed with built-in column
functions (JVM-side); no Python in the hot path. These feed the
canonicalization stage (MinHash-LSH blocking → connected components) of the
KG pipeline and are exposed as driver `queries()` with DuckDB oracles where
SQL-expressible.

Scale notes: shingling/minhashing are per-row projections (no shuffle);
LSH candidate generation shuffles once on the band bucket; verification
joins only candidate pairs, never the full cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from ..session import lazy_checkpoint

# above this many DISTINCT token-set bitmasks the all-pairs popcount
# compare is quadratic and its broadcast fact-sized — take the prefix
# filter instead (both paths are exact; this is purely a cost gate)
MASK_PAIRS_MAX = 100_000


def normalize_text(col) -> F.Column:
    """lower + trim + collapse whitespace (shared by fingerprint/dedup)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")


def exact_dedup_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Single-row summary: total docs vs distinct normalized texts."""
    return docs.select(normalize_text(text_col).alias("_t")).agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("_t").alias("n_unique"),
    )


def exact_dup_groups(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(fingerprint, n, ids): exact duplicate clusters via md5 hash-groupBy."""
    return (
        docs.select(F.col(id_col), F.md5(normalize_text(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n"), F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.col("n") > 1)
    )


def token_sets(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """(id, token) distinct token incidence — the unigram-set view."""
    return (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(normalize_text(text_col), " ")).alias("token"),
        )
        .filter(F.col("token") != "")
        .distinct()
    )


def jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
) -> DataFrame:
    """(a, b, jaccard) pairs with token-set Jaccard ≥ threshold — EXACT.

    Prefix-filtered inverted-index join (AllPairs/ppjoin-style): tokens are
    globally ordered by ascending document frequency; each doc indexes only
    its first ``|d| - ceil(t*|d|) + 1`` tokens in that order (its *prefix*).
    Standard prefix-filter lemma: any pair with Jaccard ≥ t must share at
    least one prefix token, so the prefix self-join yields a candidate
    superset and the exact-Jaccard verification over full token sets makes
    the result identical to the naive all-token join.

    Scale: the quadratic blow-up of the naive join comes from hub tokens
    (stopwords joining ~all docs × ~all docs). Stopwords have the highest
    DF → they sort last → they are (almost) never in a prefix, so the join
    key distribution is flattened by construction, not by AQE luck. A
    length-ratio filter (|b| ≥ t·|a|) prunes candidates further.
    """
    toks = token_sets(docs, id_col, text_col).localCheckpoint(eager=True)
    sizes = toks.groupBy("id").agg(F.count("*").alias("sz"))
    df_tok = toks.groupBy("token").agg(F.count("*").alias("df"))
    ranked = (
        toks.join(df_tok, "token")
        .join(sizes, "id")
        .withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("id").orderBy(F.col("df").asc(),
                                                 F.col("token").asc())),
        )
    )
    # prefix length = |d| - ceil(t*|d|) + 1
    prefix = ranked.filter(
        F.col("r") <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
    ).select("id", "token", "sz")
    pa = prefix.select(F.col("id").alias("a"), "token", F.col("sz").alias("sza"))
    pb = prefix.select(F.col("id").alias("b"), "token", F.col("sz").alias("szb"))
    cands = (
        pa.join(pb, "token")
        .filter(
            (F.col("a") < F.col("b"))
            & (F.least("sza", "szb") >= F.lit(threshold) * F.greatest("sza", "szb"))
        )
        .select("a", "b")
        .distinct()
    )
    # --- verification (exact) ---
    # Degenerate-vocabulary fast path: templated corpora (tiny global
    # vocabulary, e.g. TPC-H-style comment text) make EVERY token a hub, so
    # prefix filtering cannot prune and the candidate set is near-all-pairs.
    # With ≤ 63 distinct tokens each doc's token set is one BIGINT bitmask;
    # exact intersection = bit_count(ma & mb) — two narrow hash joins plus
    # integer ops instead of a token-explode join over |cands| × |doc|
    # rows (measured 129s → seconds on the 31-token bench corpus).
    n_vocab = df_tok.count()
    if n_vocab <= 63:
        vr = df_tok.select("token").withColumn(
            "bit", F.row_number().over(Window.orderBy("token")) - 1)
        masks = (
            toks.join(F.broadcast(vr), "token")
            .groupBy("id")
            .agg(F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).alias("mask"),
                 F.count("*").alias("sz"))
            .transform(lazy_checkpoint)
        )
        # compare DISTINCT masks all-pairs (a broadcast nested-loop of
        # integer popcounts), then expand the surviving mask pairs back to
        # doc pairs and add the identical-mask groups (jaccard exactly 1).
        # No token join touches the hub keys. Distinct masks are bounded by
        # min(#docs, 2^vocab) — at vocab 40-63 that is effectively #docs,
        # so the path is additionally gated on the ACTUAL distinct-mask
        # count: above MASK_PAIRS_MAX the broadcast would be fact-sized and
        # the compare quadratic, so fall through to the (equally exact)
        # prefix-filter join instead.
        dm = masks.select("mask", "sz").distinct()
        ndm = dm.count()
        if ndm > MASK_PAIRS_MAX:
            return _verify_candidates(cands, toks, sizes, threshold)
        # the all-pairs compare is a broadcast nested-loop whose parallelism
        # is the STREAMED side's partition count — and AQE coalesces the
        # tiny distinct output to one partition, serializing ~ndm²/2
        # popcounts on one core. An explicit repartition(n) (exempt from
        # AQE coalescing) spreads the quadratic work; n derives from the
        # measured distinct-mask count, not the local core count.
        parts = max(1, min(
            int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")),
            (ndm + 127) // 128))
        da = dm.select(F.col("mask").alias("ma"), F.col("sz").alias("sza")) \
            .repartition(parts)
        db = dm.select(F.col("mask").alias("mb"), F.col("sz").alias("szb"))
        mask_pairs = (
            da.join(F.broadcast(db), F.col("ma") < F.col("mb"))
            .withColumn("common", F.bit_count(F.col("ma").bitwiseAND(F.col("mb"))))
            .withColumn(
                "jaccard",
                F.round(F.col("common") / (F.col("sza") + F.col("szb") - F.col("common")), 6),
            )
            .filter(F.col("jaccard") >= threshold)
        )
        cross = (
            mask_pairs
            .join(masks.select(F.col("id").alias("ia"), F.col("mask").alias("ma")), "ma")
            .join(masks.select(F.col("id").alias("ib"), F.col("mask").alias("mb")), "mb")
            .select(F.least("ia", "ib").alias("a"),
                    F.greatest("ia", "ib").alias("b"), "jaccard")
        )
        same = (
            masks.select(F.col("id").alias("a"), "mask")
            .join(masks.select(F.col("id").alias("b"), "mask"), "mask")
            .filter(F.col("a") < F.col("b"))
            .select("a", "b", F.round(F.lit(1.0), 6).alias("jaccard"))
        )
        return cross.unionByName(same)
    return _verify_candidates(cands, toks, sizes, threshold)


def _verify_candidates(cands: DataFrame, toks: DataFrame, sizes: DataFrame,
                       threshold: float) -> DataFrame:
    """Exact-Jaccard verification of (a, b) candidates via the token join."""
    ta = toks.select(F.col("id").alias("a"), "token")
    tb = toks.select(F.col("id").alias("b"), "token")
    common = (
        cands.join(ta, "a")
        .join(tb, ["b", "token"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("common"))
    )
    return (
        common.join(sizes.withColumnRenamed("id", "a").withColumnRenamed("sz", "sza"), "a")
        .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("sz", "szb"), "b")
        .withColumn(
            "jaccard",
            F.round(F.col("common") / (F.col("sza") + F.col("szb") - F.col("common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def shingles(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
             k: int = 3) -> DataFrame:
    """(id, shingle) distinct k-word shingles, built with a sliding
    ``transform`` over the token array (no UDF).

    The token array is materialized as its own projection FIRST: referencing
    the tokenize expression directly inside the transform lambda makes
    codegen re-evaluate it (regexp + split + filter) once per sequence
    element — O(tokens²) regex work per document (measured ~6 s of the
    sf0.1 shingle pass; ~10x off). As a column attribute it is computed
    once per row."""
    toks_col = F.filter(F.split(normalize_text(text_col), " "),
                        lambda t: t != "")
    base = docs.select(F.col(id_col).alias("id"), toks_col.alias("_toks"))
    n = F.size("_toks")
    sh = F.transform(
        F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice("_toks", i + 1, k)),
    )
    return (
        base.select("id", F.explode(sh).alias("shingle"))
        .filter(F.length("shingle") > 0)
        .distinct()
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    k: int = 3,
) -> DataFrame:
    """(id, sig: array<bigint>) MinHash signature over k-shingles.

    h_i(s) = xxhash64(s, i); signature = min over shingles per seed — one
    groupBy, all JVM-side.

    Shuffle-width note (guide §2.3): the per-seed minima are ``num_hashes``
    plain MIN aggregates over the (id, shingle) rows — partial aggregation
    map-side, ONE row per id crosses the exchange. The previous shape
    exploded a seed column first (``num_hashes×`` the shuffle rows) and
    needed a second collect_list aggregation; values are bit-identical
    (same xxhash64(shingle, seed) minima, array ordered by seed).
    """
    return _signatures_from_shingles(shingles(docs, id_col, text_col, k),
                                     num_hashes)


def _signatures_from_shingles(sh: DataFrame, num_hashes: int) -> DataFrame:
    aggs = [F.min(F.xxhash64("shingle", F.lit(i))).alias(f"_m{i}")
            for i in range(num_hashes)]
    return (
        sh.groupBy("id").agg(*aggs)
        .select("id", F.array(*[F.col(f"_m{i}")
                                for i in range(num_hashes)]).alias("sig"))
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 8,
    rows_per_band: int = 4,
) -> DataFrame:
    """Band the signatures, bucket-join: pairs agreeing on ≥1 full band."""
    banded = signatures.select(
        "id",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
        "sig",
    ).withColumn(
        "bucket",
        F.xxhash64(F.col("band"),
                   F.concat_ws(",", F.transform(
                       F.slice("sig", F.col("band") * rows_per_band + 1, rows_per_band),
                       lambda x: x.cast("string")))),
    ).select("id", "band", "bucket")
    a = banded.select(F.col("id").alias("a"), "band", "bucket")
    b = banded.select(F.col("id").alias("b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def minhash_lsh_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
    k: int = 3,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: candidates → exact-Jaccard verify.

    Verification recomputes true shingle-Jaccard only on LSH candidates.
    One shared cached shingle set feeds BOTH the signature aggregation and
    the verification joins — previously the signature path re-ran the
    shingling (explode + distinct shuffle) on its own.
    """
    rows_per_band = num_hashes // bands
    sh = shingles(docs, id_col, text_col, k).cache()
    sigs = _signatures_from_shingles(sh, num_hashes)
    cands = lsh_candidate_pairs(sigs, bands, rows_per_band)
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    sha = sh.select(F.col("id").alias("a"), "shingle")
    shb = sh.select(F.col("id").alias("b"), "shingle")
    common = (
        cands.join(sha, "a").join(shb, ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("common"))
    )
    return (
        common.join(sizes.withColumnRenamed("id", "a").withColumnRenamed("sz", "sza"), "a")
        .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("sz", "szb"), "b")
        .withColumn(
            "jaccard",
            F.round(F.col("common") / (F.col("sza") + F.col("szb") - F.col("common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            bits: int = 64, hash_mode: str = "xxhash64") -> DataFrame:
    """(id, bits: array<int>) SimHash over tokens, via bit-vote aggregation.

    Per token: h = hash(token); per bit b: vote +1 if set else -1;
    fingerprint bit = sign of the vote sum. The fingerprint is kept as a
    bit array (JVM-friendly; packing to int64 needs no per-bit shifts in
    any downstream op — hamming and chunking both work on the array).

    ``hash_mode="xxhash64"`` is the fast production path (64-bit);
    ``hash_mode="md5"`` uses the low 48 bits of md5 so ANSI engines can
    replicate the fingerprint exactly (DuckDB:
    ``CAST('0x' || substr(md5(token), 1, 12) AS BIGINT)``) — pass
    ``bits=48`` with it.
    """
    toks = token_sets(docs, id_col, text_col)
    if hash_mode == "md5":
        toks = toks.withColumn(
            "h", F.conv(F.substring(F.md5("token"), 1, 12), 16, 10).cast("long"))
    else:
        toks = toks.withColumn("h", F.xxhash64("token"))
    # per bit b the ±1 vote sum is 2·Σ getbit(h,b) − n_tokens, so the
    # fingerprint bit is 1 iff 2·Σ getbit > n — expressed as `bits` plain
    # SUM aggregations (whole-stage codegen, no array allocation per
    # token; ~3x faster than the collect_list + zip_with fold and
    # bit-for-bit identical)
    aggs = [F.sum(F.getbit("h", F.lit(b))).alias(f"_s{b}") for b in range(bits)]
    votes = toks.groupBy("id").agg(F.count("*").alias("_n"), *aggs)
    return votes.select(
        "id",
        F.array(*[
            F.when(F.col(f"_s{b}") * 2 > F.col("_n"), 1).otherwise(0)
            for b in range(bits)
        ]).alias("bits"),
    )


def simhash_near_pairs(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", max_hamming: int = 8,
                       bits: int = 64, hash_mode: str = "xxhash64") -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance — EXACT recall.

    Blocking: the fingerprint is split into ``max_hamming + 1`` chunks; by
    pigeonhole, any pair with hamming ≤ max_hamming has at least one chunk
    with zero differing bits, so the chunk-equality bucket join generates a
    candidate superset and the hamming post-filter makes the result exact.
    (Fewer chunks than max_hamming+1 would silently drop pairs whose
    differing bits spread across every chunk.)

    Chunk width is ``bits // n_chunks`` — trailing bits beyond
    ``width * n_chunks`` belong to no chunk, which only *adds* candidates
    (diffs there can't break chunk equality), never drops true pairs.

    Shuffle-width note (guide §2.3): the fingerprint is packed into ONE
    BIGINT (bits ≤ 64 by construction), so the candidate join shuffles
    8-byte keys/payloads instead of 48-element int arrays, chunk equality
    is an integer compare (``shiftright(pack) & mask`` — bit-for-bit the
    same bucket as the old fixed-width string concat), and hamming is
    ``bit_count(pa XOR pb)`` — identical to the zip_with count over the
    bit arrays.
    """
    n_chunks = max_hamming + 1
    if n_chunks > bits:
        raise ValueError(f"max_hamming+1={n_chunks} chunks exceed {bits} bits")
    if bits > 64:
        raise ValueError(f"bits={bits} exceeds the 64-bit packed fingerprint")
    width = bits // n_chunks
    sh = simhash(docs, id_col, text_col, bits, hash_mode)
    packed = sh.select(
        "id",
        F.expr(
            f"aggregate(zip_with(bits, sequence(0, {bits - 1}), "
            "(b, i) -> shiftleft(CAST(b AS BIGINT), i)), "
            "CAST(0 AS BIGINT), (acc, x) -> acc + x)").alias("pack"),
    ).cache()
    mask = (1 << width) - 1
    chunks = packed.select(
        "id", "pack",
        F.explode(F.sequence(F.lit(0), F.lit(n_chunks - 1))).alias("c"),
    ).withColumn("chunk",
                 F.expr(f"shiftright(pack, c * {width})").bitwiseAND(F.lit(mask)))
    a = chunks.select(F.col("id").alias("a"), F.col("pack").alias("pa"), "c", "chunk")
    b = chunks.select(F.col("id").alias("b"), F.col("pack").alias("pb"), "c", "chunk")
    cand = (
        a.join(b, ["c", "chunk"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "pa", "pb")
        .distinct()
    )
    hamming = F.bit_count(F.col("pa").bitwiseXOR(F.col("pb")))
    return cand.withColumn("hamming", hamming).filter(
        F.col("hamming") <= max_hamming
    ).select("a", "b", "hamming")
