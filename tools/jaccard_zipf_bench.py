"""Jaccard prefix-filter path bench on a realistic Zipf-vocabulary corpus.

VERDICT r3 item 3: the driver testdata's documents are degenerate (31-token
global vocabulary), so `dedup_token_jaccard` always takes the bitmask fast
path and the prefix-filter path — the one real Zipf text exercises — had
no at-scale timing evidence. This tool synthesizes a corpus with a
power-law document-frequency distribution (Zipf s≈1.1 over a configurable
vocabulary), including near-duplicate pairs, and measures:

* the PREFIX path (`jaccard_pairs`, vocab > 63 → AllPairs prefix filter):
  wall seconds + candidate-pair count,
* the NAIVE inverted-index join's candidate volume, computed analytically
  as Σ_tokens C(df,2) (the join's pre-distinct row count — actually
  materializing it at 60k docs would be ~10^9 rows exactly because the
  prefix filter is what makes the problem tractable),
* correctness: on a subsampled corpus where the naive join IS feasible,
  the prefix path's result set equals the naive join's (real assertion).

Deterministic synthesis: token choice is md5-hash-driven per (doc, slot) —
no RNG state, same corpus every run.

Usage: python tools/jaccard_zipf_bench.py [n_docs] [vocab] [tokens_per_doc] [cores]
Record the outcome in BENCH/JACCARD.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from wikidata_to_cidoc_crm_spark.operators.dedup import jaccard_pairs, token_sets  # noqa: E402
from wikidata_to_cidoc_crm_spark.session import get_spark  # noqa: E402


def make_corpus(spark, n_docs: int, vocab: int, tokens_per_doc: int):
    """Zipf-ish corpus: slot i of doc d picks token ⌊vocab / (1 + h % k)⌋-ish
    via inverse-CDF over ranks — rank r gets probability ∝ 1/r (s=1).

    Inverse CDF for Zipf(s=1) over [1, V]: r ≈ exp(u * ln V) for uniform u —
    rank 1 is the most frequent. Token ids are "t<r>".
    """
    docs = spark.range(n_docs).select(F.concat(F.lit("d"), F.col("id")).alias("doc_id"))
    slots = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(tokens_per_doc - 1))).alias("slot"),
    )
    # uniform u in (0,1) from md5(doc,slot); rank = floor(exp(u*lnV)) in [1,V]
    u = (F.conv(F.substring(F.md5(F.concat("doc_id", F.lit("_"), "slot")), 1, 8),
                16, 10).cast("double") / F.lit(float(16 ** 8)))
    rank = F.least(
        F.lit(vocab),
        F.greatest(F.lit(1), F.floor(F.exp(u * F.log(F.lit(float(vocab))))).cast("int")))
    toks = slots.select("doc_id", F.concat(F.lit("t"), rank).alias("tok"))
    base = toks.groupBy("doc_id").agg(
        F.concat_ws(" ", F.collect_list("tok")).alias("text"))
    # near-duplicates: every 10th doc gets a twin with the SAME token set
    # minus one slot — Jaccard well above 0.8 for 40-token docs
    twins = (
        toks.filter(F.expr("substring(doc_id, 2) % 10 = 0"))
        .withColumn("rn", F.row_number().over(
            Window.partitionBy("doc_id").orderBy("tok")))
        .filter(F.col("rn") > 1)
        .groupBy("doc_id")
        .agg(F.concat_ws(" ", F.collect_list("tok")).alias("text"))
        .select(F.concat(F.col("doc_id"), F.lit("_dup")).alias("doc_id"), "text")
    )
    return base.unionByName(twins)


def naive_pairs(docs, threshold: float):
    """All-token inverted-index join + exact verify — the unpruned baseline.
    Feasible only on small corpora; used for the equality assertion."""
    toks = token_sets(docs, "doc_id", "text").localCheckpoint(eager=True)
    sizes = toks.groupBy("id").agg(F.count("*").alias("sz"))
    inter = (
        toks.select(F.col("id").alias("a"), "token")
        .join(toks.select(F.col("id").alias("b"), "token"), "token")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b").agg(F.count("*").alias("common"))
    )
    return (
        inter.join(sizes.select(F.col("id").alias("a"), F.col("sz").alias("sza")), "a")
        .join(sizes.select(F.col("id").alias("b"), F.col("sz").alias("szb")), "b")
        .withColumn("jaccard", F.round(
            F.col("common") / (F.col("sza") + F.col("szb") - F.col("common")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def naive_candidate_volume(docs) -> int:
    """Σ_tokens C(df, 2): the naive all-token join's pre-distinct row count."""
    toks = token_sets(docs, "doc_id", "text")
    row = toks.groupBy("token").agg(F.count("*").alias("df")) \
        .agg(F.sum(F.expr("df * (df - 1) / 2")).alias("v")).collect()[0]
    return int(row["v"])


def prefix_candidates(docs, threshold: float):
    """Candidate count of the prefix path (mirrors jaccard_pairs' cands)."""
    toks = token_sets(docs, "doc_id", "text").localCheckpoint(eager=True)
    sizes = toks.groupBy("id").agg(F.count("*").alias("sz"))
    df_tok = toks.groupBy("token").agg(F.count("*").alias("df"))
    ranked = (
        toks.join(df_tok, "token").join(sizes, "id")
        .withColumn("r", F.row_number().over(
            Window.partitionBy("id").orderBy(F.col("df").asc(), F.col("token").asc())))
    )
    prefix = ranked.filter(
        F.col("r") <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
    ).select("id", "token", "sz")
    pa = prefix.select(F.col("id").alias("a"), "token", F.col("sz").alias("sza"))
    pb = prefix.select(F.col("id").alias("b"), "token", F.col("sz").alias("szb"))
    return (
        pa.join(pb, "token")
        .filter((F.col("a") < F.col("b"))
                & (F.least("sza", "szb") >= F.lit(threshold) * F.greatest("sza", "szb")))
        .select("a", "b").distinct()
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    vocab = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    tokens_per_doc = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    cores = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    threshold = 0.8
    spark = get_spark("jaccard-zipf", cores=cores, shuffle_partitions=cores)

    docs = make_corpus(spark, n_docs, vocab, tokens_per_doc).localCheckpoint(eager=True)
    n = docs.count()
    distinct_toks = token_sets(docs, "doc_id", "text").select("token").distinct().count()
    print(f"corpus: {n} docs, {distinct_toks} distinct tokens "
          f"(vocab param {vocab}), {tokens_per_doc} tokens/doc")
    assert distinct_toks > 63, "corpus must exercise the prefix path, not the bitmask path"

    # timed: the production operator (prefix path end-to-end, exact)
    walls = []
    n_pairs = None
    for i in range(3):  # warm-up + best-of-2
        t0 = time.time()
        n_pairs = jaccard_pairs(docs, threshold=threshold).count()
        walls.append(round(time.time() - t0, 2))
    prefix_wall = min(walls[1:])

    # candidate counts: pruning evidence
    t0 = time.time()
    n_prefix_cands = prefix_candidates(docs, threshold).count()
    prefix_cand_wall = round(time.time() - t0, 2)
    n_naive_volume = naive_candidate_volume(docs)

    # equality vs the naive join on a corpus small enough to join naively
    sub_n = min(n_docs, 4000)
    sub = make_corpus(spark, sub_n, vocab, tokens_per_doc).localCheckpoint(eager=True)
    got = {(r["a"], r["b"], r["jaccard"])
           for r in jaccard_pairs(sub, threshold=threshold).collect()}
    want = {(r["a"], r["b"], r["jaccard"])
            for r in naive_pairs(sub, threshold).collect()}
    assert got == want, (
        f"prefix path differs from naive on {sub_n}-doc corpus: "
        f"{len(got)} vs {len(want)} pairs")

    print(json.dumps({
        "docs": n, "vocab": distinct_toks, "tokens_per_doc": tokens_per_doc,
        "threshold": threshold,
        "result_pairs": n_pairs,
        "prefix_wall_best": prefix_wall, "prefix_walls": walls,
        "prefix_candidates": n_prefix_cands,
        "naive_candidate_volume": n_naive_volume,
        "candidate_reduction": round(n_naive_volume / max(1, n_prefix_cands), 1),
        "prefix_cand_wall": prefix_cand_wall,
        "equality_subcorpus_docs": sub_n,
        "equality_pairs": len(got),
        "results_equal": True,
        "cores": cores,
    }))


if __name__ == "__main__":
    main()
