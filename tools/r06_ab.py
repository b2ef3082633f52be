"""Round-6 interleaved A/B harness — reproduces OPTIMIZATION_r06.md claims.

Usage: python tools/r06_ab.py [dedup|relations|align] [repeats]

Every comparison is interleaved (A, B, A, B …) in ONE session with noop
sinks (guide §1.4) because this VM's absolute timings swing 3–4× between
windows (see OPTIMIZATION_r06.md "Measurement regime"). The "old" variants
are frozen copies of the pre-round-6 implementations (git df26eb5) kept
here solely as A/B baselines.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_TMPFS_SCRATCH", "1")

from pyspark.sql import functions as F  # noqa: E402

from wikidata_to_cidoc_crm_spark.session import get_spark  # noqa: E402


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


# --- frozen pre-round-6 implementations (df26eb5) ---

def old_minhash_signatures(docs, num_hashes=32, k=3):
    from wikidata_to_cidoc_crm_spark.operators.dedup import shingles

    sh = shingles(docs, "doc_id", "text", k)
    seeded = sh.select(
        "id", F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("seed"),
        "shingle").withColumn("h", F.xxhash64("shingle", "seed"))
    return (seeded.groupBy("id", "seed").agg(F.min("h").alias("mh"))
            .groupBy("id")
            .agg(F.array_sort(F.collect_list(F.struct("seed", "mh"))).alias("_s"))
            .select("id", F.transform("_s", lambda s: s.mh).alias("sig")))


def old_minhash_lsh(docs, threshold=0.5):
    from wikidata_to_cidoc_crm_spark.operators.dedup import (
        lsh_candidate_pairs, shingles)

    sigs = old_minhash_signatures(docs)
    cands = lsh_candidate_pairs(sigs, 8, 4)
    sh = shingles(docs, "doc_id", "text", 3).cache()
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    sha = sh.select(F.col("id").alias("a"), "shingle")
    shb = sh.select(F.col("id").alias("b"), "shingle")
    common = (cands.join(sha, "a").join(shb, ["b", "shingle"])
              .groupBy("a", "b").agg(F.count("*").alias("common")))
    return (common
            .join(sizes.withColumnRenamed("id", "a").withColumnRenamed("sz", "sza"), "a")
            .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("sz", "szb"), "b")
            .withColumn("jaccard", F.round(
                F.col("common") / (F.col("sza") + F.col("szb") - F.col("common")), 6))
            .filter(F.col("jaccard") >= threshold).select("a", "b", "jaccard"))


def old_simhash_near(docs, max_hamming=8, bits=48, hash_mode="md5"):
    from wikidata_to_cidoc_crm_spark.operators.dedup import simhash

    n_chunks = max_hamming + 1
    width = bits // n_chunks
    sh = simhash(docs, "doc_id", "text", bits, hash_mode).cache()
    chunks = sh.select(
        "id", "bits",
        F.explode(F.sequence(F.lit(0), F.lit(n_chunks - 1))).alias("c"),
    ).withColumn(
        "chunk", F.concat_ws("", F.slice("bits", F.col("c") * width + 1, width)))
    a = chunks.select(F.col("id").alias("a"), F.col("bits").alias("ba"), "c", "chunk")
    b = chunks.select(F.col("id").alias("b"), F.col("bits").alias("bb"), "c", "chunk")
    cand = (a.join(b, ["c", "chunk"]).filter(F.col("a") < F.col("b"))
            .select("a", "b", "ba", "bb").distinct())
    hamming = F.size(F.filter(F.zip_with("ba", "bb", lambda x, y: x != y),
                              lambda d: d))
    return cand.withColumn("hamming", hamming).filter(
        F.col("hamming") <= max_hamming).select("a", "b", "hamming")


def ab_dedup(spark, sf_dir: str, repeats: int) -> None:
    from wikidata_to_cidoc_crm_spark.operators.dedup import (
        minhash_lsh_dedup, simhash_near_pairs)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
    docs.count()
    res: dict[str, list[float]] = {}
    for _ in range(repeats):
        for name, fn in [
            ("simhash_new", lambda: simhash_near_pairs(
                docs, max_hamming=8, bits=48, hash_mode="md5")),
            ("simhash_old", lambda: old_simhash_near(docs)),
            ("minhash_new", lambda: minhash_lsh_dedup(docs, threshold=0.5)),
            ("minhash_old", lambda: old_minhash_lsh(docs)),
        ]:
            spark.catalog.clearCache()
            docs.cache().count()
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            noop(fn())
            res.setdefault(name, []).append(round(time.time() - t0, 2))
    for k, v in res.items():
        print(k, v, "min", min(v))


def _pipeline_inputs(spark, sf_dir: str, scale: int = 20):
    from wikidata_to_cidoc_crm_spark.fixtures import (
        interleaved_corpus, make_world_scaled, world_to_spark)
    from wikidata_to_cidoc_crm_spark.linking import detect_mentions, linked_qids

    world = make_world_scaled(scale)
    dims = world_to_spark(spark, world)
    for n in ("wd_statements", "wd_labels", "wd_subclass_closure",
              "wd_property_closure", "wd_entities"):
        dims[n].cache()
    corpus = interleaved_corpus(
        spark, f"{sf_dir}/documents.parquet", dims["wd_entities"],
        mentions_per_doc=3).localCheckpoint(eager=True)
    mentions = detect_mentions(spark, corpus.select("doc_id", "spans"),
                               dims["wd_entities"]).localCheckpoint(eager=True)
    works_q = linked_qids(mentions, dims["wd_entities"], "work") \
        .localCheckpoint(eager=True)
    works_q.count()
    return dims, works_q


def ab_relations(spark, sf_dir: str, repeats: int) -> None:
    """SQL vs DataFrame relations stage: build seconds + exec seconds."""
    from wikidata_to_cidoc_crm_spark.plans.relations import relations_stage

    dims, works_q = _pipeline_inputs(spark, sf_dir)
    for _ in range(repeats):
        for mode in ("1", "0"):
            os.environ["SPARK_GRAFT_SQL_STAGES"] = mode
            t0 = time.time()
            df = relations_stage(
                spark, works_q, dims["wd_statements"], dims["wd_labels"],
                dims["wd_subclass_closure"], dims["wd_property_closure"],
                broadcast_labels=True)
            b = time.time() - t0
            t0 = time.time()
            noop(df)
            print(f"relations {'SQL' if mode == '1' else 'DF '}: "
                  f"build {b:.2f}s exec {time.time() - t0:.2f}s")


def ab_align(spark, sf_dir: str, repeats: int) -> None:
    """Fan-out vs per-triple-union align emission: build + exec seconds."""
    from wikidata_to_cidoc_crm_spark.fixtures import world_to_spark, make_world_scaled
    from wikidata_to_cidoc_crm_spark.linking import linked_qids
    from wikidata_to_cidoc_crm_spark.plans.align import align_stage
    from wikidata_to_cidoc_crm_spark.plans.authors import authors_stage
    from wikidata_to_cidoc_crm_spark.plans.canonicalize import canonicalize_stage
    from wikidata_to_cidoc_crm_spark.plans.merge import merge_stage
    from wikidata_to_cidoc_crm_spark.plans.relations import relations_stage
    from wikidata_to_cidoc_crm_spark.plans.works import works_stage

    dims, works_q = _pipeline_inputs(spark, sf_dir)
    from wikidata_to_cidoc_crm_spark.fixtures import interleaved_corpus
    from wikidata_to_cidoc_crm_spark.linking import detect_mentions

    corpus = interleaved_corpus(
        spark, f"{sf_dir}/documents.parquet", dims["wd_entities"],
        mentions_per_doc=3).localCheckpoint(eager=True)
    mentions = detect_mentions(spark, corpus.select("doc_id", "spans"),
                               dims["wd_entities"]).localCheckpoint(eager=True)
    persons_q = linked_qids(mentions, dims["wd_entities"], "person") \
        .localCheckpoint(eager=True)
    a = authors_stage(spark, persons_q, dims["wd_statements"], dims["wd_labels"],
                      dedupe=True, broadcast_labels=True)
    w = works_stage(spark, works_q, dims["wd_statements"], dims["wd_labels"],
                    dedupe=True, broadcast_labels=True)
    r = relations_stage(spark, works_q, dims["wd_statements"], dims["wd_labels"],
                        dims["wd_subclass_closure"], dims["wd_property_closure"],
                        dedupe=True, broadcast_labels=True)
    merged = merge_stage(spark, [a, w, r])
    canonical = canonicalize_stage(spark, merged).localCheckpoint(eager=True)
    print(f"canonical rows: {canonical.count()}")
    for _ in range(repeats):
        for mode in ("1", "0"):
            os.environ["SPARK_GRAFT_ALIGN_FANOUT"] = mode
            t0 = time.time()
            df = align_stage(spark, canonical, dims["wd_external_ids"])
            b = time.time() - t0
            t0 = time.time()
            noop(df)
            print(f"align {'FAN' if mode == '1' else 'UNI'}: "
                  f"build {b:.2f}s exec {time.time() - t0:.2f}s")


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "dedup"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r06-ab", cores=32, shuffle_partitions=32)
    if which == "dedup":
        ab_dedup(spark, sf_dir, repeats)
    elif which == "relations":
        ab_relations(spark, sf_dir, repeats)
    elif which == "align":
        ab_align(spark, sf_dir, repeats)
    else:
        raise SystemExit(f"unknown probe: {which}")


if __name__ == "__main__":
    main()
