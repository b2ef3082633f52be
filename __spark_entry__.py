"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction pipeline on the sf0.001
corpus; ``queries()`` demonstrates each operator class from SURVEY.md §2
plus the training-data-pipeline operators (dedup / similarity / text
analysis); ``oracle_sql()`` holds the DuckDB-checkable ANSI SQL twins.

Cross-engine determinism conventions used throughout:
* money/value sums → integer cents (``sum(cast(round(x*100) as bigint))``),
* timestamps → formatted strings,
* every computed column aliased identically on both sides,
* regex restricted to the Java/RE2 common subset.
Entries with no SQL twin (hash-based LSH/SimHash, iterative connected
components, KG mapping stages over fixture dimensions) are rows-only by
design — the KG stages have their own exact golden-parity pytest gate
(tests/test_*_golden.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SF001 = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------- flagship
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: interleaved corpus → link → map → merge (KG triples)."""
    from wikidata_to_cidoc_crm_spark.pipeline import run_pipeline

    return run_pipeline(spark, SF001)


# ---------------------------------------------------------------- queries
def _p1_filter_project(spark, sf):
    return (
        _t(spark, sf, "lineitem")
        .filter(F.col("l_quantity") >= 45)
        .select("l_orderkey", "l_partkey", "l_quantity")
    )


def _p2_regex_extract(spark, sf):
    return (
        _t(spark, sf, "documents")
        .select(F.regexp_extract("source", "src([0-9]+)", 1).cast("int").alias("src_num"))
        .groupBy("src_num")
        .agg(F.count("*").alias("n_docs"))
    )


def _p4_year_extract(spark, sf):
    return (
        _t(spark, sf, "lineitem")
        .select(F.year("l_shipdate").cast("int").alias("ship_year"), "l_quantity")
        .groupBy("ship_year")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.round(F.col("l_quantity") * 100).cast("bigint")).alias("qty_cents"),
        )
    )


def _p6_coalesce_chain(spark, sf):
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation").filter(F.col("n_nationkey") < 10)
    r = _t(spark, sf, "region").filter(F.col("r_regionkey") < 2)
    out = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey, "left")
        .select(
            "c_custkey",
            F.coalesce("r_name", "n_name", "c_name").alias("display_name"),
        )
    )
    return out


def _u3_undirected_pairs(spark, sf):
    li = _t(spark, sf, "lineitem")
    return (
        li.select(
            F.least("l_partkey", "l_suppkey").alias("pair_lo"),
            F.greatest("l_partkey", "l_suppkey").alias("pair_hi"),
        )
        .groupBy("pair_lo", "pair_hi")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
    )


def _j1_semi_join(spark, sf):
    o = _t(spark, sf, "orders")
    rich = _t(spark, sf, "customer").filter(F.col("c_acctbal") > 9000).select("c_custkey")
    return (
        o.join(F.broadcast(rich), o.o_custkey == rich.c_custkey, "left_semi")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_orders"))
    )


def _j2_left_outer_hist(spark, sf):
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem").groupBy("l_orderkey").agg(F.count("*").alias("cnt"))
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left")
        .select(F.coalesce("cnt", F.lit(0)).cast("bigint").alias("n_items"))
        .groupBy("n_items")
        .agg(F.count("*").alias("n_orders"))
    )


def _j8_pair_join(spark, sf):
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p1"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p2"))
    return (
        a.join(b, "ok")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
    )


def _j10_multi_hop(spark, sf):
    r = _t(spark, sf, "region")
    n = _t(spark, sf, "nation")
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("total_cents"),
        )
    )


def _j16_first_last_order(spark, sf):
    o = _t(spark, sf, "orders")
    asc = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    desc = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
    return (
        o.withColumn("rn_a", F.row_number().over(asc))
        .withColumn("rn_d", F.row_number().over(desc))
        .groupBy("o_custkey")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("o_orderkey"))).alias("first_order"),
            F.max(F.when(F.col("rn_d") == 1, F.col("o_orderkey"))).alias("last_order"),
        )
    )


def _a2_min_agg(spark, sf):
    return (
        _t(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("first_date"))
    )


def _a3_having_count_distinct(spark, sf):
    return (
        _t(spark, sf, "lineitem")
        .groupBy("l_partkey")
        .agg(F.countDistinct("l_orderkey").alias("n_orders"))
        .filter(F.col("n_orders") > 3)
    )


def _a5_first_per_group(spark, sf):
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


def _a6_window_dedup(spark, sf):
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("value").desc(), F.col("event_id").asc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id")
    )


def _a7_exists_flags(spark, sf):
    e = _t(spark, sf, "events")
    return e.agg(
        F.max(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("has_error"),
        F.max(F.when(F.col("event_type") == "signup", 1).otherwise(0)).alias("has_signup"),
        F.countDistinct("event_type").alias("n_types"),
    )


def _w1_order_limit(spark, sf):
    return (
        _t(spark, sf, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(5)
        .select("o_orderkey",
                F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_cents"))
    )


def _w5_running_sum(spark, sf):
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        _t(spark, sf, "orders")
        .withColumn("cents", F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .select("o_custkey", "o_orderkey",
                F.sum("cents").over(w).alias("running_cents"))
    )


def _a9_pivot_status(spark, sf):
    return (
        _t(spark, sf, "orders")
        .groupBy("o_custkey")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .select(
            "o_custkey",
            F.coalesce("O", F.lit(0)).alias("n_o"),
            F.coalesce("F", F.lit(0)).alias("n_f"),
            F.coalesce("P", F.lit(0)).alias("n_p"),
        )
    )


def _a1_group_to_set(spark, sf):
    e = _t(spark, sf, "events")
    return e.groupBy("user_id").agg(
        F.concat_ws("|", F.sort_array(F.collect_set("event_type"))).alias("types_str")
    )


def _u2_union_distinct(spark, sf):
    e = _t(spark, sf, "events")
    a = e.filter(F.col("event_type") == "error").select("user_id")
    b = e.filter(F.col("event_type") == "signup").select("user_id")
    return a.union(b).distinct()


def _u5_anti_join(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(F.col("o_totalprice") > 300000).select("o_custkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


def _closure_transitive(spark, sf):
    from wikidata_to_cidoc_crm_spark.operators.closure import transitive_closure

    edges = (
        _t(spark, sf, "part")
        .filter(F.col("p_partkey") >= 2)
        .select(
            F.col("p_partkey").cast("bigint").alias("src"),
            F.floor(F.col("p_partkey") / 2).cast("bigint").alias("dst"),
        )
    )
    return transitive_closure(edges, include_self=False).select(
        F.col("src").alias("src"), F.col("dst").alias("dst"))


def _dedup_exact_stats(spark, sf):
    from wikidata_to_cidoc_crm_spark.operators.dedup import exact_dedup_stats

    return exact_dedup_stats(_t(spark, sf, "documents"))


def _dedup_fingerprint(spark, sf):
    from wikidata_to_cidoc_crm_spark.operators.textstats import fingerprint

    return fingerprint(_t(spark, sf, "documents")).select("doc_id", "fingerprint")


def _dedup_first_seen(spark, sf):
    """Batch twin of the streaming first-seen dedup operator
    (streaming/dedup_stream.py, applyInPandasWithState): one row per
    normalized-text fingerprint, first doc_id wins."""
    from wikidata_to_cidoc_crm_spark.streaming.dedup_stream import batch_first_seen

    return batch_first_seen(_t(spark, sf, "documents")).select(
        "fingerprint", "doc_id")


def _dedup_token_jaccard(spark, sf):
    from wikidata_to_cidoc_crm_spark.operators.dedup import jaccard_pairs

    pairs = jaccard_pairs(_t(spark, sf, "documents"), threshold=0.5)
    return (
        pairs.select(F.floor(F.col("jaccard") * 10).cast("int").alias("jbucket"))
        .groupBy("jbucket")
        .agg(F.count("*").alias("n_pairs"))
    )


def _dedup_minhash_lsh(spark, sf):
    from wikidata_to_cidoc_crm_spark.operators.dedup import minhash_lsh_dedup

    return minhash_lsh_dedup(_t(spark, sf, "documents"), threshold=0.5)


def _dedup_simhash(spark, sf):
    """md5-mode SimHash (48-bit) so the DuckDB oracle recomputes the exact
    fingerprints; pigeonhole blocking (max_hamming+1 chunks) makes the
    blocked result identical to the oracle's exhaustive hamming join."""
    from wikidata_to_cidoc_crm_spark.operators.dedup import simhash_near_pairs

    return simhash_near_pairs(_t(spark, sf, "documents"), max_hamming=8,
                              bits=48, hash_mode="md5")


def _cc_components(spark, sf):
    from wikidata_to_cidoc_crm_spark.operators.components import connected_components

    edges = (
        _t(spark, sf, "lineitem")
        .select(
            F.concat(F.lit("o"), (F.col("l_orderkey") % 500).cast("string")).alias("src"),
            F.concat(F.lit("p"), (F.col("l_partkey") % 500).cast("string")).alias("dst"),
        )
        .distinct()
    )
    return (
        connected_components(edges)
        .groupBy("component")
        .agg(F.count("*").alias("n_nodes"))
    )


def _dedup_embedding_cosine(spark, sf):
    """Embedding-cosine near-dup pairs (exact all-pairs at contract scale;
    the production path blocks through hyperplane_buckets first)."""
    from wikidata_to_cidoc_crm_spark.operators.similarity import cosine_near_pairs

    emb = _t(spark, sf, "embeddings").filter(F.col("vec_id") < 200)
    return cosine_near_pairs(emb, threshold=0.25)


def _ann_topk_cosine(spark, sf):
    from wikidata_to_cidoc_crm_spark.operators.similarity import brute_force_topk

    emb = _t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return brute_force_topk(emb, queries, k=3)


def _ann_lsh_topk(spark, sf):
    """Multi-probe LSH top-k with md5-derived hyperplanes so the DuckDB
    oracle replicates the *approximate* operator itself bit-for-bit
    (bucketing + probing + bucket-restricted exact rerank)."""
    from wikidata_to_cidoc_crm_spark.operators.similarity import lsh_topk

    emb = _t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return lsh_topk(emb, queries, dim=64, k=3, hash_mode="md5")


def _text_token_count(spark, sf):
    from wikidata_to_cidoc_crm_spark.operators.textstats import token_count

    return token_count(_t(spark, sf, "documents")).select("doc_id", "n_tokens")


def _text_langid(spark, sf):
    from wikidata_to_cidoc_crm_spark.operators.textstats import langid

    return (
        langid(_t(spark, sf, "documents"))
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").alias("n_docs"))
    )


def _text_quality(spark, sf):
    from wikidata_to_cidoc_crm_spark.operators.textstats import quality_score

    return (
        quality_score(_t(spark, sf, "documents"))
        .select(F.floor(F.col("quality") * 10).cast("int").alias("qbucket"))
        .groupBy("qbucket")
        .agg(F.count("*").alias("n_docs"))
    )


def _shacl_violations(spark, sf):
    """SHACL-core validation engine over a synthetic triple table derived
    from ``documents`` with deterministically planted violations — the
    DuckDB twin recomputes the per-constraint counts independently, so the
    whole validator (focus sets, cardinality, languageIn, pattern,
    prefix checks) is oracle-gated."""
    from wikidata_to_cidoc_crm_spark.shacl import Prop, Shape, validate_summary

    d = _t(spark, sf, "documents").select(F.col("doc_id").cast("int").alias("n"))
    subj = F.concat(F.lit("doc/"), F.col("n").cast("string"))

    def part(cond, pred, obj, is_iri, lang):
        src = d.filter(cond) if cond is not None else d
        return src.select(
            subj.alias("subj"), F.lit(pred).alias("pred"), obj.alias("obj"),
            F.lit(is_iri).alias("obj_is_iri"),
            F.lit(lang).cast("string").alias("lang"),
            F.lit(None).cast("string").alias("dtype"))

    g = part(None, "urn:type", F.lit("c/Doc"), True, None) \
        .unionByName(part(F.col("n") % 7 != 0, "urn:label",
                          F.concat(F.lit("Doc "), F.col("n").cast("string")),
                          False, "en")) \
        .unionByName(part(F.col("n") % 11 == 0, "urn:label",
                          F.concat(F.lit("Dok "), F.col("n").cast("string")),
                          False, "de")) \
        .unionByName(part(None, "urn:ident",
                          F.when(F.col("n") % 13 == 0,
                                 F.concat(F.lit("X"), F.col("n").cast("string")))
                          .otherwise(F.concat(F.lit("Q"), F.col("n").cast("string"))),
                          False, None)) \
        .unionByName(part(None, "urn:sameAs",
                          F.when(F.col("n") % 17 == 0,
                                 F.concat(F.lit("https://example.org/"),
                                          F.col("n").cast("string")))
                          .otherwise(F.concat(
                              F.lit("http://www.wikidata.org/entity/Q"),
                              F.col("n").cast("string"))),
                          True, None))
    # replace urn:type with the rdf:type IRI the engine targets on
    from wikidata_to_cidoc_crm_spark.model import RDF_TYPE
    g = g.withColumn("pred", F.when(F.col("pred") == "urn:type",
                                    F.lit(RDF_TYPE)).otherwise(F.col("pred")))
    shapes = [Shape("DocShape", "class", "c/Doc", (
        Prop("urn:label", min_count=1, max_count=1, language_in=("en",)),
        Prop("urn:ident", pattern="^Q[0-9]+$"),
        Prop("urn:sameAs", starts_with="http://www.wikidata.org/entity/Q"),
    ))]
    return validate_summary(g, shapes)


def _kg_validate(spark, sf):
    """SHACL-derived validation of the three mapping-stage outputs against
    the transcribed reference shapes (rows-only: per-module violation
    counts; the two nonzero rows are reference-inherent, see
    tests/test_shacl.py docstrings)."""
    from wikidata_to_cidoc_crm_spark.fixtures import make_world, world_to_spark
    from wikidata_to_cidoc_crm_spark.plans.authors import authors_stage
    from wikidata_to_cidoc_crm_spark.plans.relations import relations_stage
    from wikidata_to_cidoc_crm_spark.plans.works import works_stage
    from wikidata_to_cidoc_crm_spark.shacl import validate_summary
    from wikidata_to_cidoc_crm_spark.shapes_spec import (
        AUTHOR_SHAPES, RELATIONS_SHAPES, WORK_SHAPES)

    world = make_world()
    dims = world_to_spark(spark, world)
    pq = spark.createDataFrame([(p["qid"],) for p in world.persons], "qid string")
    wq = spark.createDataFrame([(w["qid"],) for w in world.works], "qid string")
    outs = [
        ("authors", authors_stage(spark, pq, dims["wd_statements"],
                                  dims["wd_labels"]), AUTHOR_SHAPES),
        ("works", works_stage(spark, wq, dims["wd_statements"],
                              dims["wd_labels"]), WORK_SHAPES),
        ("relations", relations_stage(
            spark, wq, dims["wd_statements"], dims["wd_labels"],
            dims["wd_subclass_closure"], dims["wd_property_closure"]),
         RELATIONS_SHAPES),
    ]
    res = None
    for module, df, shapes in outs:
        s = validate_summary(df, shapes).withColumn("module", F.lit(module))
        res = s if res is None else res.unionByName(s)
    return res.select("module", "shape", "constraint", "n_violations")


def _stream_window_counts(spark, sf):
    e = _t(spark, sf, "events")
    return (
        e.groupBy(F.date_trunc("hour", "ts").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_cents"),
        )
        .select(
            F.date_format("w", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type", "n", "value_cents",
        )
    )


# --- KG stages over the fixture world (rows-only; exact parity is gated by
#     tests/test_*_golden.py against the pure-Python oracle) ---
def _kg_authors(spark, sf):
    from wikidata_to_cidoc_crm_spark.fixtures import make_world, world_to_spark
    from wikidata_to_cidoc_crm_spark.plans.authors import authors_stage

    world = make_world()
    dims = world_to_spark(spark, world)
    qids = spark.createDataFrame([(p["qid"],) for p in world.persons], "qid string")
    return authors_stage(spark, qids, dims["wd_statements"], dims["wd_labels"])


def _kg_works(spark, sf):
    from wikidata_to_cidoc_crm_spark.fixtures import make_world, world_to_spark
    from wikidata_to_cidoc_crm_spark.plans.works import works_stage

    world = make_world()
    dims = world_to_spark(spark, world)
    qids = spark.createDataFrame([(w["qid"],) for w in world.works], "qid string")
    return works_stage(spark, qids, dims["wd_statements"], dims["wd_labels"])


def _kg_relations(spark, sf):
    from wikidata_to_cidoc_crm_spark.fixtures import make_world, world_to_spark
    from wikidata_to_cidoc_crm_spark.plans.relations import relations_stage

    world = make_world()
    dims = world_to_spark(spark, world)
    qids = spark.createDataFrame([(w["qid"],) for w in world.works], "qid string")
    return relations_stage(
        spark, qids, dims["wd_statements"], dims["wd_labels"],
        dims["wd_subclass_closure"], dims["wd_property_closure"])


def _kg_pipeline(spark, sf):
    from wikidata_to_cidoc_crm_spark.pipeline import run_pipeline

    return run_pipeline(spark, sf)


def _kg_mentions(spark, sf):
    from wikidata_to_cidoc_crm_spark.fixtures import interleaved_corpus, make_world, world_to_spark
    from wikidata_to_cidoc_crm_spark.linking import detect_mentions

    world = make_world()
    dims = world_to_spark(spark, world)
    corpus = interleaved_corpus(spark, f"{sf}/documents.parquet", dims["wd_entities"])
    return detect_mentions(spark, corpus.select("doc_id", "spans"), dims["wd_entities"])


def _kg_media_features(spark, sf):
    from wikidata_to_cidoc_crm_spark.fixtures import interleaved_corpus, make_world, world_to_spark
    from wikidata_to_cidoc_crm_spark.operators.multimodal import (
        extract_media_features, synthesize_media_table)

    world = make_world()
    dims = world_to_spark(spark, world)
    corpus = interleaved_corpus(spark, f"{sf}/documents.parquet", dims["wd_entities"])
    media = synthesize_media_table(corpus.select("doc_id", "spans"))
    feats = extract_media_features(media)
    # contract projection: the driver harness hashes values with pandas,
    # which cannot sort/hash array cells — project the feature vector to a
    # scalar L2 norm here; the library API keeps the array column.
    return feats.select(
        "media_ref", "kind", "n_bytes", "ok",
        F.round(
            F.sqrt(F.aggregate(
                "feature", F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"))),
            4,
        ).alias("feature_norm"),
    )


def _frame_sample(spark, sf):
    """Video frame-sampling plumbing (operators/multimodal.frame_sample_plan):
    one row per 250 ms sample timestamp for every video-kind media payload —
    pure column math (explode over sequence), no UDF."""
    from wikidata_to_cidoc_crm_spark.fixtures import interleaved_corpus, make_world, world_to_spark
    from wikidata_to_cidoc_crm_spark.operators.multimodal import (
        frame_sample_plan, synthesize_media_table)

    world = make_world()
    dims = world_to_spark(spark, world)
    corpus = interleaved_corpus(spark, f"{sf}/documents.parquet", dims["wd_entities"])
    media = synthesize_media_table(corpus.select("doc_id", "spans"))
    return frame_sample_plan(media, every_ms=250).select(
        "media_ref", F.col("frame_ms").cast("int").alias("frame_ms"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # scans / projections / filters / scalar functions (SURVEY §2.1/2.2/2.7)
        "p1_filter_project": _p1_filter_project,
        "p2_regex_extract": _p2_regex_extract,
        "p4_year_extract": _p4_year_extract,
        "p6_coalesce_chain": _p6_coalesce_chain,
        # joins (§2.3)
        "j1_semi_join": _j1_semi_join,
        "j2_left_outer_hist": _j2_left_outer_hist,
        "j8_pair_join": _j8_pair_join,
        "j10_multi_hop": _j10_multi_hop,
        "j16_first_last_order": _j16_first_last_order,
        # windows / sorts / limits (§2.5)
        "w1_order_limit": _w1_order_limit,
        "w5_running_sum": _w5_running_sum,
        # aggregations (§2.4)
        "a9_pivot_status": _a9_pivot_status,
        "a1_group_to_set": _a1_group_to_set,
        "a2_min_agg": _a2_min_agg,
        "a3_having_count_distinct": _a3_having_count_distinct,
        "a5_first_per_group": _a5_first_per_group,
        "a6_window_dedup": _a6_window_dedup,
        "a7_exists_flags": _a7_exists_flags,
        # set ops (§2.6)
        "u2_union_distinct": _u2_union_distinct,
        "u3_undirected_pairs": _u3_undirected_pairs,
        "u5_anti_join": _u5_anti_join,
        # custom graph operators (§4.3)
        "closure_transitive": _closure_transitive,
        "cc_components": _cc_components,
        # training-data pipeline: dedup
        "dedup_exact_stats": _dedup_exact_stats,
        "dedup_fingerprint": _dedup_fingerprint,
        "dedup_first_seen": _dedup_first_seen,
        "dedup_token_jaccard": _dedup_token_jaccard,
        "dedup_minhash_lsh": _dedup_minhash_lsh,
        "dedup_simhash": _dedup_simhash,
        # similarity search
        "dedup_embedding_cosine": _dedup_embedding_cosine,
        "ann_topk_cosine": _ann_topk_cosine,
        "ann_lsh_topk": _ann_lsh_topk,
        # text analysis
        "text_token_count": _text_token_count,
        "text_langid": _text_langid,
        "text_quality": _text_quality,
        # streaming semantics (batch-equivalent plan)
        "stream_window_counts": _stream_window_counts,
        # SHACL-derived validation (reference's correctness mechanism)
        "shacl_violations": _shacl_violations,
        "kg_validate": _kg_validate,
        # KG stages (rows-only; golden-parity gated in pytest)
        "kg_authors": _kg_authors,
        "kg_works": _kg_works,
        "kg_relations": _kg_relations,
        "kg_mentions": _kg_mentions,
        "kg_media_features": _kg_media_features,
        "frame_sample": _frame_sample,
        "kg_pipeline": _kg_pipeline,
    }


# ---------------------------------------------------------------- oracles
_TOK = "[^a-z0-9]+"
_NORM = r"lower(trim(regexp_replace(text, '\s+', ' ', 'g')))"
_TOKS = f"list_filter(string_split_regex(lower(text), '{_TOK}'), x -> x != '')"



def _kg_mentions_oracle() -> str:
    """SQL twin of linking.detect_mentions over the interleaved corpus
    (generator lives in map_sql.mentions_sql; see its docstring)."""
    from wikidata_to_cidoc_crm_spark.fixtures import make_world
    from wikidata_to_cidoc_crm_spark.map_sql import mentions_sql

    return mentions_sql(make_world())


def _kg_validate_oracle() -> str:
    """SQL twin of _kg_validate (VERDICT r3 item 7).

    Input triples come from the pure-Python reference-semantics oracles
    (oracle.py / oracle_relations.py — NO Spark involved; golden pytest
    proves the Spark mapping stages emit the identical triple sets), and
    the SHACL validation itself is re-expressed as generated ANSI SQL from
    the same transcribed Shape tables (shacl_sql.validation_summary_sql).
    DuckDB therefore independently recomputes every per-module violation
    count the Spark validator reports.
    """
    from wikidata_to_cidoc_crm_spark.fixtures import make_world
    from wikidata_to_cidoc_crm_spark.oracle import authors_triples, works_triples
    from wikidata_to_cidoc_crm_spark.oracle_relations import relations_triples
    from wikidata_to_cidoc_crm_spark.shacl_sql import validation_summary_sql
    from wikidata_to_cidoc_crm_spark.shapes_spec import (
        AUTHOR_SHAPES, RELATIONS_SHAPES, WORK_SHAPES)

    w = make_world()
    return validation_summary_sql([
        ("authors", authors_triples(w), AUTHOR_SHAPES),
        ("works", works_triples(w), WORK_SHAPES),
        ("relations", relations_triples(w), RELATIONS_SHAPES),
    ])


def _kg_authors_oracle() -> str:
    """SQL twin of _kg_authors: the fixture world's person QIDs, statements
    and labels are embedded as VALUES and the full authors.py:254-363
    emission is re-derived in SQL (map_sql.authors_sql) — an independent
    third implementation alongside the Spark plan and the pure-Python
    oracle."""
    from wikidata_to_cidoc_crm_spark.fixtures import make_world
    from wikidata_to_cidoc_crm_spark.map_sql import authors_sql

    return authors_sql(make_world())


def _kg_works_oracle() -> str:
    """SQL twin of _kg_works (works.py:333-554 emission re-derived in SQL
    over the embedded fixture inputs — map_sql.works_sql)."""
    from wikidata_to_cidoc_crm_spark.fixtures import make_world
    from wikidata_to_cidoc_crm_spark.map_sql import works_sql

    return works_sql(make_world())


def _kg_relations_oracle() -> str:
    """SQL twin of _kg_relations (relations.py:299-877's nine processors in
    SQL over the embedded fixture inputs — map_sql.relations_sql, including
    the first-partner-wins actualization links and citation-direction
    winners)."""
    from wikidata_to_cidoc_crm_spark.fixtures import make_world
    from wikidata_to_cidoc_crm_spark.map_sql import relations_sql

    return relations_sql(make_world())


def _kg_pipeline_oracle() -> str:
    """SQL twin of the FULL pipeline (corpus → link → map ×3 → merge →
    canonicalize → align) at the contract's sf0.01 world scale —
    pipeline_sql.pipeline_sql composes the per-stage twins into one query
    over the `documents` view plus embedded fixture dimensions."""
    from wikidata_to_cidoc_crm_spark.fixtures import make_world_scaled
    from wikidata_to_cidoc_crm_spark.pipeline import world_scale_for
    from wikidata_to_cidoc_crm_spark.pipeline_sql import pipeline_sql

    return pipeline_sql(make_world_scaled(world_scale_for("sf0.01")))


def oracle_sql() -> dict[str, str]:
    # multi-probe masks for ann_lsh_topk (planes=6, probe_hamming=2):
    # identical enumeration to operators/similarity.lsh_topk
    _PLANES = 6
    _masks = [0] + [1 << i for i in range(_PLANES)] + [
        (1 << i) | (1 << j) for i in range(_PLANES) for j in range(i + 1, _PLANES)]
    _mask_values = ", ".join(f"({m})" for m in _masks)
    # word tokens exactly as operators/dedup.normalize_text + split(" ")
    _WTOKS = ("list_filter(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')"
              ", x -> x != '')")
    return {
        "p1_filter_project": """
            SELECT l_orderkey, l_partkey, l_quantity
            FROM lineitem WHERE l_quantity >= 45
        """,
        "p2_regex_extract": """
            SELECT CAST(regexp_extract(source, 'src([0-9]+)', 1) AS INTEGER) AS src_num,
                   count(*) AS n_docs
            FROM documents GROUP BY 1
        """,
        "p4_year_extract": """
            SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year,
                   count(*) AS n_items,
                   CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents
            FROM lineitem GROUP BY 1
        """,
        "p6_coalesce_chain": """
            SELECT c_custkey,
                   coalesce(r_name, n_name, c_name) AS display_name
            FROM customer
            LEFT JOIN (SELECT * FROM nation WHERE n_nationkey < 10) n
              ON c_nationkey = n_nationkey
            LEFT JOIN (SELECT * FROM region WHERE r_regionkey < 2) r
              ON n_regionkey = r_regionkey
        """,
        "j1_semi_join": """
            SELECT o_orderstatus, count(*) AS n_orders
            FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
            GROUP BY 1
        """,
        "j2_left_outer_hist": """
            SELECT coalesce(cnt, 0) AS n_items, count(*) AS n_orders
            FROM orders
            LEFT JOIN (SELECT l_orderkey, count(*) AS cnt FROM lineitem GROUP BY 1) li
              ON o_orderkey = li.l_orderkey
            GROUP BY 1
        """,
        "j8_pair_join": """
            WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
            SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS n_orders
            FROM op a JOIN op b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING count(*) >= 2
        """,
        "j10_multi_hop": """
            SELECT r_name, count(*) AS n_orders,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY 1
        """,
        "j16_first_last_order": """
            WITH ranked AS (
              SELECT o_custkey, o_orderkey,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn_a,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn_d
              FROM orders)
            SELECT o_custkey,
                   max(CASE WHEN rn_a = 1 THEN o_orderkey END) AS first_order,
                   max(CASE WHEN rn_d = 1 THEN o_orderkey END) AS last_order
            FROM ranked GROUP BY 1
        """,
        "w1_order_limit": """
            SELECT o_orderkey,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
            FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 5
        """,
        "w5_running_sum": """
            SELECT o_custkey, o_orderkey,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
                     PARTITION BY o_custkey
                     ORDER BY o_orderdate ASC, o_orderkey ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS running_cents
            FROM orders
        """,
        "a9_pivot_status": """
            SELECT o_custkey,
                   count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
                   count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
                   count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
            FROM orders GROUP BY 1
        """,
        "a1_group_to_set": """
            SELECT user_id,
                   string_agg(DISTINCT event_type, '|' ORDER BY event_type) AS types_str
            FROM events GROUP BY 1
        """,
        "a2_min_agg": """
            SELECT o_custkey, strftime(min(o_orderdate), '%Y-%m-%d') AS first_date
            FROM orders GROUP BY 1
        """,
        "a3_having_count_distinct": """
            SELECT l_partkey, count(DISTINCT l_orderkey) AS n_orders
            FROM lineitem GROUP BY 1 HAVING count(DISTINCT l_orderkey) > 3
        """,
        "a5_first_per_group": """
            SELECT user_id, event_id, event_type FROM (
              SELECT user_id, event_id, event_type,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts ASC, event_id ASC) AS rn
              FROM events) WHERE rn = 1
        """,
        "a6_window_dedup": """
            SELECT user_id, event_type, event_id FROM (
              SELECT user_id, event_type, event_id,
                     row_number() OVER (PARTITION BY user_id, event_type
                                        ORDER BY value DESC, event_id ASC) AS rn
              FROM events) WHERE rn = 1
        """,
        "a7_exists_flags": """
            SELECT max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS has_error,
                   max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS has_signup,
                   count(DISTINCT event_type) AS n_types
            FROM events
        """,
        "u2_union_distinct": """
            SELECT DISTINCT user_id FROM (
              SELECT user_id FROM events WHERE event_type = 'error'
              UNION ALL
              SELECT user_id FROM events WHERE event_type = 'signup')
        """,
        "u3_undirected_pairs": """
            SELECT least(l_partkey, l_suppkey) AS pair_lo,
                   greatest(l_partkey, l_suppkey) AS pair_hi,
                   count(*) AS n
            FROM lineitem GROUP BY 1, 2 HAVING count(*) >= 2
        """,
        "u5_anti_join": """
            SELECT c_mktsegment, count(*) AS n_customers
            FROM customer
            WHERE c_custkey NOT IN
              (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
            GROUP BY 1
        """,
        "closure_transitive": """
            WITH RECURSIVE edges AS (
              SELECT CAST(p_partkey AS BIGINT) AS src,
                     CAST(floor(p_partkey / 2) AS BIGINT) AS dst
              FROM part WHERE p_partkey >= 2
            ), r(src, dst) AS (
              SELECT src, dst FROM edges
              UNION
              SELECT r.src, e.dst FROM r JOIN edges e ON r.dst = e.src
            )
            SELECT src, dst FROM r
        """,
        "cc_components": """
            WITH RECURSIVE edges AS (
              SELECT DISTINCT 'o' || CAST(l_orderkey % 500 AS VARCHAR) AS src,
                              'p' || CAST(l_partkey % 500 AS VARCHAR) AS dst
              FROM lineitem
            ), sym AS (
              SELECT src AS a, dst AS b FROM edges
              UNION
              SELECT dst AS a, src AS b FROM edges
            ), reach(a, b) AS (
              SELECT a, b FROM sym
              UNION
              SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
            ), comp AS (
              SELECT a AS node, least(a, min(b)) AS component
              FROM reach GROUP BY a
            )
            SELECT component, count(*) AS n_nodes FROM comp GROUP BY 1
        """,
        "dedup_exact_stats": f"""
            SELECT count(*) AS n_docs, count(DISTINCT {_NORM}) AS n_unique
            FROM documents
        """,
        "dedup_fingerprint": f"""
            SELECT doc_id, md5({_NORM}) AS fingerprint FROM documents
        """,
        "dedup_first_seen": f"""
            SELECT fingerprint, doc_id FROM (
              SELECT md5({_NORM}) AS fingerprint,
                     CAST(doc_id AS VARCHAR) AS doc_id,
                     row_number() OVER (
                       PARTITION BY md5({_NORM})
                       ORDER BY CAST(doc_id AS VARCHAR)) AS rn
              FROM documents
            ) WHERE rn = 1
        """,
        "dedup_token_jaccard": f"""
            WITH toks AS (
              SELECT DISTINCT doc_id AS id, unnest({_TOKS}) AS token FROM documents
            ), sizes AS (
              SELECT id, count(*) AS sz FROM toks GROUP BY 1
            ), common AS (
              SELECT a.id AS a, b.id AS b, count(*) AS c
              FROM toks a JOIN toks b ON a.token = b.token AND a.id < b.id
              GROUP BY 1, 2
            )
            SELECT CAST(floor(round(c * 1.0 / (sa.sz + sb.sz - c), 6) * 10) AS INTEGER) AS jbucket,
                   count(*) AS n_pairs
            FROM common
            JOIN sizes sa ON common.a = sa.id
            JOIN sizes sb ON common.b = sb.id
            WHERE round(c * 1.0 / (sa.sz + sb.sz - c), 6) >= 0.5
            GROUP BY 1
        """,
        "dedup_embedding_cosine": """
            WITH emb AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
              FROM embeddings WHERE vec_id < 200
            )
            SELECT x.vec_id AS a, y.vec_id AS b,
                   round(list_cosine_similarity(x.e, y.e), 4) AS score
            FROM emb x JOIN emb y ON x.vec_id < y.vec_id
            WHERE round(list_cosine_similarity(x.e, y.e), 4) >= 0.25
        """,
        "ann_topk_cosine": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                       FROM embeddings WHERE vec_id < 5),
            scored AS (
              SELECT q.query_id, e.vec_id AS neighbor_id,
                     round(list_cosine_similarity(
                       CAST(q.qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 4) AS score,
                     row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY list_cosine_similarity(
                         CAST(q.qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) DESC,
                       e.vec_id ASC) AS rn
              FROM embeddings e CROSS JOIN q
              WHERE e.vec_id != q.query_id)
            SELECT query_id, neighbor_id, score FROM scored WHERE rn <= 3
        """,
        # exact shingle-Jaccard twin: the LSH pipeline verifies candidates
        # with exact Jaccard, and its banding params give full recall on
        # this corpus (pytest-gated in tests/test_operators.py), so its
        # output equals the exhaustive shingle-Jaccard join
        "dedup_minhash_lsh": f"""
            WITH toks AS (
              SELECT doc_id AS id, {_WTOKS} AS t FROM documents
            ), sh AS (
              SELECT DISTINCT id, shingle FROM (
                SELECT id,
                       unnest(list_transform(
                         range(1, greatest(len(t) - 3, 0) + 2),
                         i -> array_to_string(t[i:i+2], ' '))) AS shingle
                FROM toks)
              WHERE shingle != ''
            ), sizes AS (
              SELECT id, count(*) AS sz FROM sh GROUP BY 1
            ), common AS (
              SELECT x.id AS a, y.id AS b, count(*) AS c
              FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.id < y.id
              GROUP BY 1, 2
            )
            SELECT a, b, round(c * 1.0 / (sa.sz + sb.sz - c), 6) AS jaccard
            FROM common
            JOIN sizes sa ON common.a = sa.id
            JOIN sizes sb ON common.b = sb.id
            WHERE round(c * 1.0 / (sa.sz + sb.sz - c), 6) >= 0.5
        """,
        # exhaustive-hamming twin of the chunk-blocked SimHash: pigeonhole
        # (max_hamming+1 chunks) guarantees the blocked join finds every
        # pair with hamming <= 8, so blocked == exhaustive
        "dedup_simhash": f"""
            WITH toks AS (
              SELECT DISTINCT doc_id AS id, unnest({_WTOKS}) AS token
              FROM documents
            ), h AS (
              SELECT id,
                     CAST(('0x' || substr(md5(token), 1, 12)) AS BIGINT) AS h
              FROM toks
            ), votes AS (
              SELECT id, b,
                     sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
              FROM h CROSS JOIN range(0, 48) t(b)
              GROUP BY id, b
            ), fp AS (
              SELECT id,
                     list(CASE WHEN s > 0 THEN 1 ELSE 0 END ORDER BY b) AS bits
              FROM votes GROUP BY id
            ), pairs AS (
              SELECT x.id AS a, y.id AS b,
                     list_sum(list_transform(range(1, 49),
                       i -> CASE WHEN x.bits[i] != y.bits[i] THEN 1 ELSE 0 END)
                     ) AS hamming
              FROM fp x JOIN fp y ON x.id < y.id
            )
            SELECT a, b, CAST(hamming AS INTEGER) AS hamming
            FROM pairs WHERE hamming <= 8
        """,
        # bit-for-bit twin of the md5-hyperplane multi-probe LSH search
        "ann_lsh_topk": f"""
            WITH emb AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
            ), comps AS (
              SELECT p, list_transform(range(0, 64), i ->
                (CAST(('0x' || substr(md5('42_' || CAST(p AS VARCHAR) || '_'
                                      || CAST(i AS VARCHAR)), 1, 6)) AS BIGINT)
                 % 1000) / 500.0 - 1.0) AS c
              FROM range(0, {_PLANES}) t(p)
            ), buckets AS (
              SELECT vec_id,
                     CAST(sum(CASE WHEN list_dot_product(e, c) >= 0
                              THEN power(2, p) ELSE 0 END) AS BIGINT) AS bucket
              FROM emb CROSS JOIN comps GROUP BY vec_id
            ), q AS (
              SELECT b.vec_id AS query_id, e.e AS qv,
                     xor(b.bucket, m.mask) AS bucket
              FROM buckets b
              JOIN emb e ON b.vec_id = e.vec_id
              CROSS JOIN (VALUES {_mask_values}) m(mask)
              WHERE b.vec_id < 5
            ), cand AS (
              SELECT DISTINCT q.query_id, v.vec_id AS neighbor_id
              FROM q JOIN buckets v ON q.bucket = v.bucket
              WHERE v.vec_id != q.query_id
            ), scored AS (
              SELECT c.query_id, c.neighbor_id,
                     round(list_cosine_similarity(qe.e, ne.e), 4) AS score
              FROM cand c
              JOIN emb qe ON c.query_id = qe.vec_id
              JOIN emb ne ON c.neighbor_id = ne.vec_id
            )
            SELECT query_id, neighbor_id, score FROM (
              SELECT *, row_number() OVER (
                PARTITION BY query_id
                ORDER BY score DESC, neighbor_id ASC) AS rn
              FROM scored) WHERE rn <= 3
        """,
        "shacl_violations": """
            WITH d AS (SELECT CAST(doc_id AS INTEGER) AS n FROM documents),
            v AS (
              SELECT 'DocShape' AS shape, 'label.minCount1' AS "constraint",
                     count(*) AS n_violations
              FROM d WHERE n % 7 = 0 AND n % 11 <> 0
              UNION ALL
              SELECT 'DocShape', 'label.maxCount1', count(*)
              FROM d WHERE n % 7 <> 0 AND n % 11 = 0
              UNION ALL
              SELECT 'DocShape', 'label.languageIn', count(*)
              FROM d WHERE n % 11 = 0
              UNION ALL
              SELECT 'DocShape', 'ident.pattern', count(*)
              FROM d WHERE n % 13 = 0
              UNION ALL
              SELECT 'DocShape', 'sameAs.startsWith', count(*)
              FROM d WHERE n % 17 = 0
            )
            SELECT shape, "constraint", CAST(n_violations AS BIGINT) AS n_violations
            FROM v WHERE n_violations > 0 ORDER BY shape, "constraint"
        """,
        "text_token_count": f"""
            SELECT doc_id, CAST(len({_TOKS}) AS INTEGER) AS n_tokens FROM documents
        """,
        "text_langid": f"""
            WITH scored AS (
              SELECT lang, {_TOKS} AS toks FROM documents
            ), votes AS (
              SELECT lang,
                len(list_intersect(toks, ['der','die','und','von','ist'])) AS s_de,
                len(list_intersect(toks, ['the','and','of','with','is'])) AS s_en,
                len(list_intersect(toks, ['el','la','y','de','es'])) AS s_es,
                len(list_intersect(toks, ['le','la','et','de','est'])) AS s_fr
              FROM scored
            ), best AS (
              SELECT lang,
                CASE
                  WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN
                    CASE WHEN s_de = 0 THEN 'und' ELSE 'de' END
                  WHEN s_en >= s_es AND s_en >= s_fr THEN
                    CASE WHEN s_en = 0 THEN 'und' ELSE 'en' END
                  WHEN s_es >= s_fr THEN CASE WHEN s_es = 0 THEN 'und' ELSE 'es' END
                  ELSE CASE WHEN s_fr = 0 THEN 'und' ELSE 'fr' END
                END AS pred_lang
              FROM votes)
            SELECT lang, pred_lang, count(*) AS n_docs FROM best GROUP BY 1, 2
        """,
        "text_quality": f"""
            WITH b AS (
              SELECT length(text) AS n_chars,
                     {_TOKS} AS toks,
                     length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS punct
              FROM documents
            ), c AS (
              SELECT n_chars, len(toks) AS n_tokens, punct,
                     len(list_filter(toks,
                       t -> list_contains(['the','and','of','with','is'], t))) AS n_stop
              FROM b
            ), q AS (
              SELECT
                CASE WHEN n_tokens > 0 THEN n_chars * 1.0 / n_tokens ELSE 0.0 END AS mtl,
                CASE WHEN n_chars > 0 THEN punct * 1.0 / n_chars ELSE 1.0 END AS pr,
                CASE WHEN n_tokens > 0 THEN n_stop * 1.0 / n_tokens ELSE 0.0 END AS sr,
                least(n_tokens / 64.0, 1.0) AS lt
              FROM c
            )
            SELECT CAST(floor(round(
                     lt * 0.4
                     + (CASE WHEN mtl >= 3 AND mtl <= 10 THEN 1.0 ELSE 0.5 END) * 0.2
                     + (1.0 - least(pr * 4, 1.0)) * 0.2
                     + least(sr * 5, 1.0) * 0.2, 2) * 10) AS INTEGER) AS qbucket,
                   count(*) AS n_docs
            FROM q GROUP BY 1
        """,
        "stream_window_counts": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
                   event_type, count(*) AS n,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
            FROM events GROUP BY 1, 2
        """,
        "kg_mentions": _kg_mentions_oracle(),
        "kg_validate": _kg_validate_oracle(),
        "kg_authors": _kg_authors_oracle(),
        "kg_works": _kg_works_oracle(),
        "kg_relations": _kg_relations_oracle(),
        "kg_pipeline": _kg_pipeline_oracle(),
        # twin of operators/multimodal: the media table is re-derived from
        # documents (md5-conv doc selection, fixtures.interleaved_corpus),
        # the stub payload is the UTF-8 bytes of sha2-hex(media_ref) so
        # sha256(sha256(media_ref)) reproduces the feature bytes, and the
        # float32 cast of each feature (array<float>) is mirrored with
        # CAST(... AS FLOAT) before the double-precision norm
        "kg_media_features": """
            WITH media AS (
              SELECT DISTINCT 'media://' || CAST(doc_id AS VARCHAR) || '/art' AS media_ref
              FROM documents
              WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT) % 3 = 0
            ), f AS (
              SELECT media_ref,
                ['image','audio','video'][
                  CAST(CAST('0x' || substr(md5(media_ref), 1, 6) AS BIGINT) % 3 AS INT) + 1
                ] AS kind,
                sha256(sha256(media_ref)) AS h2
              FROM media
            )
            SELECT media_ref, kind, CAST(64 AS INTEGER) AS n_bytes, TRUE AS ok,
              round(sqrt(list_reduce(
                list_transform(
                  list_transform(range(0, 16),
                    i -> CAST((CAST('0x' || substr(h2, CAST(2*i+1 AS INT), 2) AS BIGINT)
                               / 255.0) * 2 - 1 AS FLOAT)),
                  v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)),
                (x, y) -> x + y)), 4) AS feature_norm
            FROM f
        """,
        # twin of operators/multimodal.frame_sample_plan: same md5-conv
        # media derivation as kg_media_features; every video payload has
        # duration_ms=1000, sampled every 250 ms → frames 0,250,500,750
        # (Spark sequence(0, duration-1, 250) inclusive == DuckDB
        # range(0, duration, 250) end-exclusive)
        "frame_sample": """
            WITH media AS (
              SELECT DISTINCT 'media://' || CAST(doc_id AS VARCHAR) || '/art' AS media_ref
              FROM documents
              WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT) % 3 = 0
            ), f AS (
              SELECT media_ref,
                ['image','audio','video'][
                  CAST(CAST('0x' || substr(md5(media_ref), 1, 6) AS BIGINT) % 3 AS INT) + 1
                ] AS kind
              FROM media
            )
            SELECT media_ref, CAST(unnest(range(0, 1000, 250)) AS INTEGER) AS frame_ms
            FROM f WHERE kind = 'video'
        """,
    }
