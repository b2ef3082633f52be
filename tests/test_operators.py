"""Unit tests for the custom operators (closure, components, pairs, dedup,
similarity, text stats, multimodal plumbing, streaming-equivalent plan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikidata_to_cidoc_crm_spark.operators.closure import transitive_closure
from wikidata_to_cidoc_crm_spark.operators.components import connected_components
from wikidata_to_cidoc_crm_spark.operators.dedup import (
    exact_dup_groups,
    jaccard_pairs,
    minhash_lsh_dedup,
    simhash_near_pairs,
)
from wikidata_to_cidoc_crm_spark.operators.pairs import first_partner, pair_join
from wikidata_to_cidoc_crm_spark.operators.similarity import brute_force_topk


def test_transitive_closure_chain(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")], "src string, dst string")
    got = {(r["src"], r["dst"]) for r in
           transitive_closure(edges, include_self=False).collect()}
    assert got == {("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
                   ("b", "d"), ("c", "d"), ("x", "y")}


def test_transitive_closure_reflexive(spark):
    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    got = {(r["src"], r["dst"]) for r in transitive_closure(edges).collect()}
    assert got == {("a", "a"), ("b", "b"), ("a", "b")}


def test_connected_components(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "e"), ("f", "f")],
        "src string, dst string")
    got = {(r["node"], r["component"]) for r in connected_components(edges).collect()}
    assert got == {("a", "a"), ("b", "a"), ("c", "a"),
                   ("d", "d"), ("e", "d"), ("f", "f")}


def test_pair_join_and_first_partner(spark):
    fw = spark.createDataFrame(
        [("f1", "w1"), ("f1", "w2"), ("f1", "w3"), ("f2", "w9")],
        "tgt string, work string")
    pairs = {(r["tgt"], r["w1"], r["w2"]) for r in pair_join(fw).collect()}
    assert pairs == {("f1", "w1", "w2"), ("f1", "w1", "w3"), ("f1", "w2", "w3")}
    fp = {(r["tgt"], r["work"], r["rel_w1"], r["rel_w2"])
          for r in first_partner(fw).collect()}
    # first-pair-wins: w1→(w1,w2); w2→(w1,w2); w3→(w1,w3); singleton dropped
    assert fp == {("f1", "w1", "w1", "w2"), ("f1", "w2", "w1", "w2"),
                  ("f1", "w3", "w1", "w3")}


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "THE  quick brown fox jumps over the lazy dog"),  # exact dup of 1 (normalized)
        (4, "completely different text about spark engines and shuffles"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_exact_dup_groups(spark):
    groups = exact_dup_groups(_docs(spark)).collect()
    assert len(groups) == 1 and sorted(groups[0]["ids"]) == [1, 3]


def test_jaccard_pairs_finds_near_dups(spark):
    pairs = {(r["a"], r["b"]) for r in jaccard_pairs(_docs(spark), threshold=0.7).collect()}
    assert (1, 2) in pairs and (1, 3) in pairs and (2, 3) in pairs
    assert not any(4 in p for p in pairs)


def test_minhash_lsh_recall_on_exact_dup(spark):
    pairs = {(r["a"], r["b"]) for r in
             minhash_lsh_dedup(_docs(spark), threshold=0.9).collect()}
    # exact duplicates always agree on every band → must be found
    assert (1, 3) in pairs


def test_simhash_near_pairs(spark):
    pairs = {(r["a"], r["b"]): r["hamming"] for r in
             simhash_near_pairs(_docs(spark), max_hamming=10).collect()}
    assert pairs.get((1, 3)) == 0  # identical token sets → identical simhash
    assert (1, 2) in pairs


def test_brute_force_topk_exact(spark):
    vecs = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]), (3, [1.0, 0.05])],
        "vec_id bigint, embedding array<float>")
    out = brute_force_topk(vecs, vecs.filter(F.col("vec_id") == 0), k=2)
    got = [(r["neighbor_id"]) for r in out.orderBy(F.desc("score")).collect()]
    assert got == [3, 1]


def test_media_feature_plumbing(spark, dims):
    from wikidata_to_cidoc_crm_spark.operators.multimodal import (
        extract_media_features, frame_sample_plan, synthesize_media_table)

    media = synthesize_media_table(dims["documents_interleaved"])
    feats = extract_media_features(media, feature_dim=8)
    rows = feats.collect()
    assert rows and all(len(r["feature"]) == 8 and r["ok"] for r in rows)
    frames = frame_sample_plan(media, every_ms=500)
    vids = media.filter(F.col("meta.kind") == "video").count()
    assert frames.count() == vids * 2  # 1000ms / 500ms


def test_wav_decode_end_to_end(spark):
    """Real codec path: RIFF/PCM WAV payloads decode through the same
    mapInPandas stage as the stub path — per-segment RMS features, ok=True,
    deterministic across runs; malformed RIFF yields ok=False, not a crash."""
    import math

    from wikidata_to_cidoc_crm_spark.operators.multimodal import (
        _decode_wav, extract_media_features, synth_wav)

    # local decode: constant half-amplitude square wave → RMS 0.5 everywhere
    import struct
    data = b"".join(struct.pack("<h", 16384 if i % 2 else -16384)
                    for i in range(800))
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    feats = _decode_wav(wav, 4)
    assert len(feats) == 4 and all(math.isclose(f, 0.5, abs_tol=1e-5) for f in feats)

    # end-to-end through the Arrow stage: synthetic WAVs + one stub payload
    # + one malformed RIFF
    rows = [("m1", synth_wav("m1"), ("audio", "audio/wav", 0, 0, 100)),
            ("m2", synth_wav("m2", bits=8, channels=2), ("audio", "audio/wav", 0, 0, 100)),
            ("m3", b"\x01\x02\x03", ("image", "application/octet-stream", 8, 8, 0)),
            ("m4", b"RIFF\x00\x00\x00\x00WAVEjunk", ("audio", "audio/wav", 0, 0, 100))]
    from wikidata_to_cidoc_crm_spark.operators.multimodal import MEDIA_SCHEMA
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_ref"]: r for r in
           extract_media_features(media, feature_dim=6).collect()}
    assert out["m1"]["ok"] and out["m2"]["ok"] and out["m3"]["ok"]
    assert not out["m4"]["ok"]  # malformed container flagged, row kept
    # WAV features are real RMS values (0..1), not the sha stub's [-1,1] grid
    assert all(0.0 <= v <= 1.0 for v in out["m1"]["feature"])
    # FEATURE_SCHEMA stores float32 — compare with a float32-sized tolerance
    for ref, kwargs in [("m1", {}), ("m2", {"bits": 8, "channels": 2})]:
        expect = _decode_wav(synth_wav(ref, **kwargs), 6)
        assert all(math.isclose(a, b, abs_tol=1e-5)
                   for a, b in zip(out[ref]["feature"], expect))


def test_streaming_batch_equivalence(spark):
    from wikidata_to_cidoc_crm_spark.streaming.events import windowed_event_counts

    events = spark.createDataFrame(
        [("2024-01-01 00:10:00", "a", 1.0), ("2024-01-01 00:50:00", "a", 2.0),
         ("2024-01-01 01:10:00", "b", 3.0)],
        "ts_s string, event_type string, value double",
    ).select(F.col("ts_s").cast("timestamp").alias("ts"), "event_type", "value")
    got = {(str(r["window_start"]), r["event_type"], r["n"], r["total_value"])
           for r in windowed_event_counts(events).collect()}
    assert got == {("2024-01-01 00:00:00", "a", 2, 3.0),
                   ("2024-01-01 01:00:00", "b", 1, 3.0)}


def test_pair_join_salted_equals_unsalted(spark):
    """Real salting correctness: a hub key above heavy_threshold produces
    exactly the same pair set through the salted path (salt in join key,
    replicated right side) as the plain self-join."""
    from wikidata_to_cidoc_crm_spark.operators.pairs import pair_join

    rows = [("hub", f"w{i:03d}") for i in range(60)] + [
        ("k1", "a"), ("k1", "b"), ("k1", "c"), ("k2", "x"), ("k2", "y")]
    fw = spark.createDataFrame(rows, "tgt string, work string")
    plain = {tuple(r) for r in pair_join(fw).collect()}
    salted = {tuple(r) for r in pair_join(
        fw, salt_partitions=8, heavy_threshold=10).collect()}
    assert salted == plain
    assert len(plain) == 60 * 59 // 2 + 3 + 1
    # the salted plan actually replicates the heavy side across salts
    plan = pair_join(fw, salt_partitions=8, heavy_threshold=10) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "explode" in plan or "Generate" in plan


def test_minhash_lsh_recall_complete_on_testdata(spark):
    """Gate for the dedup_minhash_lsh DuckDB oracle: on the driver corpus
    the banded LSH candidates reach every true pair with shingle-Jaccard
    >= 0.5, so the LSH output equals the exhaustive join (which is what
    the oracle computes)."""
    from wikidata_to_cidoc_crm_spark.operators.dedup import (
        minhash_lsh_dedup, shingles)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sh = shingles(docs, "doc_id", "text", 3)
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("id").alias("a"), "shingle")
    b = sh.select(F.col("id").alias("b"), "shingle")
    common = (a.join(b, "shingle").filter(F.col("a") < F.col("b"))
              .groupBy("a", "b").agg(F.count("*").alias("c")))
    exact = (
        common
        .join(sizes.withColumnRenamed("id", "a").withColumnRenamed("sz", "sza"), "a")
        .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("sz", "szb"), "b")
        .withColumn("j", F.round(F.col("c") / (F.col("sza") + F.col("szb") - F.col("c")), 6))
        .filter(F.col("j") >= 0.5).select("a", "b"))
    lsh = minhash_lsh_dedup(docs, threshold=0.5).select("a", "b")
    missed = exact.exceptAll(lsh).count()
    extra = lsh.exceptAll(exact).count()
    assert missed == 0 and extra == 0


def test_simhash_blocking_is_exact(spark):
    """Pigeonhole exactness: chunk-blocked pairs == exhaustive hamming
    pairs at max_hamming = n_chunks - 1."""
    from wikidata_to_cidoc_crm_spark.operators.dedup import (
        simhash, simhash_near_pairs)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    blocked = {(r["a"], r["b"], r["hamming"]) for r in
               simhash_near_pairs(docs, max_hamming=6, bits=48,
                                  hash_mode="md5").collect()}
    fp = simhash(docs, bits=48, hash_mode="md5")
    a = fp.select(F.col("id").alias("a"), F.col("bits").alias("ba"))
    b = fp.select(F.col("id").alias("b"), F.col("bits").alias("bb"))
    ham = F.size(F.filter(F.zip_with("ba", "bb", lambda x, y: x != y),
                          lambda d: d))
    exhaustive = {(r["a"], r["b"], r["hamming"]) for r in
                  a.crossJoin(b).filter(F.col("a") < F.col("b"))
                  .withColumn("hamming", ham)
                  .filter(F.col("hamming") <= 6)
                  .select("a", "b", "hamming").collect()}
    assert blocked == exhaustive and len(exhaustive) > 0


def test_minhash_signatures_match_per_seed_spelling(spark):
    """The aggregate-per-seed signature (r6 shuffle-width rewrite) must be
    bit-identical to the explicit explode-seeds spelling it replaced."""
    from wikidata_to_cidoc_crm_spark.operators.dedup import (
        minhash_signatures, shingles)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    new = {r["id"]: list(r["sig"])
           for r in minhash_signatures(docs, num_hashes=8).collect()}
    sh = shingles(docs, "doc_id", "text", 3)
    seeded = sh.select(
        "id", F.explode(F.sequence(F.lit(0), F.lit(7))).alias("seed"),
        "shingle").withColumn("h", F.xxhash64("shingle", "seed"))
    old = {}
    for r in seeded.groupBy("id", "seed").agg(F.min("h").alias("mh")).collect():
        old.setdefault(r["id"], [None] * 8)[r["seed"]] = r["mh"]
    assert new == old and len(new) > 10
