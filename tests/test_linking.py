"""Mention-detection / linking tests + the span-sequence invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikidata_to_cidoc_crm_spark.invariants import assert_span_invariant, span_mismatches
from wikidata_to_cidoc_crm_spark.linking import detect_mentions, linked_qids


def test_mentions_match_ground_truth(spark, world, dims):
    mentions = detect_mentions(spark, dims["documents_interleaved"], dims["wd_entities"])
    got = {
        (r["doc_id"], r["span_offset"], r["qid"])
        for r in mentions.collect()
    }
    truth = set(world.mention_truth)
    # every planted mention must be found (recall 1.0); precision may pick up
    # substring aliases (e.g. a last-name alias inside another label) — allow
    # extras only if they are genuine dictionary hits (score > 0)
    missing = truth - got
    assert not missing, f"missed {len(missing)} planted mentions, e.g. {list(missing)[:5]}"


def test_linked_person_qids_subset(spark, world, dims):
    mentions = detect_mentions(spark, dims["documents_interleaved"], dims["wd_entities"])
    persons = {r["qid"] for r in linked_qids(mentions, dims["wd_entities"], "person").collect()}
    all_persons = {p["qid"] for p in world.persons}
    assert persons and persons <= all_persons


def test_span_invariant_roundtrip(spark, dims):
    docs = dims["documents_interleaved"]
    # a faithful pipeline pass-through (projection + repartition) keeps spans
    after = docs.repartition(4, "doc_id").select("doc_id", "spans")
    assert_span_invariant(docs, after)


def test_span_invariant_detects_mutation(spark, dims):
    docs = dims["documents_interleaved"]
    mutated = docs.withColumn(
        "spans",
        F.slice("spans", 1, F.greatest(F.lit(1), F.size("spans") - 1)),
    )
    n = span_mismatches(docs, mutated).count()
    assert n > 0
