"""The fan-out align emission (SPARK_GRAFT_ALIGN_FANOUT=1, default) must
produce exactly the same triple set as the per-triple union-branch spelling
(=0) — including the conditional references_person/references_place elif
fan-out and every gated group — on the full fixture world."""

from __future__ import annotations

import pytest

from wikidata_to_cidoc_crm_spark.model import triples_to_python_set
from wikidata_to_cidoc_crm_spark.plans.align import align_stage
from wikidata_to_cidoc_crm_spark.plans.authors import authors_stage
from wikidata_to_cidoc_crm_spark.plans.merge import merge_stage
from wikidata_to_cidoc_crm_spark.plans.relations import relations_stage
from wikidata_to_cidoc_crm_spark.plans.works import works_stage


@pytest.fixture(scope="module")
def merged(spark, world, dims):
    person_qids = spark.createDataFrame(
        [(p["qid"],) for p in world.persons], "qid string")
    work_qids = spark.createDataFrame(
        [(w["qid"],) for w in world.works], "qid string")
    a = authors_stage(spark, person_qids, dims["wd_statements"], dims["wd_labels"])
    w = works_stage(spark, work_qids, dims["wd_statements"], dims["wd_labels"])
    r = relations_stage(spark, work_qids, dims["wd_statements"], dims["wd_labels"],
                        dims["wd_subclass_closure"], dims["wd_property_closure"])
    return merge_stage(spark, [a, w, r]).localCheckpoint(eager=True)


def _aligned_set(spark, merged, dims, monkeypatch, flag: str):
    monkeypatch.setenv("SPARK_GRAFT_ALIGN_FANOUT", flag)
    return triples_to_python_set(
        align_stage(spark, merged, dims["wd_external_ids"]))


def test_fanout_equals_union_branches(spark, world, dims, merged, monkeypatch):
    fan = _aligned_set(spark, merged, dims, monkeypatch, "1")
    legacy = _aligned_set(spark, merged, dims, monkeypatch, "0")
    assert fan == legacy, (
        len(fan), len(legacy),
        sorted(fan - legacy)[:8], sorted(legacy - fan)[:8])


def test_fanout_equals_union_branches_full_dedup_path(
        spark, world, dims, merged, monkeypatch):
    """assume_distinct=False exercises the full-graph dedup branch."""
    monkeypatch.setenv("SPARK_GRAFT_ALIGN_FANOUT", "1")
    fan = triples_to_python_set(align_stage(
        spark, merged, dims["wd_external_ids"], assume_distinct=False))
    monkeypatch.setenv("SPARK_GRAFT_ALIGN_FANOUT", "0")
    legacy = triples_to_python_set(align_stage(
        spark, merged, dims["wd_external_ids"], assume_distinct=False))
    assert fan == legacy, (len(fan), len(legacy))
