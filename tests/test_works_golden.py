"""Golden triple-set P/R test for the works (WEMI) stage."""

from __future__ import annotations

from wikidata_to_cidoc_crm_spark import oracle
from wikidata_to_cidoc_crm_spark.model import triples_to_python_set
from wikidata_to_cidoc_crm_spark.plans.works import works_stage


def test_works_full_world_pr(spark, world, dims):
    work_qids = spark.createDataFrame(
        [(w["qid"],) for w in world.works], "qid string"
    )
    engine = triples_to_python_set(
        works_stage(spark, work_qids, dims["wd_statements"], dims["wd_labels"])
    )
    golden = oracle.works_triples(world)
    p, r = oracle.precision_recall(engine, golden)
    extra = sorted(engine - golden)[:8]
    missing = sorted(golden - engine)[:8]
    assert p >= 0.95 and r >= 0.95, (p, r, extra, missing)
    assert p == 1.0 and r == 1.0, (extra, missing)


def test_works_subset(spark, world, dims):
    subset = {w["qid"] for w in world.works[:5]}
    work_qids = spark.createDataFrame([(q,) for q in sorted(subset)], "qid string")
    engine = triples_to_python_set(
        works_stage(spark, work_qids, dims["wd_statements"], dims["wd_labels"])
    )
    golden = oracle.works_triples(world, subset)
    assert engine == golden
