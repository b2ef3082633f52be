"""Golden triple-set P/R test for the relations (INTRO) stage."""

from __future__ import annotations

from wikidata_to_cidoc_crm_spark import oracle, oracle_relations
from wikidata_to_cidoc_crm_spark.model import triples_to_python_set
from wikidata_to_cidoc_crm_spark.plans.relations import relations_stage


def _engine_set(spark, world, dims, qids):
    work_qids = spark.createDataFrame([(q,) for q in sorted(qids)], "qid string")
    return triples_to_python_set(
        relations_stage(
            spark, work_qids, dims["wd_statements"], dims["wd_labels"],
            dims["wd_subclass_closure"], dims["wd_property_closure"],
        )
    )


def test_relations_full_world_pr(spark, world, dims):
    qids = {w["qid"] for w in world.works}
    engine = _engine_set(spark, world, dims, qids)
    golden = oracle_relations.relations_triples(world, qids)
    p, r = oracle.precision_recall(engine, golden)
    extra = sorted(engine - golden)[:10]
    missing = sorted(golden - engine)[:10]
    assert p >= 0.95 and r >= 0.95, (p, r, len(engine), len(golden), extra, missing)
    assert p == 1.0 and r == 1.0, (len(engine - golden), len(golden - engine), extra, missing)


def test_relations_subset(spark, world, dims):
    qids = {w["qid"] for w in world.works[:12]}
    engine = _engine_set(spark, world, dims, qids)
    golden = oracle_relations.relations_triples(world, qids)
    assert engine == golden, (
        sorted(engine - golden)[:10], sorted(golden - engine)[:10])
