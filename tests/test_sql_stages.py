"""SQL-compiled stage builds must be triple-set identical to the classic
DataFrame builds (plans/sql_stages.py acceptance gate, round 6).

The SQL path is the default (SPARK_GRAFT_SQL_STAGES=1) — the golden-parity
tests already pin it against the reference outputs; this module pins the
*internal* equivalence of the two builds so either can be used as the
other's oracle, and covers the non-default flag combinations the pipeline
doesn't exercise (include_header=False, dedupe=False)."""

from __future__ import annotations

import pytest

from wikidata_to_cidoc_crm_spark.model import triples_to_python_set


def _qids(spark, world, key):
    rows = world.persons if key == "persons" else world.works
    return spark.createDataFrame([(r["qid"],) for r in rows], "qid string")


def _both(monkeypatch, build):
    monkeypatch.setenv("SPARK_GRAFT_SQL_STAGES", "1")
    via_sql = triples_to_python_set(build())
    monkeypatch.setenv("SPARK_GRAFT_SQL_STAGES", "0")
    via_df = triples_to_python_set(build())
    return via_sql, via_df


def test_authors_sql_equals_dataframe(spark, dims, world, monkeypatch):
    from wikidata_to_cidoc_crm_spark.plans.authors import authors_stage

    pq = _qids(spark, world, "persons")
    a, b = _both(monkeypatch, lambda: authors_stage(
        spark, pq, dims["wd_statements"], dims["wd_labels"]))
    assert a == b and len(a) > 100


def test_works_sql_equals_dataframe(spark, dims, world, monkeypatch):
    from wikidata_to_cidoc_crm_spark.plans.works import works_stage

    wq = _qids(spark, world, "works")
    a, b = _both(monkeypatch, lambda: works_stage(
        spark, wq, dims["wd_statements"], dims["wd_labels"]))
    assert a == b and len(a) > 100


def test_relations_sql_equals_dataframe(spark, dims, world, monkeypatch):
    from wikidata_to_cidoc_crm_spark.plans.relations import relations_stage

    wq = _qids(spark, world, "works")
    a, b = _both(monkeypatch, lambda: relations_stage(
        spark, wq, dims["wd_statements"], dims["wd_labels"],
        dims["wd_subclass_closure"], dims["wd_property_closure"]))
    assert a == b and len(a) > 100


@pytest.mark.parametrize("include_header,dedupe", [(False, True), (True, False)])
def test_flag_variants_match(spark, dims, world, monkeypatch,
                             include_header, dedupe):
    """Non-default flags: header exclusion and raw (pre-dedup) emission.
    For dedupe=False the MULTISET can differ between builds only by
    duplicate counts that the downstream merge dedups away, so compare the
    distinct set (the contract both builds must honor)."""
    from wikidata_to_cidoc_crm_spark.plans.authors import authors_stage

    pq = _qids(spark, world, "persons")
    a, b = _both(monkeypatch, lambda: authors_stage(
        spark, pq, dims["wd_statements"], dims["wd_labels"],
        include_header=include_header, dedupe=dedupe))
    assert a == b and len(a) > 100


def test_emission_sql_is_fanout_generate(spark, dims, world, monkeypatch):
    """The SQL emission keeps the P13 shape: one Generate (inline) per
    source, no shuffle introduced by the fan-out itself."""
    monkeypatch.setenv("SPARK_GRAFT_SQL_STAGES", "1")
    from wikidata_to_cidoc_crm_spark.plans.authors import authors_stage

    pq = _qids(spark, world, "persons")
    df = authors_stage(spark, pq, dims["wd_statements"], dims["wd_labels"],
                       dedupe=False)
    jvm = spark._jvm
    plan = jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")
    assert "Generate inline" in plan


def test_triples_to_python_set_guard_raises(spark):
    """model.triples_to_python_set must refuse production-scale collects
    (round-4/5 advice item: row-count gate like linking.py's)."""
    from pyspark.sql import functions as F

    from wikidata_to_cidoc_crm_spark.model import triples_to_python_set

    big = spark.range(10).select(
        F.col("id").cast("string").alias("subj"), F.lit("p").alias("pred"),
        F.lit("o").alias("obj"), F.lit(True).alias("obj_is_iri"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(None).cast("string").alias("dtype"))
    with pytest.raises(ValueError, match="refusing to collect"):
        triples_to_python_set(big, max_rows=5)
    assert len(triples_to_python_set(big, max_rows=100)) == 10


def test_merge_sql_equals_dataframe(spark, dims, world, monkeypatch):
    from wikidata_to_cidoc_crm_spark.plans.authors import authors_stage
    from wikidata_to_cidoc_crm_spark.plans.merge import merge_stage
    from wikidata_to_cidoc_crm_spark.plans.works import works_stage

    pq = _qids(spark, world, "persons")
    wq = _qids(spark, world, "works")
    a = authors_stage(spark, pq, dims["wd_statements"], dims["wd_labels"]) \
        .localCheckpoint(eager=True)
    w = works_stage(spark, wq, dims["wd_statements"], dims["wd_labels"]) \
        .localCheckpoint(eager=True)
    s1, s2 = _both(monkeypatch, lambda: merge_stage(spark, [a, w]))
    assert s1 == s2 and len(s1) > 100
