"""DuckDB twins of the mapping stages (map_sql) — exact triple-set parity
vs the pure-Python reference-semantics oracle.

Spark-free: the golden tests (test_authors_golden / test_works_golden)
already pin Spark == pure-Python oracle, so DuckDB == oracle here closes
the triangle for the driver contract's kg_authors / kg_works rows.
"""

import duckdb
import pytest

from wikidata_to_cidoc_crm_spark.fixtures import make_world
from wikidata_to_cidoc_crm_spark.map_sql import (
    authors_sql,
    relations_sql,
    works_sql,
)
from wikidata_to_cidoc_crm_spark.oracle import authors_triples, works_triples
from wikidata_to_cidoc_crm_spark.oracle_relations import relations_triples


@pytest.fixture(scope="module")
def world():
    return make_world()


def _run(sql: str) -> set[tuple]:
    con = duckdb.connect()
    con.execute("SET threads=4")
    rows = con.execute(sql).fetchall()
    return {(s, p, o, lang, dtype, bool(ii))
            for (s, p, o, ii, lang, dtype) in rows}


def test_authors_sql_exact(world):
    got = _run(authors_sql(world))
    want = authors_triples(world)
    assert got == want, (
        f"extra={sorted(got - want)[:3]} missing={sorted(want - got)[:3]}")


def test_works_sql_exact(world):
    got = _run(works_sql(world))
    want = works_triples(world)
    assert got == want, (
        f"extra={sorted(got - want)[:3]} missing={sorted(want - got)[:3]}")


def test_relations_sql_exact(world):
    """Also the loud guard for the twin's documented simplification: if a
    future fixture world ever produced conflicting interpretation-tid
    claims (or casefold label ties), this exact-set assertion fails."""
    got = _run(relations_sql(world))
    want = relations_triples(world)
    assert got == want, (
        f"extra={sorted(got - want)[:3]} missing={sorted(want - got)[:3]}")


def test_relations_sql_exact_scaled():
    """Parity again on a bigger world (scale 3): more works per feature →
    deeper combinations() chains exercise the first-partner-wins logic."""
    from wikidata_to_cidoc_crm_spark.fixtures import make_world_scaled

    w = make_world_scaled(3)
    got = _run(relations_sql(w))
    want = relations_triples(w)
    assert got == want, (
        f"extra={sorted(got - want)[:3]} missing={sorted(want - got)[:3]}")


def test_authors_sql_null_date_guard(world):
    """The split_part('' vs NULL) guard: no empty timespan/ IRIs may appear."""
    got = _run(authors_sql(world))
    assert not [t for t in got if t[0].endswith("timespan/") or
                (t[2].endswith("timespan/") and t[5])]
