"""CLI smoke tests — parity with the reference's five-subcommand front end
(/root/reference/src/wiki2crm/cli.py:7-67) plus engine-added pipeline and
validate. Runs each subcommand end-to-end in-process (shared test Spark
session picked up by getOrCreate)."""

from __future__ import annotations

import os

import pytest

from wikidata_to_cidoc_crm_spark.cli import main
from wikidata_to_cidoc_crm_spark.sources.ttl import parse_ttl_file


@pytest.fixture(scope="module")
def qid_csvs(tmp_path_factory, world):
    d = tmp_path_factory.mktemp("cli")
    persons = d / "persons.csv"
    persons.write_text("\n".join(p["qid"] for p in world.persons) + "\n")
    works = d / "works.csv"
    works.write_text("\n".join(w["qid"] for w in world.works) + "\n")
    return str(persons), str(works), str(d)


def test_cli_stage_subcommands_and_merge_align(spark, qid_csvs):
    persons_csv, works_csv, d = qid_csvs
    a_out = os.path.join(d, "authors_t")
    w_out = os.path.join(d, "works_t")
    r_out = os.path.join(d, "relations_t")
    assert main(["authors", "--input", persons_csv, "--output", a_out]) == 0
    assert main(["works", "--input", works_csv, "--output", w_out]) == 0
    assert main(["relations", "--input", works_csv, "--output", r_out]) == 0

    merged = os.path.join(d, "merged_t")
    assert main(["merge", "--authors", a_out, "--works", w_out,
                 "--relations", r_out, "--output", merged]) == 0
    aligned_ttl = os.path.join(d, "aligned.ttl")
    assert main(["map-align", "--input", merged,
                 "--output", aligned_ttl]) == 0
    triples = parse_ttl_file(aligned_ttl)
    assert len(triples) > 1000

    # validate subcommand: authors table conforms (exit 0), works table has
    # the known reference-inherent TitleShape violation (exit 1)
    assert main(["validate", "--input", a_out, "--shapes", "authors"]) == 0
    assert main(["validate", "--input", w_out, "--shapes", "works"]) == 1


def test_cli_ttl_output(spark, qid_csvs, tmp_path):
    persons_csv, _, _ = qid_csvs
    out = str(tmp_path / "authors.ttl")
    assert main(["authors", "--input", persons_csv, "--output", out]) == 0
    ts = parse_ttl_file(out)
    assert any(p == "http://www.w3.org/2002/07/owl#sameAs" for _, p, *_ in ts)
