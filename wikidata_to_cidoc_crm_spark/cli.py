"""CLI parity with the reference's five-subcommand front end.

Mirrors ``/root/reference/src/wiki2crm/cli.py:7-67`` (subcommands
``authors works relations merge map-align``) plus two engine-added
commands: ``pipeline`` (the end-to-end interleaved-corpus flow) and
``validate`` (the SHACL-derived check layer).

I/O conventions:
* ``--input`` for the mapping stages is a 1-column CSV of QIDs, exactly
  like the reference (S1 scan, ``sources/readers.load_qids``);
* ``--output`` ending in ``.ttl`` serializes with the test-scale Turtle
  writer (the reference's output format); anything else is written as a
  partitioned parquet triple table (the cluster-scale sink);
* the Wikidata dimensions come from the deterministic fixture world (the
  sandbox stand-in for the SPARQL endpoint; on a cluster point the stages
  at dimension tables extracted from a dump) — size with ``--world-scale``.
"""

from __future__ import annotations

import argparse
import sys

__version__ = "0.2.0"


def _write(df, output: str) -> int:
    """Write a triple DataFrame to .ttl (test scale) or parquet."""
    n = df.count()
    if output.endswith(".ttl"):
        from .model import triples_to_python_set
        from .sources.ttl import write_ttl

        write_ttl(triples_to_python_set(df), output)
    else:
        from pyspark.sql import functions as F

        (df.withColumn("subj_bucket", F.pmod(F.xxhash64("subj"), F.lit(64)))
           .write.mode("overwrite").partitionBy("subj_bucket").parquet(output))
    print(f"wrote {n} triples to {output}")
    return 0


def _spark(args):
    from .session import get_spark

    return get_spark("wiki2crm-spark-cli", cores=args.cores,
                     shuffle_partitions=args.cores)


def _world(spark, args):
    from .fixtures import make_world_scaled, world_to_spark

    return world_to_spark(spark, make_world_scaled(args.world_scale))


def _qids(spark, path: str):
    from .sources.readers import load_qids

    return load_qids(spark, path)


def cmd_authors(args) -> int:
    from .plans.authors import authors_stage

    spark = _spark(args)
    dims = _world(spark, args)
    out = authors_stage(spark, _qids(spark, args.input),
                        dims["wd_statements"], dims["wd_labels"])
    return _write(out, args.output)


def cmd_works(args) -> int:
    from .plans.works import works_stage

    spark = _spark(args)
    dims = _world(spark, args)
    out = works_stage(spark, _qids(spark, args.input),
                      dims["wd_statements"], dims["wd_labels"])
    return _write(out, args.output)


def cmd_relations(args) -> int:
    from .plans.relations import relations_stage

    spark = _spark(args)
    dims = _world(spark, args)
    out = relations_stage(spark, _qids(spark, args.input),
                          dims["wd_statements"], dims["wd_labels"],
                          dims["wd_subclass_closure"],
                          dims["wd_property_closure"])
    return _write(out, args.output)


def cmd_merge(args) -> int:
    from .plans.merge import merge_stage
    from .sources.readers import read_triples

    spark = _spark(args)
    parts = [read_triples(spark, p)
             for p in (args.authors, args.works, args.relations) if p]
    if not parts:
        print("merge: need at least one of --authors/--works/--relations",
              file=sys.stderr)
        return 2
    return _write(merge_stage(spark, parts), args.output)


def cmd_map_align(args) -> int:
    from .plans.align import align_stage
    from .sources.readers import read_triples

    spark = _spark(args)
    # a TTL file from outside the pipeline may repeat triples and carry
    # dbpedia CURIEs anywhere — assume_distinct=False selects the
    # full-graph dedup + whole-output CURIE normalization path
    g = read_triples(spark, args.input)
    return _write(align_stage(spark, g, assume_distinct=False), args.output)


def cmd_pipeline(args) -> int:
    from .pipeline import run_pipeline

    spark = _spark(args)
    out = run_pipeline(spark, args.sf_dir, checkpoint_dir=args.checkpoint_dir)
    return _write(out, args.output)


def cmd_validate(args) -> int:
    from .shacl import validate_summary
    from .shapes_spec import AUTHOR_SHAPES, RELATIONS_SHAPES, WORK_SHAPES
    from .sources.readers import read_triples

    spark = _spark(args)
    shapes = {"authors": AUTHOR_SHAPES, "works": WORK_SHAPES,
              "relations": RELATIONS_SHAPES}[args.shapes]
    rows = validate_summary(read_triples(spark, args.input), shapes).collect()
    if not rows:
        print("conforms: no violations")
        return 0
    for r in rows:
        print(f"{r['shape']}\t{r['constraint']}\t{r['n_violations']}")
    return 1


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="wiki2crm-spark",
        description="Wikidata → CIDOC CRM/LRMoo/INTRO, Spark-native")
    p.add_argument("--version", action="version",
                   version=f"%(prog)s {__version__}")
    p.add_argument("--cores", type=int, default=8,
                   help="local[N] cores / shuffle partitions (default 8)")
    p.add_argument("--world-scale", type=int, default=1,
                   help="fixture-world scale (sandbox SPARQL stand-in)")
    sub = p.add_subparsers(dest="cmd", required=True)

    for name, fn, hlp in [
        ("authors", cmd_authors, "authors sub-graph from a CSV of QIDs"),
        ("works", cmd_works, "works sub-graph from a CSV of QIDs"),
        ("relations", cmd_relations, "relations sub-graph from a CSV of QIDs"),
    ]:
        sp = sub.add_parser(name, help=hlp)
        sp.add_argument("--input", required=True, help="CSV of QIDs")
        sp.add_argument("--output", required=True, help=".ttl or parquet dir")
        sp.set_defaults(fn=fn)

    sp = sub.add_parser("merge", help="merge stage triple tables into one")
    sp.add_argument("--authors")
    sp.add_argument("--works")
    sp.add_argument("--relations")
    sp.add_argument("--output", required=True)
    sp.set_defaults(fn=cmd_merge)

    sp = sub.add_parser("map-align",
                        help="external IDs + SKOS alignments post-pass")
    sp.add_argument("--input", required=True, help="triple table (parquet)")
    sp.add_argument("--output", required=True)
    sp.set_defaults(fn=cmd_map_align)

    sp = sub.add_parser("pipeline",
                        help="end-to-end interleaved-corpus KG pipeline")
    sp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    sp.add_argument("--output", required=True)
    sp.add_argument("--checkpoint-dir")
    sp.set_defaults(fn=cmd_pipeline)

    sp = sub.add_parser("validate", help="SHACL-derived validation")
    sp.add_argument("--input", required=True, help="triple table (parquet)")
    sp.add_argument("--shapes", required=True,
                    choices=["authors", "works", "relations"])
    sp.set_defaults(fn=cmd_validate)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
