"""cProfile one mapping stage's plan construction in isolation.

Usage: python tools/stage_profile.py [relations|works|authors|align] [world_scale]
"""

from __future__ import annotations

import cProfile
import io
import pstats
import sys
import time

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wikidata_to_cidoc_crm_spark.session import get_spark  # noqa: E402


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "relations"
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark("stage-profile", cores=32, shuffle_partitions=32)

    from wikidata_to_cidoc_crm_spark.fixtures import (
        interleaved_corpus, make_world_scaled, world_to_spark)
    from wikidata_to_cidoc_crm_spark.linking import detect_mentions, linked_qids

    t0 = time.time()
    world = make_world_scaled(scale)
    t_world = time.time() - t0
    t0 = time.time()
    dims = world_to_spark(spark, world)
    t_dims = time.time() - t0
    for name in ("wd_statements", "wd_labels", "wd_subclass_closure",
                 "wd_property_closure", "wd_entities"):
        dims[name].cache()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    t0 = time.time()
    corpus = interleaved_corpus(
        spark, os.path.join(sf_dir, "documents.parquet"),
        dims["wd_entities"], mentions_per_doc=3).localCheckpoint(eager=True)
    t_corpus = time.time() - t0
    t0 = time.time()
    mentions = detect_mentions(spark, corpus.select("doc_id", "spans"),
                               dims["wd_entities"]).localCheckpoint(eager=True)
    t_mentions = time.time() - t0
    persons = linked_qids(mentions, dims["wd_entities"], "person").localCheckpoint(eager=True)
    works_q = linked_qids(mentions, dims["wd_entities"], "work").localCheckpoint(eager=True)
    print(f"setup: world={t_world:.2f} dims={t_dims:.2f} corpus={t_corpus:.2f} "
          f"mentions={t_mentions:.2f}")

    if which == "relations":
        from wikidata_to_cidoc_crm_spark.plans.relations import relations_stage
        build = lambda: relations_stage(  # noqa: E731
            spark, works_q, dims["wd_statements"], dims["wd_labels"],
            dims["wd_subclass_closure"], dims["wd_property_closure"],
            dedupe=True, broadcast_labels=True)
    elif which == "works":
        from wikidata_to_cidoc_crm_spark.plans.works import works_stage
        build = lambda: works_stage(  # noqa: E731
            spark, works_q, dims["wd_statements"], dims["wd_labels"],
            dedupe=True, broadcast_labels=True)
    elif which == "authors":
        from wikidata_to_cidoc_crm_spark.plans.authors import authors_stage
        build = lambda: authors_stage(  # noqa: E731
            spark, persons, dims["wd_statements"], dims["wd_labels"],
            dedupe=True, broadcast_labels=True)
    else:
        raise SystemExit(f"unknown stage {which}")

    prof = cProfile.Profile()
    t0 = time.time()
    prof.enable()
    df = build()
    df = df.localCheckpoint(eager=False)
    prof.disable()
    t_plan = time.time() - t0
    t0 = time.time()
    n = df.count()
    t_exec = time.time() - t0
    print(f"{which}: plan={t_plan:.2f}s exec={t_exec:.2f}s rows={n}")

    s = io.StringIO()
    stats = pstats.Stats(prof, stream=s)
    stats.sort_stats("cumulative")
    stats.print_stats(30)
    stats.sort_stats("tottime")
    stats.print_stats(20)
    print(s.getvalue())


if __name__ == "__main__":
    main()
