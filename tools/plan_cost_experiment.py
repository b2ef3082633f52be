"""A/B the driver-side plan-cost levers on the relations stage build.

Configs tried (cumulative):
  base        — current session defaults
  nodbg       — spark.python.sql.dataFrameDebugging.enabled=false
  noconstr    — + spark.sql.constraintPropagation.enabled=false

Each config builds the relations stage plan (including its
localCheckpoint(eager=False) sites) N times and reports wall seconds.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wikidata_to_cidoc_crm_spark.session import get_spark  # noqa: E402


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("plan-cost", cores=32, shuffle_partitions=32)

    from wikidata_to_cidoc_crm_spark.fixtures import (
        interleaved_corpus, make_world_scaled, world_to_spark)
    from wikidata_to_cidoc_crm_spark.linking import detect_mentions, linked_qids
    from wikidata_to_cidoc_crm_spark.plans.relations import relations_stage

    world = make_world_scaled(20)
    dims = world_to_spark(spark, world)
    for name in ("wd_statements", "wd_labels", "wd_subclass_closure",
                 "wd_property_closure", "wd_entities"):
        dims[name].cache()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    corpus = interleaved_corpus(
        spark, os.path.join(sf_dir, "documents.parquet"),
        dims["wd_entities"], mentions_per_doc=3).localCheckpoint(eager=True)
    mentions = detect_mentions(spark, corpus.select("doc_id", "spans"),
                               dims["wd_entities"]).localCheckpoint(eager=True)
    works_q = linked_qids(mentions, dims["wd_entities"], "work").localCheckpoint(eager=True)

    def build_once():
        t0 = time.time()
        df = relations_stage(
            spark, works_q, dims["wd_statements"], dims["wd_labels"],
            dims["wd_subclass_closure"], dims["wd_property_closure"],
            dedupe=True, broadcast_labels=True).localCheckpoint(eager=False)
        dt = time.time() - t0
        return df, dt

    import pyspark.errors.utils as perr

    def set_config(name):
        # dataFrameDebugging is a STATIC conf — toggle only the Python-side
        # cache here (it gates both the inspect stack walk and the extra
        # origin.set py4j call); production disables it at session build
        if name == "base":
            perr._enable_debugging_cache = True
            spark.conf.set("spark.sql.constraintPropagation.enabled", "true")
        elif name == "nodbg":
            perr._enable_debugging_cache = False
            spark.conf.set("spark.sql.constraintPropagation.enabled", "true")
        elif name == "noconstr":
            perr._enable_debugging_cache = False
            spark.conf.set("spark.sql.constraintPropagation.enabled", "false")

    # warm-up (JIT, class loading)
    df, dt = build_once()
    n0 = df.count()
    print(f"warmup: {dt:.2f}s rows={n0}")

    for name in ("base", "nodbg", "noconstr", "base"):
        set_config(name)
        times = []
        for _ in range(runs):
            df, dt = build_once()
            times.append(dt)
        n = df.count()
        assert n == n0, f"row count changed under {name}: {n} != {n0}"
        print(f"{name}: {[round(t,2) for t in times]} rows={n}")


if __name__ == "__main__":
    main()
