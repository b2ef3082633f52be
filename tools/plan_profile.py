"""Profile driver-side plan-construction cost of the KG pipeline.

Runs run_pipeline at $SPARK_GRAFT_SF_DIR and prints per-stage
plan_sec/exec_sec from runner.metrics plus coarse phase timers, so the
46s fixed driver cost (VERDICT r3 item 1) can be attributed to concrete
sites (localCheckpoint planning, the canonicalize CC fixpoint, py4j).

Usage: python tools/plan_profile.py [sf_dir] [--cprofile]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wikidata_to_cidoc_crm_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("plan-profile", cores=cores, shuffle_partitions=cores)

    from wikidata_to_cidoc_crm_spark.pipeline import run_pipeline

    use_cprofile = "--cprofile" in sys.argv
    t0 = time.time()
    if use_cprofile:
        import cProfile
        import pstats
        prof = cProfile.Profile()
        prof.enable()
    out = run_pipeline(spark, sf_dir, check_invariant=False)
    plan_wall = time.time() - t0
    if use_cprofile:
        prof.disable()
    t0 = time.time()
    n = out.count()
    count_sec = time.time() - t0
    out._pipeline_runner.wait()

    print(json.dumps({
        "plan_wall": round(plan_wall, 2),
        "count_sec": round(count_sec, 2),
        "triples": n,
        "stages": out._pipeline_metrics,
    }, indent=1))
    if use_cprofile:
        stats = pstats.Stats(prof)
        stats.sort_stats("cumulative")
        stats.print_stats(40)


if __name__ == "__main__":
    main()
