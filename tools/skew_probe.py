"""Hub-subject skew probe for the merge stage (VERDICT r2 'What's missing' #4).

merge_stage funnels dedup + label window through one repartition(subj)
exchange — fast, but a hub subject puts all its distinct triples on one
reducer. This probe measures both strategies on two fixtures:

* uniform: N triples over N/8 subjects (the common case), and
* skewed:  the same, plus ONE hub subject carrying `hub` distinct triples
  (distinct objs under a handful of predicates — the worst case for a
  subj-keyed exchange, uniform for the full-key exchange).

Usage: python tools/skew_probe.py [n_uniform] [hub] [cores]
Prints per-strategy wall seconds and asserts identical outputs (count +
order-independent digest). Record the outcome in BENCH/SKEW.md.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from wikidata_to_cidoc_crm_spark.session import get_spark  # noqa: E402
from wikidata_to_cidoc_crm_spark.plans.merge import merge_stage  # noqa: E402


def make_graph(spark, n_uniform: int, hub: int):
    uni = spark.range(n_uniform).select(
        F.concat(F.lit("s/"), (F.col("id") % (n_uniform // 8)).cast("string")).alias("subj"),
        F.concat(F.lit("p/"), (F.col("id") % 13).cast("string")).alias("pred"),
        F.concat(F.lit("o/"), F.col("id").cast("string")).alias("obj"),
        F.lit(True).alias("obj_is_iri"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(None).cast("string").alias("dtype"),
    )
    if hub == 0:
        return uni
    hubdf = spark.range(hub).select(
        F.lit("s/HUB").alias("subj"),
        F.concat(F.lit("p/"), (F.col("id") % 5).cast("string")).alias("pred"),
        F.concat(F.lit("o/h"), F.col("id").cast("string")).alias("obj"),
        F.lit(True).alias("obj_is_iri"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(None).cast("string").alias("dtype"),
    )
    return uni.unionByName(hubdf)


def digest(df):
    r = df.select(F.xxhash64("subj", "pred", "obj", "obj_is_iri",
                             "lang", "dtype").alias("h")) \
          .agg(F.count("*").alias("n"),
               F.sum(F.col("h").cast("decimal(38,0)")).alias("s")).collect()[0]
    return (r["n"], str(r["s"]))


def main() -> None:
    n_uniform = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    hub = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    spark = get_spark("skew-probe", cores=cores, shuffle_partitions=cores)

    for fixture, h in (("uniform", 0), ("skewed", hub)):
        g = make_graph(spark, n_uniform, h).localCheckpoint(eager=True)
        out = {}
        for strategy in ("subj-exchange", "full-key"):
            # warm-up + 2 timed runs, best-of (VM noise)
            walls = []
            for i in range(3):
                t0 = time.time()
                d = digest(merge_stage(spark, [g], strategy=strategy))
                walls.append(time.time() - t0)
            out[strategy] = (d, min(walls[1:]))
            print(f"{fixture:8s} {strategy:13s} best={min(walls[1:]):6.2f}s "
                  f"all={[round(w, 2) for w in walls]} digest={d[0]}")
        assert out["subj-exchange"][0] == out["full-key"][0], \
            f"strategy outputs differ on {fixture}: {out}"
    print("outputs identical across strategies on both fixtures")


if __name__ == "__main__":
    main()
