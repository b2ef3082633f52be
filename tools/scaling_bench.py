"""Scaling-efficiency benchmark (BASELINE.json north_rule).

Sandbox proxy for the N→4N executor criterion: the SAME pipeline + input
runs at local[8] and local[32] (one subprocess each, fresh JVM), measuring
the *executed-stage* wall-clock (BASELINE.md protocol: plan construction is
driver-side fixed cost, reported separately). Prints a summary and writes
BENCH/BASELINE.md. Also verifies determinism: both runs must produce the
identical sorted triple-set hash.

Usage: python tools/scaling_bench.py [sf_dir] [runs]
"""

from __future__ import annotations

import json
import subprocess
import sys
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import hashlib, json, os, sys, time
sys.path.insert(0, {repo!r})
from wikidata_to_cidoc_crm_spark.session import get_spark
from wikidata_to_cidoc_crm_spark.pipeline import run_pipeline

cores = int(sys.argv[1]); sf_dir = sys.argv[2]; runs = int(sys.argv[3])
world_scale = int(sys.argv[4])
spark = get_spark(f"scaling-{{cores}}", cores=cores, shuffle_partitions=cores)
results = []
for i in range(runs + 1):  # first run is warm-up (discarded)
    t0 = time.time()
    df = run_pipeline(spark, sf_dir, check_invariant=False,
                      world_scale=world_scale)
    n = df.count()
    total_sec = time.time() - t0
    exec_sec = sum(m.get("exec_sec", 0.0) for m in df._pipeline_metrics)
    plan_sec = sum(m.get("plan_sec", 0.0) for m in df._pipeline_metrics)
    results.append({{"total_sec": total_sec, "exec_sec": exec_sec,
                     "plan_sec": plan_sec, "triples": n}})
# determinism hash over the sorted triple set
rows = df.select("subj", "pred", "obj", "lang", "dtype").collect()
lines = sorted("\x1f".join("" if v is None else str(v) for v in r) for r in rows)
h = hashlib.sha256("\n".join(lines).encode()).hexdigest()
timed = results[1:]
print(json.dumps({{
    "cores": cores,
    "triples": results[-1]["triples"],
    "total_sec": [round(r["total_sec"], 2) for r in timed],
    "exec_sec": [round(r["exec_sec"], 2) for r in timed],
    "plan_sec": [round(r["plan_sec"], 2) for r in timed],
    "hash": h,
}}))
"""


def run_level(cores: int, sf_dir: str, runs: int, world_scale: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=REPO), str(cores), sf_dir,
         str(runs), str(world_scale)],
        capture_output=True, text=True, timeout=5400,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    world_scale = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    levels = {}
    for cores in (8, 32):
        levels[cores] = run_level(cores, sf_dir, runs, world_scale)
        print(f"local[{cores}]: {levels[cores]}")

    n8 = levels[8]["triples"]
    e8, e32 = min(levels[8]["exec_sec"]), min(levels[32]["exec_sec"])
    t8, t32 = min(levels[8]["total_sec"]), min(levels[32]["total_sec"])
    tput8, tput32 = n8 / e8, levels[32]["triples"] / e32
    eff = tput32 / (4 * tput8)
    wall_eff = (levels[32]["triples"] / t32) / (4 * (n8 / t8))
    same = levels[8]["hash"] == levels[32]["hash"]
    print(f"exec throughput local[8]={tput8:.1f}/s local[32]={tput32:.1f}/s "
          f"efficiency={eff:.2f} (wall-incl-fixed: {wall_eff:.2f}) "
          f"deterministic={same}")

    md = f"""# BENCH — scaling efficiency (north rule evidence)

Sandbox proxy for the N→4N executor criterion (no real cluster available):
the identical KG pipeline + input ran at `local[8]` and `local[32]`
(separate JVMs, shuffle partitions = cores, warm-up run discarded, best of
{runs} timed run(s), world_scale={world_scale}). Per the BASELINE.md
measurement protocol, throughput = emitted triples / wall-clock of the
**executed stages** (corpus gen, linking, mapping, merge, align — the work
that scales with data); driver-side plan construction is a fixed cost
independent of both data volume and core count, reported separately.

| level | triples | stage-exec sec | plan sec (fixed) | total sec | triples/sec (exec) |
|---|---|---|---|---|---|
| local[8]  | {n8} | {e8:.2f} | {min(levels[8]['plan_sec']):.2f} | {t8:.2f} | {tput8:.1f} |
| local[32] | {levels[32]['triples']} | {e32:.2f} | {min(levels[32]['plan_sec']):.2f} | {t32:.2f} | {tput32:.1f} |

**Scaling efficiency (exec throughput32 / (4 × exec throughput8)) = {eff:.2f}**
(wall-clock-including-fixed-cost efficiency: {wall_eff:.2f})

Determinism: sorted-triple-set sha256 identical across parallelism levels:
**{same}** (`{levels[8]['hash'][:16]}…`).

Input: `{sf_dir}`. All values: local[8] exec={levels[8]['exec_sec']},
total={levels[8]['total_sec']}; local[32] exec={levels[32]['exec_sec']},
total={levels[32]['total_sec']}.

Interpretation: the fixed cost is ~1–2 min of Catalyst/py4j plan
construction for a ~90-rule, 7-stage DAG — it does not grow with data and
amortizes to nothing at 100 TB. The executed stages are shuffle/join work
that scales with cores; a single shared-memory machine still under-reports
cluster scaling (shared shuffle disk, one JVM heap, memory-bandwidth
contention at 32 threads).
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print("wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
