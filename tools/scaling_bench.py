"""Scaling-efficiency benchmark (BASELINE.json north_rule).

Sandbox proxy for the N→4N executor criterion: the SAME pipeline + input
runs at two parallelism-level pairs — local[4]→local[16] and
local[8]→local[32] — in fresh JVMs. Throughput = emitted triples /
end-to-end wall-clock; per-stage exec seconds are reported so the
fixed-cost share (driver-side plan construction, dimension-sized fixpoint
loops) is visible. Determinism is verified with an order-independent
distributed digest over the full 6-tuple triple set (count + sum of
per-row xxhash64 — no driver-side collect, so it works at any scale);
both runs must produce the identical digest.

The 8→32 pair saturates this machine's 32 hardware threads and shared
memory bandwidth, so it UNDER-reports cluster scaling; the 4→16 pair
leaves headroom and is the better proxy for adding executors. Both are
reported.

Usage: python tools/scaling_bench.py [sf_dir] [runs] [world_scale] [levels] [shuffle]
       levels: comma-separated level specs, default "4,16,8,32".
         A plain int N runs local[N] (threads share the driver JVM).
         "NxC" runs local-cluster[N,C,mem] — N SEPARATE executor JVMs
         with C cores each (mem from $SPARK_GRAFT_EXEC_MEM, default 10g)
         plus an isolated driver JVM: the faithful N→4N-executor
         protocol, free of the shared-JVM/GC/heap artifact of local[N].
       shuffle: fixed shuffle-partition count for ALL levels (default:
       partitions = cores per level). A constant partition count is the
       cluster-faithful protocol — adding executors does not re-plan the
       query — and AQE coalesces the excess at low parallelism.
"""

from __future__ import annotations

import json
import subprocess
import sys
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from wikidata_to_cidoc_crm_spark.session import get_spark
from wikidata_to_cidoc_crm_spark.pipeline import run_pipeline

level = sys.argv[1]; sf_dir = sys.argv[2]; runs = int(sys.argv[3])
world_scale = int(sys.argv[4])
if "x" in level:
    n_exec, exec_cores = (int(v) for v in level.split("x"))
    cores = n_exec * exec_cores
    raw_mem = str({exec_mem!r}).strip().lower()
    if raw_mem.endswith("g"):
        mem_mb = 1024 * int(raw_mem[:-1])
    elif raw_mem.endswith("m"):
        mem_mb = int(raw_mem[:-1])
    elif raw_mem.isdigit():  # bare number = megabytes (local-cluster unit)
        mem_mb = int(raw_mem)
    else:
        raise ValueError(
            f"SPARK_GRAFT_EXEC_MEM={{raw_mem!r}}: expected <n>g, <n>m, or "
            "a bare megabyte count (e.g. 10g, 10240m, 10240)")
    master = f"local-cluster[{{n_exec}},{{exec_cores}},{{mem_mb}}]"
else:
    cores = int(level)
    master = None
shuffle = int(sys.argv[5]) if len(sys.argv) > 5 and int(sys.argv[5]) else cores
spark = get_spark(f"scaling-{{level}}", cores=cores, shuffle_partitions=shuffle,
                  master=master)
results = []
digest = None
for i in range(runs + 1):  # first run is warm-up (discarded)
    t0 = time.time()
    df = run_pipeline(spark, sf_dir, check_invariant=False,
                      world_scale=world_scale)
    # order-independent set digest, computed distributed (no collect)
    h = df.select(F.xxhash64("subj", "pred", "obj", "obj_is_iri",
                             "lang", "dtype").alias("h")) \
          .agg(F.count("*").alias("n"),
               F.sum(F.col("h").cast("decimal(38,0)")).alias("hsum"),
               F.sum(F.pmod(F.col("h"), F.lit(1000003))).alias("hmod")) \
          .collect()[0]
    df._pipeline_runner.wait()  # background stage-exec threads (pipelined runner)
    total_sec = time.time() - t0
    digest = f'{{h["hsum"]}}_{{h["hmod"]}}_{{h["n"]}}'
    exec_sec = sum(m.get("exec_sec", 0.0) + m.get("exec_embedded_sec", 0.0)
                   for m in df._pipeline_metrics)
    plan_sec = sum(m.get("plan_sec", 0.0) for m in df._pipeline_metrics)
    results.append({{"total_sec": total_sec, "exec_sec": exec_sec,
                     "plan_sec": plan_sec, "triples": h["n"],
                     "stages": [{{"stage": m["stage"],
                                  "exec": round(m.get("exec_sec", 0.0)
                                                + m.get("exec_embedded_sec", 0.0), 2),
                                  "plan": m.get("plan_sec")}}
                                for m in df._pipeline_metrics]}})
timed = results[1:]
best = min(range(len(timed)), key=lambda i: timed[i]["total_sec"])
print(json.dumps({{
    "level": level,
    "cores": cores,
    "triples": results[-1]["triples"],
    "total_sec": [round(r["total_sec"], 2) for r in timed],
    "exec_sec": [round(r["exec_sec"], 2) for r in timed],
    "plan_sec": [round(r["plan_sec"], 2) for r in timed],
    "stages": timed[best]["stages"],
    "hash": digest,
}}))
"""


def run_level(level: str, sf_dir: str, runs: int, world_scale: int,
              shuffle: int = 0) -> dict:
    exec_mem = os.environ.get("SPARK_GRAFT_EXEC_MEM", "10g")
    # protocol (BENCH/BASELINE.md): tmpfs shuffle scratch — removes the
    # shared-single-disk sandbox artifact; opt-in is explicit per session
    env = {**os.environ, "SPARK_GRAFT_TMPFS_SCRATCH":
           os.environ.get("SPARK_GRAFT_TMPFS_SCRATCH", "1")}
    out = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=REPO, exec_mem=exec_mem),
         level, sf_dir, str(runs), str(world_scale), str(shuffle)],
        capture_output=True, text=True, timeout=5400, env=env,
    )
    lines = out.stdout.strip().splitlines()
    if not lines:
        raise RuntimeError(f"level {level} produced no output:\n{out.stderr[-4000:]}")
    return json.loads(lines[-1])


def _total_cores(level: str) -> int:
    if "x" in level:
        n, c = level.split("x")
        return int(n) * int(c)
    return int(level)


def _label(level: str) -> str:
    if "x" in level:
        n, c = level.split("x")
        return f"local-cluster[{n} execs × {c} cores]"
    return f"local[{level}]"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    world_scale = int(sys.argv[3]) if len(sys.argv) > 3 else 400
    level_list = tuple(sys.argv[4].split(",")) \
        if len(sys.argv) > 4 else ("4", "16", "8", "32")
    shuffle = int(sys.argv[5]) if len(sys.argv) > 5 else 0
    levels = {}
    for lv in level_list:
        levels[lv] = run_level(lv, sf_dir, runs, world_scale, shuffle)
        print(f"{_label(lv)}: "
              f"total={levels[lv]['total_sec']} "
              f"triples={levels[lv]['triples']} hash={levels[lv]['hash'][:24]}…")

    def tput(lv):
        return levels[lv]["triples"] / min(levels[lv]["total_sec"])

    # pair levels whose total core count differs by exactly 4x AND that use
    # the same mode (both local[] or both local-cluster executor counts)
    effs = {}
    for lo in level_list:
        for hi in level_list:
            if ("x" in lo) == ("x" in hi) and \
                    _total_cores(hi) == 4 * _total_cores(lo):
                effs[(lo, hi)] = tput(hi) / (4 * tput(lo))
    hashes = {levels[lv]["hash"] for lv in levels}
    same = len(hashes) == 1
    print("throughput t/s: " + " ".join(
        f"{lv}={tput(lv):.0f}" for lv in level_list))
    print("efficiency " + "  ".join(
        f"{a}->{b}: {e:.2f}" for (a, b), e in effs.items())
        + f"  deterministic={same}")

    by_stage: dict[str, dict[str, float]] = {}
    for lv in level_list:
        for s in levels[lv]["stages"]:
            by_stage.setdefault(s["stage"], {})[lv] = s["exec"]
    stage_md = ("| stage | " + " | ".join(f"exec@{lv}" for lv in level_list)
                + " |\n|" + "---|" * (len(level_list) + 1) + "\n")
    for st, per in by_stage.items():
        stage_md += ("| " + st + " | "
                     + " | ".join(f"{per.get(lv)}" for lv in level_list)
                     + " |\n")

    level_md = "".join(
        f"| {_label(lv)} | {levels[lv]['triples']} | {levels[lv]['total_sec']} "
        f"| {tput(lv):.0f} |\n" for lv in level_list)
    eff_md = "; ".join(f"{a}→{b} = {e:.2f}" for (a, b), e in effs.items())

    md = f"""# BENCH — scaling efficiency (north rule evidence)

Sandbox proxy for the N→4N executor criterion (no real cluster available):
the identical KG pipeline + input ran at multiple parallelism levels in
fresh JVMs (warm-up run discarded, best of {runs} timed run(s),
world_scale={world_scale}, input `{sf_dir}`). Throughput = emitted
triples / end-to-end wall-clock.

| level | triples | total sec (all runs) | triples/sec (best) |
|---|---|---|---|
{level_md}
**Scaling efficiency: {eff_md}** (target ≥ 0.8 on a real cluster).

Determinism: order-independent triple-set digest (count + Σ xxhash64 over
the full 6-tuple, computed distributed) identical across ALL measured
parallelism levels: **{same}** (`{levels[level_list[0]]['hash'][:32]}…`).

Per-stage exec seconds (best run):

{stage_md}
Interpretation. `local-cluster[N execs × C cores]` levels run N SEPARATE
executor JVMs plus an isolated driver JVM on this box — the faithful
N→4N-executor protocol (each executor has its own heap and GC; the
driver's plan-construction work overlaps instead of contending), limited
only by the single machine's shared memory bandwidth and one shuffle
disk, both of which a real cluster scales with executor count. `local[N]`
levels share ONE JVM between driver and all executor threads and
therefore under-report cluster scaling. The remaining gap to 1.0 is fixed
per-stage cost that does not grow with data (driver-side plan
construction for the ~90-rule DAG, dimension-sized canonicalization
fixpoints of a few seconds per round) and amortizes away at 100 TB where
stage exec is hours, not tens of seconds.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print("wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
