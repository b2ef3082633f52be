"""Aggregate Spark event-log task metrics to attribute scaling overhead.

Usage: python tools/evlog_analyze.py <eventlog-file> [...]

For each application event log, sums SparkListenerTaskEnd metrics across
all tasks: wall (executor run time), CPU, GC, task deserialize, result
serialization, shuffle fetch wait, shuffle write time, local/remote
shuffle bytes. Used to decompose the 1-executor → 4-executor core-second
inflation observed in the scaling bench into real work vs cross-JVM
overhead (serialization, remote fetch, GC) — measure, don't guess.
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def analyze(path: str) -> None:
    tot = defaultdict(float)
    per_stage = defaultdict(lambda: defaultdict(float))
    stage_names: dict[int, str] = {}
    app = path.rsplit("/", 1)[-1]
    with open(path, errors="replace") as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            et = ev.get("Event")
            if et == "SparkListenerStageSubmitted":
                si = ev["Stage Info"]
                stage_names[si["Stage ID"]] = si.get("Stage Name", "")
            elif et == "SparkListenerTaskEnd":
                m = ev.get("Task Metrics") or {}
                sid = ev.get("Stage ID", -1)
                row = {
                    "tasks": 1,
                    "run_s": m.get("Executor Run Time", 0) / 1e3,
                    "cpu_s": m.get("Executor CPU Time", 0) / 1e9,
                    "gc_s": m.get("JVM GC Time", 0) / 1e3,
                    "deser_s": m.get("Executor Deserialize Time", 0) / 1e3,
                    "result_ser_s": m.get("Result Serialization Time", 0) / 1e3,
                }
                sr = m.get("Shuffle Read Metrics") or {}
                sw = m.get("Shuffle Write Metrics") or {}
                row["fetch_wait_s"] = sr.get("Fetch Wait Time", 0) / 1e3
                row["remote_mb"] = sr.get("Remote Bytes Read", 0) / 1e6
                row["local_mb"] = sr.get("Local Bytes Read", 0) / 1e6
                row["shuf_write_s"] = sw.get("Shuffle Write Time", 0) / 1e9
                row["shuf_write_mb"] = sw.get("Shuffle Bytes Written", 0) / 1e6
                for k, v in row.items():
                    tot[k] += v
                    per_stage[sid][k] += v
    print(f"== {app}")
    print("  " + " ".join(f"{k}={tot[k]:,.1f}" for k in (
        "tasks", "run_s", "cpu_s", "gc_s", "deser_s", "result_ser_s",
        "fetch_wait_s", "shuf_write_s", "remote_mb", "local_mb",
        "shuf_write_mb")))
    top = sorted(per_stage.items(), key=lambda kv: -kv[1]["run_s"])[:12]
    for sid, m in top:
        name = stage_names.get(sid, "?")[:60]
        print(f"  stage {sid:4d} run={m['run_s']:7.1f}s cpu={m['cpu_s']:7.1f}s "
              f"gc={m['gc_s']:5.1f}s deser={m['deser_s']:5.1f}s "
              f"fetchw={m['fetch_wait_s']:5.1f}s rem={m['remote_mb']:6.0f}MB "
              f"| {name}")


if __name__ == "__main__":
    for p in sys.argv[1:]:
        analyze(p)
