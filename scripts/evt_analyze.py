"""Analyze a Spark event log: per-stage wall time, task concurrency, and the
idle budget (stage gaps vs in-stage straggling vs per-task overheads)."""

import json
import sys
from collections import defaultdict


def main(path):
    stages = {}
    tasks = defaultdict(list)
    app_start = app_end = None
    for line in open(path):
        try:
            e = json.loads(line)
        except json.JSONDecodeError:
            continue
        ev = e.get("Event")
        if ev == "SparkListenerApplicationStart":
            app_start = e["Timestamp"]
        elif ev == "SparkListenerApplicationEnd":
            app_end = e["Timestamp"]
        elif ev == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            stages[si["Stage ID"]] = {
                "name": si["Stage Name"].split("\n")[0][:60],
                "submit": si.get("Submission Time"),
                "complete": si.get("Completion Time"),
                "ntasks": si["Number of Tasks"],
            }
        elif ev == "SparkListenerTaskEnd":
            ti = e["Task Info"]
            tm = e.get("Task Metrics") or {}
            sw = (tm.get("Shuffle Write Metrics") or {})
            tasks[e["Stage ID"]].append(
                {
                    "launch": ti["Launch Time"],
                    "finish": ti["Finish Time"],
                    "run": tm.get("Executor Run Time", 0),
                    "cpu": tm.get("Executor CPU Time", 0) / 1e6,
                    "gc": tm.get("JVM GC Time", 0),
                    "deser": tm.get("Executor Deserialize Time", 0),
                    "result_ser": tm.get("Result Serialization Time", 0),
                    "shuffle_write_ms": sw.get("Shuffle Write Time", 0) / 1e6,
                    "fetch_wait": (tm.get("Shuffle Read Metrics") or {}).get(
                        "Fetch Wait Time", 0
                    ),
                }
            )

    total_stage_wall = 0
    rows = []
    for sid in sorted(stages):
        s = stages[sid]
        ts = tasks.get(sid, [])
        if not ts or s["submit"] is None:
            continue
        wall = (s["complete"] - s["submit"]) / 1000
        total_stage_wall += wall
        sum_run = sum(t["run"] for t in ts) / 1000
        sum_cpu = sum(t["cpu"] for t in ts) / 1000
        sum_gc = sum(t["gc"] for t in ts) / 1000
        sum_deser = sum(t["deser"] for t in ts) / 1000
        sum_sw = sum(t["shuffle_write_ms"] for t in ts) / 1000
        sum_fw = sum(t["fetch_wait"] for t in ts) / 1000
        durs = sorted((t["finish"] - t["launch"]) / 1000 for t in ts)
        rows.append(
            (wall, f"stage {sid} n={len(ts)} wall={wall:7.2f}s  run_sum={sum_run:7.1f}s "
             f"cpu_sum={sum_cpu:7.1f}s gc={sum_gc:5.1f}s deser={sum_deser:5.1f}s "
             f"shufw={sum_sw:5.1f}s fetchwait={sum_fw:5.1f}s "
             f"task[p50={durs[len(durs)//2]:.2f} max={durs[-1]:.2f}]  {stages[sid]['name']}")
        )
    for _, r in sorted(rows, reverse=True)[:14]:
        print(r)
    if app_start and app_end:
        print(f"app wall: {(app_end - app_start) / 1000:.1f}s; sum stage wall: {total_stage_wall:.1f}s")


if __name__ == "__main__":
    main(sys.argv[1])
