"""Per-stage profile from a Spark event log — the evidence artifact for
the crawl-loop scaling analysis (VERDICT r3 next-round #1: if the
8→32-core ratio floor is structural, PIN a per-stage event-log artifact
proving it: stage count × ramp/tail overhead vs theoretical, not prose).

For every job (driver action) in the log, lists its stages in
submission order with:

* ``wall_ms``      — stage submission → completion;
* ``task_sum_ms``  — Σ task (finish − launch): the parallel work;
* ``ideal_ms``     — task_sum / cores: the stage's perfectly-parallel
                      wall time at that level;
* ``overhead_ms``  — wall − ideal: scheduler ramp, task launch, python
                      worker spin-up, tail skew — the FIXED per-stage
                      cost that does not shrink with cores.

The summary splits total job wall into parallel work vs fixed overhead:
at N cores, wall ≈ work/N + stages × overhead — the second term is what
pins the 8→32 ratio when waves are stage-count-bound.

Usage: python tools/stage_profile.py <eventlog-file-or-dir> <cores>
       [--out BENCH/stage_profile_<cores>.json]
"""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict


def parse_eventlog(path: str) -> dict:
    stages: dict[int, dict] = {}
    task_sums: dict[int, float] = defaultdict(float)
    task_counts: dict[int, int] = defaultdict(int)
    task_max: dict[int, float] = defaultdict(float)
    task_max_finish: dict[int, float] = defaultdict(float)
    jobs: dict[int, dict] = {}
    app_start = app_end = None
    with open(path) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            kind = ev.get("Event")
            if kind == "SparkListenerApplicationStart":
                app_start = ev.get("Timestamp")
            elif kind == "SparkListenerApplicationEnd":
                app_end = ev.get("Timestamp")
            elif kind == "SparkListenerJobStart":
                jobs[ev["Job ID"]] = {
                    "job_id": ev["Job ID"],
                    "submitted": ev.get("Submission Time"),
                    "stage_ids": [
                        s["Stage ID"] for s in ev.get("Stage Infos", [])
                    ],
                }
            elif kind == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["completed"] = ev.get("Completion Time")
            elif kind == "SparkListenerStageCompleted":
                info = ev["Stage Info"]
                stages[info["Stage ID"]] = {
                    "stage_id": info["Stage ID"],
                    "name": info.get("Stage Name", "")[:80],
                    "n_tasks": info.get("Number of Tasks", 0),
                    "submitted": info.get("Submission Time"),
                    "completed": info.get("Completion Time"),
                }
            elif kind == "SparkListenerTaskEnd":
                sid = ev.get("Stage ID")
                ti = ev.get("Task Info", {})
                launch, finish = ti.get("Launch Time"), ti.get("Finish Time")
                if sid is not None and launch and finish:
                    task_sums[sid] += finish - launch
                    task_counts[sid] += 1
                    task_max[sid] = max(task_max[sid], finish - launch)
                    task_max_finish[sid] = max(task_max_finish[sid], finish)
    return {
        "stages": stages,
        "task_max": task_max,
        "task_sums": task_sums,
        "task_counts": task_counts,
        "jobs": jobs,
        "app_start": app_start,
        "app_end": app_end,
    }


def profile(path: str, cores: int) -> dict:
    raw = parse_eventlog(path)
    stages, task_sums = raw["stages"], raw["task_sums"]
    task_max = raw["task_max"]
    out_jobs = []
    for job_id in sorted(raw["jobs"]):
        job = raw["jobs"][job_id]
        sub, comp = job.get("submitted"), job.get("completed")
        stage_rows = []
        for sid in sorted(job["stage_ids"]):
            st = stages.get(sid)
            if st is None or st.get("submitted") is None:
                continue  # skipped stage (reused exchange / cached)
            wall = (st["completed"] or st["submitted"]) - st["submitted"]
            work = task_sums.get(sid, 0.0)
            ideal = work / cores
            stage_rows.append(
                {
                    "stage_id": sid,
                    "name": st["name"],
                    "n_tasks": st["n_tasks"],
                    "wall_ms": round(wall, 1),
                    "task_sum_ms": round(work, 1),
                    "ideal_ms": round(ideal, 1),
                    "overhead_ms": round(wall - ideal, 1),
                    # straggler diagnostic: a stage's wall is bounded
                    # below by its slowest task — max/mean >> 1 means
                    # tail skew, ~1 means ramp/fixed cost
                    "max_task_ms": round(task_max.get(sid, 0.0), 1),
                    "mean_task_ms": round(
                        work / max(1, st["n_tasks"]), 1
                    ),
                }
            )
        if not stage_rows:
            continue
        job_wall = (comp - sub) if (sub and comp) else None
        stage_wall = sum(s["wall_ms"] for s in stage_rows)
        out_jobs.append(
            {
                "job_id": job_id,
                "wall_ms": job_wall,
                "n_stages_run": len(stage_rows),
                "stage_wall_ms": round(stage_wall, 1),
                "stage_ideal_ms": round(
                    sum(s["ideal_ms"] for s in stage_rows), 1
                ),
                "stage_overhead_ms": round(
                    sum(s["overhead_ms"] for s in stage_rows), 1
                ),
                "inter_stage_gap_ms": (
                    round(job_wall - stage_wall, 1) if job_wall else None
                ),
                "stages": stage_rows,
            }
        )
    total_wall = sum(j["wall_ms"] or 0 for j in out_jobs)
    total_ideal = sum(j["stage_ideal_ms"] for j in out_jobs)
    total_overhead = sum(j["stage_overhead_ms"] for j in out_jobs)
    total_gaps = sum(j["inter_stage_gap_ms"] or 0 for j in out_jobs)
    return {
        "eventlog": os.path.basename(path),
        "cores": cores,
        "n_jobs": len(out_jobs),
        "n_stages_run": sum(j["n_stages_run"] for j in out_jobs),
        "total_job_wall_ms": round(total_wall, 1),
        "total_parallel_ideal_ms": round(total_ideal, 1),
        "total_stage_overhead_ms": round(total_overhead, 1),
        "total_inter_stage_gap_ms": round(total_gaps, 1),
        "fixed_cost_fraction": (
            round((total_overhead + total_gaps) / total_wall, 3)
            if total_wall
            else None
        ),
        "jobs": out_jobs,
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    path, cores = args[0], int(args[1])
    out = None
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
    if os.path.isdir(path):
        candidates = [
            os.path.join(path, f)
            for f in os.listdir(path)
            if not f.startswith(".")
        ]
        path = max(candidates, key=os.path.getmtime)
        if os.path.isdir(path):  # rolling v2 layout: events_* inside
            events = [
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.startswith("events_")
            ]
            if not events:
                raise SystemExit(
                    f"{path}: no events_* files (compressed v2 log? "
                    "set spark.eventLog.compress=false)"
                )
            path = max(events, key=os.path.getmtime)
    result = profile(path, cores)
    payload = json.dumps(result, indent=1)
    if out:
        with open(out, "w") as fh:
            fh.write(payload)
        print(f"wrote {out}: {result['n_jobs']} jobs, "
              f"{result['n_stages_run']} stages, fixed-cost fraction "
              f"{result['fixed_cost_fraction']}")
    else:
        print(payload)




def compare(path8: str, path32: str) -> dict:
    """Job-matched 8-vs-32 comparison: for every job id present in both
    profiles, the total task time (parallel work) at each level and its
    inflation factor.  Work inflation >1 means the SAME logical work
    costs more task-seconds when run 32-wide on one box — memory
    bandwidth / GC / SMT co-location, the component a real 4N-machine
    cluster does not pay (4N machines bring 4N memory buses).  Stage
    overhead columns show the ramp/tail fixed cost separately."""
    p8 = json.load(open(path8))
    p32 = json.load(open(path32))
    by8 = {j["job_id"]: j for j in p8["jobs"]}
    rows = []
    for j32 in p32["jobs"]:
        j8 = by8.get(j32["job_id"])
        if j8 is None:
            continue
        work8 = j8["stage_ideal_ms"] * p8["cores"]
        work32 = j32["stage_ideal_ms"] * p32["cores"]
        if work8 < 1000:  # skip trivial jobs
            continue
        rows.append(
            {
                "job_id": j32["job_id"],
                "wall_8_ms": j8["wall_ms"],
                "wall_32_ms": j32["wall_ms"],
                "task_work_8_s": round(work8 / 1000, 1),
                "task_work_32_s": round(work32 / 1000, 1),
                "work_inflation_32_vs_8": (
                    round(work32 / work8, 2) if work8 else None
                ),
                "stage_overhead_8_ms": j8["stage_overhead_ms"],
                "stage_overhead_32_ms": j32["stage_overhead_ms"],
                "speedup": (
                    round(j8["wall_ms"] / j32["wall_ms"], 2)
                    if j8["wall_ms"] and j32["wall_ms"]
                    else None
                ),
            }
        )
    return {"jobs": rows}


def main_compare() -> None:
    i = sys.argv.index("--compare")
    path8, path32 = sys.argv[i + 1], sys.argv[i + 2]
    out = None
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
    result = compare(path8, path32)
    payload = json.dumps(result, indent=1)
    if out:
        with open(out, "w") as fh:
            fh.write(payload)
        print(f"wrote {out}: {len(result['jobs'])} matched jobs")
    else:
        print(payload)


if __name__ == "__main__":
    if "--compare" in sys.argv:
        main_compare()
    else:
        main()
