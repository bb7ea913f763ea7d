"""Per-key profiler for the optimization rounds.

Usage:
    python scripts/profile_key.py [--sf DIR] [--plans OUT_DIR] [--runs N] key [key ...]

For each key: warms the session once, then runs the key via the noop
sink (the bench's timed action), prints wall seconds, and — with
--plans — writes `.explain("formatted")` to <OUT_DIR>/<key>_<tag>.txt.

With --stages, enables the Spark event log and prints a per-stage
summary (name, seconds, tasks, shuffle read/write MB, input MB) so the
expensive stage inside a key is visible without the UI.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sql_flow_spark.operators import QUERIES  # noqa: E402
from sql_flow_spark.session import get_spark  # noqa: E402


def _open_event_log(event_dir: str, app_id: str):
    """Spark 4 default: a v2 directory with zstd-compressed event files."""
    import io

    cands = [
        f for f in os.listdir(event_dir)
        if app_id in f
    ]
    if not cands:
        return None
    path = os.path.join(event_dir, cands[0])
    if os.path.isdir(path):
        evs = [f for f in os.listdir(path) if f.startswith("events_")]
        if not evs:
            return None
        path = os.path.join(path, sorted(evs)[0])
    if path.endswith(".zstd"):
        import zstandard

        fh = open(path, "rb")
        stream = zstandard.ZstdDecompressor().stream_reader(fh)
        return io.TextIOWrapper(stream, encoding="utf-8")
    return open(path)


def stage_summary(event_dir: str, app_id: str) -> list[dict]:
    f = _open_event_log(event_dir, app_id)
    if f is None:
        return []
    stages: dict[int, dict] = {}
    with f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ev.get("Event") == "SparkListenerJobStart":
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                )
                for sid in ev.get("Stage IDs", []):
                    stages.setdefault(sid, {"stage": sid})["desc"] = desc
            elif ev.get("Event") == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                stages.setdefault(sid, {"stage": sid}).update({
                    "name": si.get("Stage Name", "")[:80],
                    "sec": round((comp - sub) / 1000.0, 2)
                    if sub and comp
                    else None,
                    "tasks": si.get("Number of Tasks"),
                })
            elif ev.get("Event") == "SparkListenerTaskEnd":
                sid = ev.get("Stage ID")
                m = ev.get("Task Metrics") or {}
                st = stages.setdefault(sid, {"stage": sid})
                st["sh_read_mb"] = round(
                    st.get("sh_read_mb", 0.0)
                    + (
                        (m.get("Shuffle Read Metrics") or {}).get(
                            "Remote Bytes Read", 0
                        )
                        + (m.get("Shuffle Read Metrics") or {}).get(
                            "Local Bytes Read", 0
                        )
                    )
                    / 1e6,
                    2,
                )
                st["sh_write_mb"] = round(
                    st.get("sh_write_mb", 0.0)
                    + (m.get("Shuffle Write Metrics") or {}).get(
                        "Shuffle Bytes Written", 0
                    )
                    / 1e6,
                    2,
                )
                st["input_mb"] = round(
                    st.get("input_mb", 0.0)
                    + (m.get("Input Metrics") or {}).get("Bytes Read", 0) / 1e6,
                    2,
                )
                st["cpu_sec"] = round(
                    st.get("cpu_sec", 0.0)
                    + m.get("Executor CPU Time", 0) / 1e9,
                    2,
                )
                st["run_sec"] = round(
                    st.get("run_sec", 0.0)
                    + m.get("Executor Run Time", 0) / 1e3,
                    2,
                )
    return [stages[k] for k in sorted(stages)]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plans", default=None,
                    help="directory to write explain('formatted') files")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--stages", action="store_true")
    args = ap.parse_args()

    extra = {"spark.sql.files.maxPartitionBytes": "2097152"}
    event_dir = None
    if args.stages:
        event_dir = "/tmp/spark-events-profile"
        os.makedirs(event_dir, exist_ok=True)
        extra.update({
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{event_dir}",
            "spark.eventLog.compress": "false",
        })
    spark = get_spark("profile", extra_confs=extra)
    from bench import reclaim_between_keys, warm_session  # noqa: E402

    warm_session(spark, args.sf)

    for key in args.keys:
        fn = QUERIES[key]
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plans, f"{key}_{args.tag}.txt"), "w") as f:
                f.write(plan)
        times = []
        for _ in range(args.runs):
            reclaim_between_keys(spark)
            spark.sparkContext.setJobDescription(key)
            t0 = time.time()
            df = fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        print(f"{key}: {times} min={min(times)}")

    app_id = spark.sparkContext.applicationId
    spark.stop()
    if args.stages and event_dir:
        time.sleep(1)
        for st in stage_summary(event_dir, app_id):
            if st.get("sec") is None and not st.get("run_sec"):
                continue
            if st.get("desc") not in args.keys:
                continue
            print(
                f"  [{st.get('desc', '')}] stage {st['stage']:>4} "
                f"{st.get('sec', '?'):>6}s "
                f"tasks={st.get('tasks', '?'):>4} "
                f"cpu={st.get('cpu_sec', 0):>7} run={st.get('run_sec', 0):>7} "
                f"shR={st.get('sh_read_mb', 0):>7} shW={st.get('sh_write_mb', 0):>7} "
                f"in={st.get('input_mb', 0):>7}  {st.get('name', '')[:60]}"
            )


if __name__ == "__main__":
    main()
