"""Extra (non-frozen) measurement harnesses for optimization work.

The driver's contract bench is `bench.py` (FROZEN). This file holds the
isolation/profiling studies the optimization rounds cite in
OPTIMIZATION_r*.md:

  python bench_extra.py pipeline    # one sf0.1 headline pipeline run with
                                    # event-log per-stage CPU + stage walls
  python bench_extra.py documents   # same for the 5k-row documents table
  python bench_extra.py drain       # bootstrap + 8-micro-batch mft1 drain:
                                    # job/gap timeline + per-batch walls
  python bench_extra.py queries     # q01..q12 noop-sink isolation (guide §1.4)

Each prints a JSON summary; raw event logs land under /tmp/dedup-evlog.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import pandas as pd  # noqa: F401  (pandas_udf type hints resolve via module globals)

EVDIR = "/tmp/dedup-evlog"


def build(app: str, threads: int | None = None, extra: dict | None = None):
    from dedup.config import DedupConfig
    from dedup.session import build_session

    if threads is None:
        threads = int(os.environ.get("DEDUP_EXTRA_THREADS", "10"))
    os.makedirs(EVDIR, exist_ok=True)
    cfg = DedupConfig(shuffle_partitions=max(4 * threads, 8))
    conf = {
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": EVDIR,
        "spark.eventLog.compress": "false",
        "spark.driver.extraJavaOptions": f"-XX:ActiveProcessorCount={threads}",
        **(extra or {}),
    }
    spark = build_session(
        app_name=app, master=f"local[{threads}]", config=cfg, extra_conf=conf
    )
    return spark, cfg


def parse_evlog(app_id: str) -> dict:
    """Aggregate the event log: per-stage run/cpu/gc/shuffle + job timeline."""
    path = os.path.join(EVDIR, app_id)
    if not os.path.exists(path):  # Spark 4 rolling layout
        d = os.path.join(EVDIR, f"eventlog_v2_{app_id}")
        evfiles = sorted(
            os.path.join(d, f) for f in os.listdir(d) if f.startswith("events")
        )
    else:
        evfiles = [path]
    stages: dict[int, dict] = {}
    stage_desc: dict[int, str] = {}
    jobs: list[tuple[float, float, str]] = []
    job_start: dict[int, tuple[float, str]] = {}

    def _lines():
        for f in evfiles:
            with open(f) as fh:
                yield from fh

    if True:
        for line in _lines():
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                tm = ev.get("Task Metrics") or {}
                s = stages.setdefault(
                    sid,
                    {"tasks": 0, "run_ms": 0, "cpu_ms": 0, "gc_ms": 0,
                     "sh_read_b": 0, "sh_write_b": 0, "in_b": 0, "name": ""},
                )
                s["tasks"] += 1
                s["run_ms"] += tm.get("Executor Run Time", 0)
                s["cpu_ms"] += tm.get("Executor CPU Time", 0) // 1_000_000
                s["gc_ms"] += tm.get("JVM GC Time", 0)
                s["sh_read_b"] += (tm.get("Shuffle Read Metrics") or {}).get(
                    "Remote Bytes Read", 0
                ) + (tm.get("Shuffle Read Metrics") or {}).get("Local Bytes Read", 0)
                s["sh_write_b"] += (tm.get("Shuffle Write Metrics") or {}).get(
                    "Shuffle Bytes Written", 0
                )
                s["in_b"] += (tm.get("Input Metrics") or {}).get("Bytes Read", 0)
            elif e == "SparkListenerStageSubmitted":
                si = ev["Stage Info"]
                stages.setdefault(
                    si["Stage ID"],
                    {"tasks": 0, "run_ms": 0, "cpu_ms": 0, "gc_ms": 0,
                     "sh_read_b": 0, "sh_write_b": 0, "in_b": 0, "name": ""},
                )["name"] = si.get("Stage Name", "")
            elif e == "SparkListenerJobStart":
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                ) or (ev.get("Properties") or {}).get("callSite.short", "")
                for sid in ev.get("Stage IDs", []):
                    stage_desc[sid] = desc
                job_start[ev["Job ID"]] = (ev["Submission Time"] / 1000.0, desc)
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in job_start:
                    t0, desc = job_start.pop(jid)
                    jobs.append((t0, ev["Completion Time"] / 1000.0, desc))
    jobs.sort()
    gap = 0.0
    covered = 0.0
    if jobs:
        cur_end = jobs[0][0]
        for t0, t1, _ in jobs:
            if t0 > cur_end:
                gap += t0 - cur_end
            covered += max(0.0, t1 - max(t0, cur_end)) if t1 > cur_end else 0.0
            cur_end = max(cur_end, t1)
    by_desc: dict[str, dict] = {}
    for sid, s in stages.items():
        d = stage_desc.get(sid, "?") or "?"
        agg = by_desc.setdefault(
            d, {"tasks": 0, "cpu_s": 0.0, "run_s": 0.0, "gc_s": 0.0,
                "sh_r_mb": 0.0, "sh_w_mb": 0.0, "n_stages": 0}
        )
        agg["n_stages"] += 1
        agg["tasks"] += s["tasks"]
        agg["cpu_s"] += s["cpu_ms"] / 1000
        agg["run_s"] += s["run_ms"] / 1000
        agg["gc_s"] += s["gc_ms"] / 1000
        agg["sh_r_mb"] += s["sh_read_b"] / 1e6
        agg["sh_w_mb"] += s["sh_write_b"] / 1e6
    for agg in by_desc.values():
        for k in ("cpu_s", "run_s", "gc_s", "sh_r_mb", "sh_w_mb"):
            agg[k] = round(agg[k], 2)
    return {"stages": stages, "jobs": jobs, "gap_s": round(gap, 2),
            "covered_s": round(covered, 2), "by_desc": by_desc}


def group_stage_cpu(parsed: dict, top: int = 25) -> list[dict]:
    rows = sorted(
        parsed["stages"].values(), key=lambda s: -s["cpu_ms"]
    )[:top]
    return [
        {
            "name": r["name"][:90],
            "tasks": r["tasks"],
            "cpu_s": round(r["cpu_ms"] / 1000, 2),
            "run_s": round(r["run_ms"] / 1000, 2),
            "gc_s": round(r["gc_ms"] / 1000, 2),
            "sh_r_mb": round(r["sh_read_b"] / 1e6, 1),
            "sh_w_mb": round(r["sh_write_b"] / 1e6, 1),
            "in_mb": round(r["in_b"] / 1e6, 1),
        }
        for r in rows
    ]


def cmd_pipeline(mode: str = "persist") -> None:
    os.environ["DEDUP_STAGE_DEBUG"] = "1"
    spark, cfg = build("extra-pipeline")
    from bench import ensure_corpus
    from dedup.io import read_transcripts
    from dedup.pipeline import run_pipeline

    corpus = ensure_corpus(spark, 20_000)
    turns = read_transcripts(spark, corpus)
    turns.count()
    # warm python workers
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        import numpy  # noqa: F401
        return s

    spark.range(0, 64, 1, 64).select(_warm("id")).write.format("noop").mode(
        "overwrite"
    ).save()

    run_dir = tempfile.mkdtemp(prefix="extra_pipe_", dir="/dev/shm")
    t0 = time.monotonic()
    out = run_pipeline(spark, turns, cfg, run_dir, "extra", mode=mode)
    n = out["clusters"].select("cluster_id").distinct().count()
    wall = time.monotonic() - t0
    app_id = spark.sparkContext.applicationId
    spark.stop()
    shutil.rmtree(run_dir, ignore_errors=True)
    parsed = parse_evlog(app_id)
    total_cpu = sum(s["cpu_ms"] for s in parsed["stages"].values()) / 1000
    print(json.dumps({
        "wall_s": round(wall, 2), "n_clusters": n, "mode": mode,
        "evlog_total_stage_cpu_s": round(total_cpu, 1),
        "gap_s": parsed["gap_s"], "covered_s": parsed["covered_s"],
        "n_jobs": len(parsed["jobs"]),
        "by_desc": parsed["by_desc"],
    }, indent=1))


def cmd_documents() -> None:
    os.environ["DEDUP_STAGE_DEBUG"] = "1"
    spark, cfg = build("extra-docs")
    from dedup.io import documents_as_transcripts
    from dedup.pipeline import run_pipeline

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    walls = []
    for rep in range(3):
        run_dir = tempfile.mkdtemp(prefix="extra_docs_")
        t0 = time.monotonic()
        out = run_pipeline(
            spark, documents_as_transcripts(spark, sf_dir), cfg, run_dir,
            f"extra{rep}", mode="persist",
        )
        out["clusters"].count()
        walls.append(round(time.monotonic() - t0, 3))
        shutil.rmtree(run_dir, ignore_errors=True)
        out["state"].release()
    app_id = spark.sparkContext.applicationId
    spark.stop()
    parsed = parse_evlog(app_id)
    print(json.dumps({
        "walls": walls, "gap_s": parsed["gap_s"],
        "covered_s": parsed["covered_s"], "n_jobs": len(parsed["jobs"]),
        "top_stages": group_stage_cpu(parsed, top=12),
    }, indent=1))


def cmd_drain(profile: bool = False) -> None:
    spark, cfg = build("extra-drain")
    from bench import ensure_corpus
    from dedup.io import read_transcripts
    from dedup.streaming import stream_dedup
    from pyspark.sql import functions as F

    corpus = ensure_corpus(spark, 20_000)
    turns = read_transcripts(spark, corpus)
    bucket = F.pmod(F.crc32(F.col("conv_id")), F.lit(20))
    boot = turns.filter(bucket >= 2)
    delta = turns.filter(bucket == 0)

    sdir = tempfile.mkdtemp(prefix="extra_drain_", dir="/dev/shm")
    in_dir = tempfile.mkdtemp(prefix="extra_drainin_", dir="/dev/shm")
    boot.repartition(8, "conv_id").write.mode("append").parquet(in_dir)
    t0 = time.monotonic()
    stream_dedup(spark, in_dir, sdir, cfg)
    boot_wall = time.monotonic() - t0

    delta.repartition(8, "conv_id").write.mode("append").parquet(in_dir)
    jobs_before = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
    t0 = time.monotonic()
    if profile:
        import cProfile
        import pstats

        pr = cProfile.Profile()
        pr.enable()
        stream_dedup(spark, in_dir, sdir, cfg, max_files_per_trigger=1)
        pr.disable()
        st = pstats.Stats(pr)
        st.sort_stats("cumulative")
        st.dump_stats("/tmp/drain_profile.pstats")
    else:
        stream_dedup(spark, in_dir, sdir, cfg, max_files_per_trigger=1)
    drain_wall = time.monotonic() - t0
    jobs_after = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
    app_id = spark.sparkContext.applicationId
    spark.stop()
    shutil.rmtree(sdir, ignore_errors=True)
    shutil.rmtree(in_dir, ignore_errors=True)
    parsed = parse_evlog(app_id)
    # job timeline restricted to the drain window
    drain_jobs = [j for j in parsed["jobs"] if j[0] >= time.time() - drain_wall - 5]
    print(json.dumps({
        "boot_wall_s": round(boot_wall, 2),
        "mft1_drain_wall_s": round(drain_wall, 2),
        "drain_jobs": jobs_after - jobs_before,
        "total_jobs": len(parsed["jobs"]),
        "gap_s": parsed["gap_s"], "covered_s": parsed["covered_s"],
        "profile": "/tmp/drain_profile.pstats" if profile else None,
    }, indent=1))
    # dump the tail of the job timeline with descriptions for gap hunting
    for t0j, t1j, desc in parsed["jobs"][-40:]:
        print(f"  {t0j:.2f} +{t1j - t0j:6.3f}s  {desc[:80]}")


def cmd_queries() -> None:
    spark, _cfg = build("extra-queries")
    from dedup.queries import QUERIES

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = {}
    for name in (
        "q01_pricing_summary", "q03_region_revenue",
        "q04_latest_order_per_customer", "q09_events_first_occurrence",
        "q10_events_user_stream", "q12_docs_token_jaccard_pairs",
    ):
        reps = []
        for _ in range(3):
            t0 = time.monotonic()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            reps.append(time.monotonic() - t0)
        reps.sort()
        out[name] = round(reps[1], 3)
    spark.stop()
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    cmd = sys.argv[1] if len(sys.argv) > 1 else "pipeline"
    if cmd == "pipeline":
        cmd_pipeline(sys.argv[2] if len(sys.argv) > 2 else "persist")
    elif cmd == "documents":
        cmd_documents()
    elif cmd == "drain":
        cmd_drain(profile="--profile" in sys.argv)
    elif cmd == "queries":
        cmd_queries()
    else:
        raise SystemExit(f"unknown command {cmd}")
