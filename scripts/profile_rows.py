"""Per-row job/stage attribution for ARBITRARY registry rows (the sweep
analogue of profile_headline.py — VERDICT r11 Next-round #1 demands an
attribution artifact for the maintained/streaming gate rows before they
are touched).

Runs each named registry row ONCE with the noop sink under a per-row job
group, then pulls the UI REST API to attribute jobs, stages, task time,
shuffle bytes and input bytes per row. Also times the row's DuckDB
oracle separately (the sweep's per-row `sec` includes it), so the
artifact splits "Spark compute" from "oracle+compare" honestly.

Single pass (unlike the headline profiler): the gate rows build
maintained indexes with per-(session, sf_dir) memos, so a second pass
would measure the memoized path, not the build. Run order matters for
the shared memos — pass rows in the same order the sweep runs them.

Usage: python scripts/profile_rows.py <sf_dir> <out_json> <row> [row ...]
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time
import urllib.request

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from nornicdb_spark import get_spark  # noqa: E402
from nornicdb_spark.queries import ORACLES, QUERIES  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def rest(app_url: str, path: str):
    with urllib.request.urlopen(app_url + path, timeout=30) as r:
        return json.load(r)


def main():
    sf_dir = sys.argv[1]
    out_path = sys.argv[2]
    names = sys.argv[3:]

    spark = get_spark(
        app_name="row-profile", extra_conf={"spark.ui.enabled": "true"}
    )
    sc = spark.sparkContext
    base = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"

    import duckdb

    def fresh_con():
        c = duckdb.connect()
        c.execute("SET memory_limit='32GB'")
        for t in TABLES:
            c.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        return c

    walls: dict[str, dict] = {}
    for n in names:
        sc.setJobGroup(f"row:{n}", n)
        t0 = time.perf_counter()
        QUERIES[n](spark, sf_dir).write.mode("overwrite").format("noop").save()
        dt = round(time.perf_counter() - t0, 3)
        sc.setJobGroup("", "")
        o = ORACLES.get(n)
        t1 = time.perf_counter()
        if o is not None:
            con = fresh_con()
            con.execute(o).fetchall()
            con.close()
        od = round(time.perf_counter() - t1, 3)
        walls[n] = {"spark_wall_s": dt, "oracle_wall_s": od}
        print(f"{n}: spark {dt}s oracle {od}s", flush=True)

    jobs = rest(base, "/jobs?status=succeeded") + rest(base, "/jobs?status=failed")
    stages = {
        s["stageId"]: s
        for s in rest(base, "/stages?status=COMPLETE")
        + rest(base, "/stages?status=FAILED")
    }
    per_q: dict[str, dict] = {}
    for j in jobs:
        group = j.get("jobGroup") or ""
        if not group.startswith("row:"):
            continue
        qname = group[4:]
        d = per_q.setdefault(
            qname,
            {
                "jobs": 0,
                "stages": 0,
                "tasks": 0,
                "task_time_ms": 0,
                "input_mb": 0.0,
                "shuffle_read_mb": 0.0,
                "shuffle_write_mb": 0.0,
                "spill_disk_mb": 0.0,
            },
        )
        d["jobs"] += 1
        for sid in j.get("stageIds", []):
            s = stages.get(sid)
            if s is None:
                continue
            d["stages"] += 1
            d["tasks"] += s.get("numCompleteTasks", 0)
            d["task_time_ms"] += s.get("executorRunTime", 0)
            d["input_mb"] += s.get("inputBytes", 0) / 1e6
            d["shuffle_read_mb"] += s.get("shuffleReadBytes", 0) / 1e6
            d["shuffle_write_mb"] += s.get("shuffleWriteBytes", 0) / 1e6
            d["spill_disk_mb"] += s.get("diskBytesSpilled", 0) / 1e6
    result = {}
    for n in names:
        d = per_q.get(n, {})
        d = {k: (round(v, 2) if isinstance(v, float) else v) for k, v in d.items()}
        d.update(walls[n])
        result[n] = d
    pathlib.Path(out_path).write_text(json.dumps(result, indent=1))
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
