"""Engine-only wall time + executor-memory metrics per query.

Two ledger gaps this closes (VERDICT r8 tasks 3 & 4):

1. The sf1/sf10 sweep rows time Spark AND the DuckDB oracle together, so
   the slowest rows can't prove the engine side is healthy — this runs
   ONLY the engine (same action shape as the sweep: ``df.count()``) and
   records wall seconds.
2. The sf10 probe attributed dijkstra/link-prediction's 15-19× wall
   ratios to single-JVM shuffle spill *without measurements*. This
   captures per-query ``memoryBytesSpilled`` / ``diskBytesSpilled`` /
   max ``peakExecutionMemory`` from the Spark status REST API (summed
   over the stages each query ran), so the attribution is data, not
   narrative.

Usage:
  SPARK_DRIVER_MEM=64g python scripts/probe_engine_metrics.py \
      <sf_dir> <out_json> <query> [query...]

Appends/updates per-query entries in <out_json> keyed by query name
(resumable, same convention as sweep_sf1.py).
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


def _rest(base: str, path: str):
    with urllib.request.urlopen(f"{base}/api/v1/{path}", timeout=30) as r:
        return json.loads(r.read())


def stage_metrics(base: str, app_id: str, seen: set[int]) -> tuple[dict, set[int]]:
    """Aggregate spill/peak-memory over completed stages NOT in ``seen``."""
    stages = _rest(base, f"applications/{app_id}/stages?status=complete")
    new = [s for s in stages if s["stageId"] not in seen]
    agg = {
        "memory_spilled_bytes": sum(s.get("memoryBytesSpilled", 0) for s in new),
        "disk_spilled_bytes": sum(s.get("diskBytesSpilled", 0) for s in new),
        "peak_execution_memory_bytes": max(
            (s.get("peakExecutionMemory", 0) for s in new), default=0
        ),
        "shuffle_write_bytes": sum(s.get("shuffleWriteBytes", 0) for s in new),
        "n_stages": len(new),
    }
    return agg, seen | {s["stageId"] for s in new}


def main() -> None:
    sf_dir, out = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]

    from pyspark.sql import SparkSession

    from nornicdb_spark.queries import QUERIES

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions",
                os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.driver.maxResultSize", "8g")
        .getOrCreate()
    )
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    out_path = pathlib.Path(out)
    results: dict[str, dict] = {}
    if out_path.exists():
        try:
            results = json.loads(out_path.read_text())
        except ValueError:
            results = {}

    seen: set[int] = set()
    _, seen = stage_metrics(base, app_id, seen)  # baseline: ignore startup
    for name in names:
        t0 = time.time()
        err, n = None, None
        try:
            n = QUERIES[name](spark, sf_dir).count()
        except Exception as e:  # noqa: BLE001 — record, keep probing
            err = f"{type(e).__name__}: {e}"[:300]
        dt = round(time.time() - t0, 2)
        time.sleep(1.0)  # let the status store flush completed stages
        agg, seen = stage_metrics(base, app_id, seen)
        row = {"sec": dt, "rows": n, "err": err, "sf_dir": sf_dir, **agg}
        results[f"{name}@{pathlib.Path(sf_dir).name}"] = row
        spill_gb = (row["memory_spilled_bytes"]) / 2**30
        print(
            f"{name}@{pathlib.Path(sf_dir).name}: {dt}s rows={n} "
            f"mem-spill={spill_gb:.2f}GiB disk-spill="
            f"{row['disk_spilled_bytes'] / 2**30:.2f}GiB peak-exec-mem="
            f"{row['peak_execution_memory_bytes'] / 2**30:.2f}GiB "
            f"err={err}",
            flush=True,
        )
        out_path.write_text(json.dumps(results, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
